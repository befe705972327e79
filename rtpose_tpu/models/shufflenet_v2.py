"""ShuffleNetV2 lightweight pose model
(reference lib/network/rtpose_shufflenetV2.py).

Single-stage: ShuffleNetV2 trunk (channel-split units + shuffle) at output
stride 16 with dilated later stages, 1x1 conv5 -> 1x1 paf/heatmap heads
(reference :80-148; no refinement stages).  The reference file is broken —
it imports a `network.slim` module that does not exist in the repo
(reference :18-19); the conv-bn-relu / depthwise / channel-shuffle pieces
are implemented natively here.

TPU notes: NHWC; channel shuffle is a reshape/transpose pair XLA folds into
the surrounding convs; depthwise convs use feature_group_count.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..skeleton import NUM_HEATMAPS, NUM_PAF_CHANNELS
from .common import ModelOutput

WIDTH_CONFIGS = {
    0.25: (24, 48, 96, 512),
    0.33: (32, 64, 128, 512),
    0.5: (48, 96, 192, 1024),
    1.0: (116, 232, 464, 1024),
    1.5: (176, 352, 704, 1024),
    2.0: (244, 488, 976, 2048),
}


def _kaiming():
    return dict(kernel_init=nn.initializers.kaiming_uniform(),
                bias_init=nn.initializers.zeros_init())


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    depthwise: bool = False
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", feature_group_count=groups,
                    use_bias=False, dtype=self.dtype, **_kaiming())(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


def channel_shuffle(x, groups: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
    """Channel-split unit (stride 1) or downsampling unit (stride 2)
    (reference :22-63)."""
    out_channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2
        if not self.downsample and self.stride == 1:
            x1 = x[..., :x.shape[-1] // 2]
            x2 = x[..., x.shape[-1] // 2:]
            y = ConvBNReLU(half, 1, dtype=self.dtype, name="pw1")(x2, train)
            y = ConvBNReLU(half, 3, stride=1, dilation=self.dilation,
                           depthwise=True, relu=False, dtype=self.dtype,
                           name="dw")(y, train)
            y = ConvBNReLU(half, 1, dtype=self.dtype, name="pw2")(y, train)
            out = jnp.concatenate([x1, y], axis=-1)
        else:
            y = ConvBNReLU(half, 1, dtype=self.dtype, name="pw1")(x, train)
            y = ConvBNReLU(half, 3, stride=self.stride,
                           dilation=self.dilation, depthwise=True,
                           relu=False, dtype=self.dtype, name="dw")(y, train)
            y = ConvBNReLU(half, 1, dtype=self.dtype, name="pw2")(y, train)
            z = ConvBNReLU(x.shape[-1], 3, stride=self.stride,
                           dilation=self.dilation, depthwise=True,
                           relu=False, dtype=self.dtype,
                           name="dw_proj")(x, train)
            z = ConvBNReLU(half, 1, dtype=self.dtype, name="pw_proj")(
                z, train)
            out = jnp.concatenate([z, y], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2RTPose(nn.Module):
    """Trunk stages (4, 8, 4 units) + conv5 + 1x1 heads
    (reference :96-106).  Output stride 16 (stage strides 2,2,2 with the
    later stages kept at stride 1, matching the reference's x16 comment)."""
    width_multiplier: float = 1.0
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32
    # output stride is 8: stem 2x + pool 2x + stage2 2x; later stages keep
    # stride 1 (the reference's "x16"/"x32" comments don't match its code,
    # reference :100-102 — stride-8 matches its train_ShuffleNetV2 config)

    @nn.compact
    def __call__(self, images, train: bool = False) -> ModelOutput:
        c1, c2, c3, c5 = WIDTH_CONFIGS[self.width_multiplier]
        x = images.astype(self.dtype)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="data_bn")(x)
        x = ConvBNReLU(24, 3, stride=2, dtype=self.dtype,
                       name="stage1_conv")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for si, (ch, stride, dil, blocks) in enumerate(
                ((c1, 2, 1, 4), (c2, 1, 1, 8), (c3, 1, 1, 4))):
            x = ShuffleUnit(ch, stride=stride, dilation=dil,
                            downsample=True, dtype=self.dtype,
                            name=f"stage{si + 2}_unit1")(x, train)
            for b in range(1, blocks):
                x = ShuffleUnit(ch, stride=1, dilation=dil,
                                dtype=self.dtype,
                                name=f"stage{si + 2}_unit{b + 1}")(x, train)
        x = ConvBNReLU(c5, 1, dtype=self.dtype, name="conv5")(x, train)
        paf = nn.Conv(self.paf_channels, (1, 1), dtype=self.dtype,
                      name="paf", **_kaiming())(x)
        heat = nn.Conv(self.heat_channels, (1, 1), dtype=self.dtype,
                       name="heatmap", **_kaiming())(x)
        return ModelOutput(pafs=paf.astype(jnp.float32)[None],
                           heatmaps=heat.astype(jnp.float32)[None])
