"""ResNet50 + ASPP pose model (reference lib/network/atrouspose.py).

ResNet50 through layer3 (stride 16) with lateral 1x1+upsample paths merged
at stride 8, a cumulative-add ASPP block (dilations 1/4/8/16, reference
:18-49), and two 5-conv heads for PAF/heatmaps (reference :73-124).
Single-stage (no refinement cascade).  The ResNet50 trunk is implemented
natively (the reference pulls torchvision's pretrained model, :79).

Also provides the dilated CPM stage block of the legacy atrous models
(reference lib/network/atrous_model.py:78-106 — dilations 1,1,2,4,8),
used by the `atrous` stage variant.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..skeleton import NUM_HEATMAPS, NUM_PAF_CHANNELS
from .common import ModelOutput, conv_init


class ResNetBottleneck(nn.Module):
    planes: int
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn3")(y)
        if self.project or residual.shape[-1] != self.planes * 4:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="proj_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Trunk(nn.Module):
    """conv1..layer3 (standard (3,4,6) bottleneck stages)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = {}
        for si, (planes, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2))):
            for b in range(blocks):
                x = ResNetBottleneck(planes,
                                     stride=stride if b == 0 else 1,
                                     project=(b == 0), dtype=self.dtype,
                                     name=f"layer{si + 1}_{b}")(x, train)
            feats[f"layer{si + 1}"] = x
        return feats["layer2"], feats["layer3"]   # stride 8 (512ch), 16


class ASPP(nn.Module):
    """Cumulative-add atrous pyramid (reference atrouspose.py:18-49)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, d in enumerate((1, 4, 8, 16)):
            y = nn.Conv(128, (3, 3), kernel_dilation=(d, d),
                        padding="SAME", dtype=self.dtype,
                        name=f"branch{i}", **conv_init())(x)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"branch{i}_bn")(y)
            outs.append(nn.relu(y))
        adds = [outs[0]]
        for o in outs[1:]:
            adds.append(adds[-1] + o)
        y = jnp.concatenate(adds, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="out_bn")(y)
        return nn.relu(y)


class _Head(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = nn.Conv(512, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}", **conv_init())(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(512, (1, 1), dtype=self.dtype, name="conv3",
                    **conv_init())(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="out", **conv_init())(x)


def _bilinear_x2(x):
    """2x bilinear upsample, align_corners=True (reference :62-71)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


class AtrousPose(nn.Module):
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> ModelOutput:
        x = images.astype(self.dtype)
        c8, c16 = ResNet50Trunk(dtype=self.dtype, name="trunk")(x, train)
        lat16 = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                        name="lateral16")(c16)
        lat16 = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name="lateral16_bn")(lat16)
        lat16 = _bilinear_x2(nn.relu(lat16))
        lat8 = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                       name="lateral8")(c8)
        lat8 = nn.BatchNorm(use_running_average=not train,
                            dtype=self.dtype, name="lateral8_bn")(lat8)
        lat8 = nn.relu(lat8)
        feat = nn.relu(jnp.concatenate([lat8, lat16], axis=-1))
        feat = ASPP(dtype=self.dtype, name="aspp")(feat, train)
        paf = _Head(self.paf_channels, dtype=self.dtype, name="paf_head")(
            feat, train)
        heat = _Head(self.heat_channels, dtype=self.dtype,
                     name="heat_head")(feat, train)
        return ModelOutput(pafs=paf.astype(jnp.float32)[None],
                           heatmaps=heat.astype(jnp.float32)[None])


class DilatedStageBlock(nn.Module):
    """Legacy atrous CPM stage: five 3x3 convs with dilations 1,1,2,4,8
    (reference lib/network/atrous_model.py:78-106)."""
    out_channels: int
    features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1, 1, 2, 4, 8)):
            x = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                        padding="SAME", dtype=self.dtype,
                        name=f"conv{i + 1}", **conv_init())(x)
            x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv6",
                    **conv_init())(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="out", **conv_init())(x)
