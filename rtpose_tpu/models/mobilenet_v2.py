"""MobileNetV2 pose model.

The reference ships a classification-only MobileNetV2
(lib/network/rtpose_mobilenetV2.py) plus an unassembled 'mobilenet' trunk
dict in rtpose_vgg.get_model (:85-92) that was never wired into a pose net.
Here both pieces are completed: the MobileNetV2 trunk (inverted residuals,
ReLU6) truncated at stride 8 feeds the shared CPM refinement cascade, so
the 'mobilenet' model family actually works.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import CPMStages, ModelOutput, conv_init

# (expansion t, channels c, repeats n, stride s) — reference
# rtpose_mobilenetV2.py:68-77, truncated after the stride-8 stages
_STAGE8_SETTING: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 96, 3, 1),
)


class InvertedResidual(nn.Module):
    """pw-expand -> dw -> pw-linear with residual
    (reference rtpose_mobilenetV2.py:21-59)."""
    out_channels: int
    stride: int = 1
    expand: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand))
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="pw")(y)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name="pw_bn")(y)
            y = jnp.minimum(nn.relu(y), 6.0)
        y = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="dw_bn")(y)
        y = jnp.minimum(nn.relu(y), 6.0)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pw_linear")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="pw_linear_bn")(y)
        if self.stride == 1 and inp == self.out_channels:
            y = y + x
        return y


class MobileNetV2Backbone(nn.Module):
    """Stride-8 trunk + CPM neck to 128ch (the completed analogue of the
    'mobilenet' block0 in reference rtpose_vgg.py:85-92)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        for si, (t, c, n, s) in enumerate(_STAGE8_SETTING):
            for i in range(n):
                x = InvertedResidual(c, stride=s if i == 0 else 1,
                                     expand=t, dtype=self.dtype,
                                     name=f"ir{si}_{i}")(x, train)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_cpm1", **conv_init())(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_cpm2", **conv_init())(x)
        return nn.relu(x)


class MobileNetRTPose(nn.Module):
    num_stages: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> ModelOutput:
        feat = MobileNetV2Backbone(dtype=self.dtype, name="backbone")(
            images.astype(self.dtype), train)
        return CPMStages(num_stages=self.num_stages, dtype=self.dtype,
                         name="stages")(feat)
