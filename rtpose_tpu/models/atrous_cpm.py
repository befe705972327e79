"""Legacy atrous CPM models (reference lib/network/atrous_model.py and
atrous_model_share_stages.py).

Inception-v3-style stem (stride 8, 288ch) + dilated CPM stage blocks
(dilations 1,1,2,4,8 — reference atrous_model.py:78-106).  Two variants:

- `AtrousCPM`: separate PAF/heatmap stage blocks per refinement stage
  (reference Atrous_model :143-173)
- `AtrousCPMShared`: one stage block emits both PAF and heatmap slices
  (reference atrous_model_share_stages.py Ying_model :166; generalized to
  the full 38/19 channel budget instead of its 14/9 legacy heads)

Both reference files are dead code upstream (they import a `tnn` package
absent from the repo, atrous_model.py:10); these are working equivalents.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..skeleton import NUM_HEATMAPS, NUM_PAF_CHANNELS
from .atrous import DilatedStageBlock
from .common import ModelOutput, conv_init


class BasicConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=not self.use_bn, dtype=self.dtype,
                    **conv_init())(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    """Inception-v3 A block (1x1 / 5x5 / double-3x3 / pool branches)."""
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv(64, 1, dtype=self.dtype, name="b1")(x, train)
        b5 = BasicConv(48, 1, dtype=self.dtype, name="b5_1")(x, train)
        b5 = BasicConv(64, 5, dtype=self.dtype, name="b5_2")(b5, train)
        b3 = BasicConv(64, 1, dtype=self.dtype, name="b3_1")(x, train)
        b3 = BasicConv(96, 3, dtype=self.dtype, name="b3_2")(b3, train)
        b3 = BasicConv(96, 3, dtype=self.dtype, name="b3_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv(self.pool_features, 1, dtype=self.dtype,
                       name="bp")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionStem(nn.Module):
    """Inception stem to stride 8 / 288ch
    (reference atrous_model.py:108-140)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv(32, 3, stride=2, dtype=self.dtype,
                      name="conv1")(x, train)
        x = BasicConv(32, 3, dtype=self.dtype, name="conv2")(x, train)
        x = BasicConv(64, 3, dtype=self.dtype, name="conv3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = BasicConv(80, 1, dtype=self.dtype, name="conv4r")(x, train)
        x = BasicConv(192, 3, dtype=self.dtype, name="conv4")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = InceptionA(32, dtype=self.dtype, name="ia1")(x, train)
        x = InceptionA(64, dtype=self.dtype, name="ia2")(x, train)
        return x   # stride 8, 288 channels


class AtrousCPM(nn.Module):
    """Inception stem + per-branch dilated refinement stages."""
    num_stages: int = 5
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> ModelOutput:
        x = InceptionStem(dtype=self.dtype, name="stem")(
            images.astype(self.dtype), train)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    name="neck1", **conv_init())(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="neck2", **conv_init())(x)
        feat = nn.relu(x)

        pafs, heats = [], []
        x_in = feat
        for s in range(self.num_stages):
            paf = DilatedStageBlock(self.paf_channels, dtype=self.dtype,
                                    name=f"paf_stage{s + 2}")(x_in)
            heat = DilatedStageBlock(self.heat_channels, dtype=self.dtype,
                                     name=f"heat_stage{s + 2}")(x_in)
            pafs.append(paf)
            heats.append(heat)
            if s != self.num_stages - 1:
                x_in = jnp.concatenate(
                    [paf.astype(self.dtype), heat.astype(self.dtype),
                     feat], axis=-1)
        return ModelOutput(
            pafs=jnp.stack([p.astype(jnp.float32) for p in pafs]),
            heatmaps=jnp.stack([h.astype(jnp.float32) for h in heats]))


class AtrousCPMShared(nn.Module):
    """Shared-stage variant: one dilated block per stage emits the
    concatenated [paf | heat] map, split afterwards
    (reference atrous_model_share_stages.py:83-116,166-210)."""
    num_stages: int = 5
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> ModelOutput:
        x = InceptionStem(dtype=self.dtype, name="stem")(
            images.astype(self.dtype), train)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    name="neck1", **conv_init())(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="neck2", **conv_init())(x)
        feat = nn.relu(x)

        out_ch = self.paf_channels + self.heat_channels
        pafs, heats = [], []
        x_in = feat
        for s in range(self.num_stages):
            both = DilatedStageBlock(out_ch, dtype=self.dtype,
                                     name=f"stage{s + 2}")(x_in)
            paf = both[..., :self.paf_channels]
            heat = both[..., self.paf_channels:]
            pafs.append(paf)
            heats.append(heat)
            if s != self.num_stages - 1:
                x_in = jnp.concatenate(
                    [both.astype(self.dtype), feat], axis=-1)
        return ModelOutput(
            pafs=jnp.stack([p.astype(jnp.float32) for p in pafs]),
            heatmaps=jnp.stack([h.astype(jnp.float32) for h in heats]))
