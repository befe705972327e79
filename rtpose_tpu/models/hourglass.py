"""Stacked hourglass PAF model (reference lib/network/rtpose_hourglass.py).

Newell-style hourglass stacks at output stride 4, each stack emitting both
a 38-channel PAF head and a 19-channel heatmap head with intermediate
re-injection (reference :92-189).  Pre-activation bottlenecks
(BN-ReLU-Conv x3 with 2x expansion, reference :9-46).

TPU notes: NHWC; BatchNorm carried as flax batch_stats (use
`model.apply(variables, x, train=True, mutable=['batch_stats'])` in
training); the recursive hourglass is unrolled at trace time (depth 4), so
XLA sees a static graph.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..skeleton import NUM_HEATMAPS, NUM_PAF_CHANNELS
from .common import ModelOutput, conv_init


class Bottleneck(nn.Module):
    """Pre-activation bottleneck, expansion 2 (reference :9-46)."""
    planes: int
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv1",
                    **conv_init())(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=self.dtype, name="conv2",
                    **conv_init())(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn3")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 2, (1, 1), dtype=self.dtype, name="conv3",
                    **conv_init())(y)
        if self.project or residual.shape[-1] != self.planes * 2:
            residual = nn.Conv(self.planes * 2, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype, name="proj",
                               **conv_init())(x)
        return y + residual


class ResidualChain(nn.Module):
    planes: int
    blocks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype,
                           name=f"block{i}")(x, train)
        return x


class Hourglass(nn.Module):
    """Recursive down/up module, depth 4 (reference :49-89), unrolled."""
    planes: int
    blocks: int
    depth: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def level(n, x):
            up1 = ResidualChain(self.planes, self.blocks, dtype=self.dtype,
                                name=f"up1_d{n}")(x, train)
            low = nn.max_pool(x, (2, 2), strides=(2, 2))
            low = ResidualChain(self.planes, self.blocks, dtype=self.dtype,
                                name=f"low1_d{n}")(low, train)
            if n > 1:
                low = level(n - 1, low)
            else:
                low = ResidualChain(self.planes, self.blocks,
                                    dtype=self.dtype,
                                    name=f"low2_d{n}")(low, train)
            low = ResidualChain(self.planes, self.blocks, dtype=self.dtype,
                                name=f"low3_d{n}")(low, train)
            up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(self.depth, x)


class HourglassRTPose(nn.Module):
    """num_stacks hourglasses with paf+heat heads per stack
    (reference :92-189; train_SH uses 8 stacks at input 256, stride 4)."""
    num_stacks: int = 8
    num_blocks: int = 4
    num_feats: int = 128
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> ModelOutput:
        x = images.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="stem_conv", **conv_init())(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = Bottleneck(64, dtype=self.dtype, name="layer1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = Bottleneck(64, dtype=self.dtype, name="layer2")(x, train)
        x = Bottleneck(self.num_feats, dtype=self.dtype,
                       name="layer3")(x, train)

        ch = self.num_feats * 2
        pafs, heats = [], []
        for i in range(self.num_stacks):
            y = Hourglass(self.num_feats, self.num_blocks, dtype=self.dtype,
                          name=f"hg{i}")(x, train)
            y = ResidualChain(self.num_feats, self.num_blocks,
                              dtype=self.dtype, name=f"res{i}")(y, train)
            y = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"fc{i}",
                        **conv_init())(y)
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"fc_bn{i}")(y)
            y = nn.relu(y)
            paf = nn.Conv(self.paf_channels, (1, 1), dtype=self.dtype,
                          name=f"score_paf{i}", **conv_init())(y)
            heat = nn.Conv(self.heat_channels, (1, 1), dtype=self.dtype,
                           name=f"score_ht{i}", **conv_init())(y)
            pafs.append(paf)
            heats.append(heat)
            if i < self.num_stacks - 1:
                fc_ = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"fc_{i}",
                              **conv_init())(y)
                paf_ = nn.Conv(ch, (1, 1), dtype=self.dtype,
                               name=f"paf_score_{i}", **conv_init())(paf)
                ht_ = nn.Conv(ch, (1, 1), dtype=self.dtype,
                              name=f"ht_score_{i}", **conv_init())(heat)
                x = x + fc_ + paf_ + ht_

        return ModelOutput(
            pafs=jnp.stack([p.astype(jnp.float32) for p in pafs]),
            heatmaps=jnp.stack([h.astype(jnp.float32) for h in heats]))
