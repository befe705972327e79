"""OpenPose-v2-style model (reference lib/network/openpose.py).

VGG19 trunk with PReLU on the CPM neck, then densely-connected stage
blocks: 5 triples of 3x3 PReLU convs with intra-block concat, sequential
PAF stages followed by heatmap stages (reference :64-177).  Channel
defaults follow the full-body config (38 PAF / 19 heat) rather than the
reference ctor's 14/9 legacy default.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..skeleton import NUM_HEATMAPS, NUM_PAF_CHANNELS
from .common import ModelOutput, conv_init
from .vgg19 import _VGG_BLOCKS


class PReLU(nn.Module):
    """Per-channel PReLU (flax has no built-in module for it)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


class ConvPReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="SAME", dtype=self.dtype, **conv_init())(x)
        return PReLU(dtype=self.dtype)(x)


class DenseStageBlock(nn.Module):
    """5 x (three 3x3 convs, concat) + 1x1 + 1x1 out
    (reference openpose.py:64-109)."""
    inner: int
    inner_out: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(5):
            a = ConvPReLU(self.inner, dtype=self.dtype,
                          name=f"m{i}_0")(x)
            b = ConvPReLU(self.inner, dtype=self.dtype, name=f"m{i}_1")(a)
            c = ConvPReLU(self.inner, dtype=self.dtype, name=f"m{i}_2")(b)
            x = jnp.concatenate([a, b, c], axis=-1)
        x = ConvPReLU(self.inner_out, 1, dtype=self.dtype, name="m6")(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="out", **conv_init())(x)


class VGG19PReLUBackbone(nn.Module):
    """VGG19 trunk; PReLU on conv4_2/conv4_3_CPM/conv4_4_CPM
    (reference openpose.py:13-50)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for b, (feat, n_convs) in enumerate(_VGG_BLOCKS, start=1):
            for c in range(1, n_convs + 1):
                name = f"conv{b}_{c}"
                x = nn.Conv(feat, (3, 3), padding="SAME", dtype=self.dtype,
                            name=name, **conv_init())(x)
                if name == "conv4_2":
                    x = PReLU(dtype=self.dtype, name="prelu4_2")(x)
                else:
                    x = nn.relu(x)
            if b < len(_VGG_BLOCKS):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv4_3_CPM", **conv_init())(x)
        x = PReLU(dtype=self.dtype, name="prelu4_3")(x)
        x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv4_4_CPM", **conv_init())(x)
        return PReLU(dtype=self.dtype, name="prelu4_4")(x)


class OpenPoseV2(nn.Module):
    """Sequential PAF stages then heatmap stages
    (reference openpose.py:111-177)."""
    num_paf_stages: int = 4
    num_heat_stages: int = 2
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images) -> ModelOutput:
        feat = VGG19PReLUBackbone(dtype=self.dtype, name="backbone")(
            images.astype(self.dtype))
        pafs, heats = [], []
        x = feat
        for i in range(self.num_paf_stages):
            inner = 96 if i == 0 else 128
            inner_out = 256 if i == 0 else 512
            paf = DenseStageBlock(inner, inner_out, self.paf_channels,
                                  dtype=self.dtype,
                                  name=f"paf_stage{i}")(x)
            x = jnp.concatenate([feat, paf.astype(self.dtype)], axis=-1)
            pafs.append(paf)
        for i in range(self.num_heat_stages):
            inner = 96 if i == 0 else 128
            inner_out = 256 if i == 0 else 512
            heat = DenseStageBlock(inner, inner_out, self.heat_channels,
                                   dtype=self.dtype,
                                   name=f"heat_stage{i}")(x)
            x = jnp.concatenate([feat, heat.astype(self.dtype),
                                 pafs[-1].astype(self.dtype)], axis=-1)
            heats.append(heat)
        # stage-stacked contract: repeat the PAF/heat sequences to a common
        # stage count for the loss (PAF supervised at every PAF stage, heat
        # at every heat stage — reference supervises the two lists
        # separately, openpose.py:175-177)
        n = max(len(pafs), len(heats))
        pafs = pafs + [pafs[-1]] * (n - len(pafs))
        heats = [heats[0]] * (n - len(heats)) + heats
        return ModelOutput(
            pafs=jnp.stack([p.astype(jnp.float32) for p in pafs]),
            heatmaps=jnp.stack([h.astype(jnp.float32) for h in heats]))
