"""Shared building blocks for the rtpose model zoo.

All models are NHWC (TPU-native layout), built on flax.linen, and expose the
same contract:

    apply(params, images_nhwc) -> ModelOutput

where ``ModelOutput.pafs``/``ModelOutput.heatmaps`` stack every supervised
refinement stage along a leading axis — stage outputs are what the 12-term
training loss consumes (reference train/train_VGG19.py:143-174) and
``[-1]`` is the inference output (reference evaluate/coco_eval.py:110-112).

Backbones produce ``features`` at output-stride ``downsample`` with a fixed
channel count; CPM-style refinement heads (:class:`CPMStages`) are shared
across backbone families (the TPU analogue of reference
lib/network/rtpose_vgg.py:95-127 stage dicts).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..skeleton import NUM_HEATMAPS, NUM_PAF_CHANNELS


@dataclasses.dataclass
class ModelOutput:
    """Stage-stacked model outputs.

    pafs:     (num_stages, B, H/8, W/8, 38)
    heatmaps: (num_stages, B, H/8, W/8, 19)
    """
    pafs: jax.Array
    heatmaps: jax.Array

    @property
    def paf(self) -> jax.Array:
        return self.pafs[-1]

    @property
    def heatmap(self) -> jax.Array:
        return self.heatmaps[-1]


jax.tree_util.register_pytree_node(
    ModelOutput,
    lambda o: ((o.pafs, o.heatmaps), None),
    lambda _, c: ModelOutput(*c),
)


def conv_init():
    """N(0, 0.01) weight / zero bias init (reference rtpose_vgg.py:200-206)."""
    return dict(
        kernel_init=nn.initializers.normal(stddev=0.01),
        bias_init=nn.initializers.zeros_init(),
    )


def he_reinit(params, seed: int = 0):
    """Re-draw every conv/dense kernel with He-normal (fan-in, ReLU gain).

    The reference's N(0, 0.01) init (rtpose_vgg.py:200-206) is only ever
    used together with the ImageNet-pretrained trunk (use_vgg,
    rtpose_vgg.py:235-251): from scratch, activations decay ~3x per conv
    through the 10-layer trunk and the network cannot train.  This is the
    from-scratch alternative (cfg.model.init_scheme = "scratch"): hidden
    kernels get std = sqrt(2 / fan_in); the per-stage output heads (module
    names "out", hourglass "score_paf*/score_ht*", shufflenet
    "paf"/"heatmap") KEEP their reference init so initial predictions sit
    near the background target and the MSE loss starts small (He-init
    heads start at loss ~10 and blow up at the reference lr).  Biases and
    non-kernel leaves (e.g. BN scales) are left as initialized.
    Params-level transform so every model family gets it without touching
    module code.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, max(len(flat), 1))

    def _is_head(module_names):
        # per-family prediction-head module names: CPM stages name theirs
        # "out" (vgg19/openpose_v2/atrous*), hourglass "score_paf{i}" /
        # "score_ht{i}", shufflenet "paf" / "heatmap"
        for n in module_names:
            if not isinstance(n, str):
                continue
            if n in ("out", "paf", "heatmap") or \
                    n.startswith(("score_paf", "score_ht")):
                return True
        return False

    out = []
    for k, (path, leaf) in zip(keys, flat):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        name = names[-1]
        if _is_head(names[:-1]):
            out.append(leaf)
            continue
        if name == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            fan_in = 1
            for d in leaf.shape[:-1]:
                fan_in *= d
            std = (2.0 / fan_in) ** 0.5
            leaf = std * jax.random.normal(k, leaf.shape, leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


class CPMStage1(nn.Module):
    """First prediction branch: 3×(3x3,128) + (1x1,512) + (1x1,out).

    Reference lib/network/rtpose_vgg.py:95-105.
    """
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i + 1}", **conv_init())(x)
            x = nn.relu(x)
        x = nn.Conv(512, (1, 1), dtype=self.dtype, name="conv4",
                    **conv_init())(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="out", **conv_init())(x)


class CPMStageT(nn.Module):
    """Refinement branch: 5×(7x7,128) + (1x1,128) + (1x1,out).

    Reference lib/network/rtpose_vgg.py:108-127.
    """
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(5):
            x = nn.Conv(128, (7, 7), padding="SAME", dtype=self.dtype,
                        name=f"conv{i + 1}", **conv_init())(x)
            x = nn.relu(x)
        x = nn.Conv(128, (1, 1), dtype=self.dtype, name="conv6",
                    **conv_init())(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="out", **conv_init())(x)


class CPMStages(nn.Module):
    """The multi-stage PAF/heatmap refinement cascade shared by backbones.

    Stage 1 runs on backbone features; stages 2..T run on
    concat([paf, heat, features]) (reference rtpose_vgg.py:158-198).
    `remat` rematerializes each refinement branch in the backward pass
    (jax.checkpoint), trading ~25% step time for ~2x larger trainable
    batch per chip.
    """
    num_stages: int = 6
    paf_channels: int = NUM_PAF_CHANNELS
    heat_channels: int = NUM_HEATMAPS
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, features) -> ModelOutput:
        stage_t = nn.remat(CPMStageT) if self.remat else CPMStageT
        pafs, heats = [], []
        paf = CPMStage1(self.paf_channels, dtype=self.dtype,
                        name="stage1_L1")(features)
        heat = CPMStage1(self.heat_channels, dtype=self.dtype,
                         name="stage1_L2")(features)
        pafs.append(paf)
        heats.append(heat)
        for t in range(2, self.num_stages + 1):
            x = jnp.concatenate(
                [paf.astype(self.dtype), heat.astype(self.dtype), features],
                axis=-1)
            paf = stage_t(self.paf_channels, dtype=self.dtype,
                          name=f"stage{t}_L1")(x)
            heat = stage_t(self.heat_channels, dtype=self.dtype,
                           name=f"stage{t}_L2")(x)
            pafs.append(paf)
            heats.append(heat)
        return ModelOutput(
            pafs=jnp.stack([p.astype(jnp.float32) for p in pafs]),
            heatmaps=jnp.stack([h.astype(jnp.float32) for h in heats]),
        )
