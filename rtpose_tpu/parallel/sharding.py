"""Parameter sharding rules: data parallel + optional tensor parallelism.

With `num_model > 1`, large conv kernels are channel-sharded over the
`model` mesh axis (output-feature dimension of the HWIO kernel).  XLA GSPMD
propagates the sharding through the convolutions and inserts the
all-gathers / reduce-scatters over ICI — no hand-written collectives
(How-to-Scale-Your-Model recipe: pick a mesh, annotate, let XLA place
collectives).

rtpose models are small (~52M params), so TP is a scaling reserve, not a
necessity; the rules keep everything below `min_features` replicated so
tiny kernels don't pay collective latency.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def param_spec(leaf, num_model: int, min_features: int = 128) -> P:
    """PartitionSpec for one parameter leaf.

    Conv kernels (H, W, I, O) with O divisible by num_model and large
    enough get P(None, None, None, MODEL_AXIS); biases/scales follow their
    feature dim when it divides; everything else replicates.
    """
    shape = np.shape(leaf)
    if num_model <= 1 or not shape:
        return P()
    last = shape[-1]
    if last % num_model != 0 or last < min_features:
        return P()
    if len(shape) == 4:          # HWIO conv kernel
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 1:          # bias / scale
        return P(MODEL_AXIS)
    return P()


def state_shardings(mesh: Mesh, state_tree: Any, num_model: int):
    """Sharding pytree for a TrainState-like structure: array leaves keyed
    by shape via `param_spec`; scalars replicated."""
    def leaf_sharding(x):
        return NamedSharding(mesh, param_spec(x, num_model))
    return jax.tree_util.tree_map(leaf_sharding, state_tree)


def shard_tree(mesh: Mesh, tree: Any, num_model: int):
    """device_put a pytree with the inferred shardings."""
    sh = state_shardings(mesh, tree, num_model)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
