"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's torch.nn.DataParallel
(reference train/train_VGG19.py:299): a jax.sharding.Mesh with a `data`
axis for batch sharding and a reserved `model` axis for tensor parallelism.
Params are replicated; XLA inserts the gradient all-reduce over ICI when
the jitted train step consumes a data-sharded batch and produces replicated
grads (the pmean analogue of DataParallel's gather).

Multi-host: shard the per-host batch by `jax.process_index()` upstream;
the same mesh spans all processes (DCN between slices, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: int = -1, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    use = num_data * num_model
    dev_array = np.array(devices[:use]).reshape(num_data, num_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays with leading batch dim) onto the
    mesh, sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
