"""Pallas GT synthesis on a SHARDED mesh via shard_map.

pallas_call has no GSPMD partitioning rule, so round 1 gated the fast GT
kernel to single-chip meshes.  GT synthesis is per-image, so shard_map
over the `data` axis runs the kernel on each device's local batch shard
with zero communication — the train-step loss must be bit-identical to
the XLA scan path (both synthesize identical maps).  Runs in pallas
interpret mode on the virtual 8-device CPU mesh (conftest.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from rtpose_tpu.config import Config
from rtpose_tpu.parallel import mesh as pmesh
from rtpose_tpu.parallel.sharding import state_shardings
from rtpose_tpu.train.trainer import Trainer, make_train_step


def test_pallas_gt_shard_map_matches_xla_scan():
    cfg = Config()
    cfg.model.num_stages = 1
    cfg.model.dtype = "float32"
    cfg.dataset.image_size = 64
    cfg.train.freeze_base_epochs = 0
    mesh = pmesh.make_mesh(8, 1)
    tr = Trainer(cfg, mesh=mesh)          # cpu backend -> xla gt path

    step_pallas, _ = make_train_step(tr.model, tr.tx, cfg,
                                     gt_backend="pallas", mesh=mesh)
    sh = state_shardings(mesh, tr.state, 1)
    data = pmesh.batch_sharding(mesh)
    step_pallas = jax.jit(step_pallas,
                          in_shardings=(sh, data, data, data),
                          out_shardings=(sh, pmesh.replicated(mesh)))

    rng = np.random.RandomState(0)
    img = jax.device_put(
        jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32)), data)
    kps = np.zeros((8, 32, 18, 3), np.float32)
    kps[:, 0, :, 0] = rng.uniform(5, 59, (8, 18))
    kps[:, 0, :, 1] = rng.uniform(5, 59, (8, 18))
    kps[:, 0, :, 2] = 2
    kps = jax.device_put(jnp.asarray(kps), data)

    # deep-copy: both steps donate their input state
    state_copy = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), x.sharding)
        if hasattr(x, "sharding") else x, tr.state)
    _, logs_xla = tr.train_step(tr.state, img, kps, None)
    _, logs_pal = step_pallas(state_copy, img, kps, None)
    lx = float(np.asarray(logs_xla["loss"]))
    lp = float(np.asarray(logs_pal["loss"]))
    assert lx == lp, (lx, lp)
