"""Data-parallel batched serving: PosePipeline over a device mesh.

The serving analogue of the trainer's DataParallel replacement
(SURVEY.md §2.3): frames shard over the mesh `data` axis and XLA runs
forward + on-device decode SPMD.  The reference can only DataParallel
the CNN forward (demo/picture_demo.py:47); its C++ grouping is
single-image host code, so its eval/video throughput never scales past
one worker — here the whole image->people program shards.

Runs on the virtual 8-device CPU mesh (conftest.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from rtpose_tpu.infer.pipeline import PosePipeline
from rtpose_tpu.models import get_model
from rtpose_tpu.parallel import mesh as pmesh


def _make_pipes():
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mesh = pmesh.make_mesh(8, 1)
    kw = dict(input_size=56, flip=True)
    return (PosePipeline(model, params, **kw),
            PosePipeline(model, params, mesh=mesh, **kw), mesh)


def _people_key(p):
    return sorted((part, round(x, 4), round(y, 4))
                  for part, (x, y, _s) in p["parts"].items())


def test_sharded_run_batch_matches_single_device():
    pipe, pipe_sh, mesh = _make_pipes()
    rng = np.random.RandomState(0)
    frames = [(rng.rand(80, 60, 3) * 255).astype(np.uint8)
              for _ in range(8)]

    ticket = pipe_sh.run_batch_submit(frames)
    assert ticket[0] == "async"
    spec = ticket[1].coords.sharding.spec
    assert spec and spec[0] == pmesh.DATA_AXIS, spec

    people_sh, metas_sh = pipe_sh.run_batch_collect(ticket)
    people_ref, metas_ref = pipe.run_batch(frames)
    assert len(people_sh) == len(people_ref) == 8
    for ps, pr, ms, mr in zip(people_sh, people_ref, metas_sh, metas_ref):
        assert ms["upsampled"] == mr["upsampled"]
        assert len(ps) == len(pr)
        for a, b in zip(sorted(ps, key=_people_key),
                        sorted(pr, key=_people_key)):
            assert _people_key(a) == _people_key(b)


def test_sharded_run_batch_pads_ragged_batch():
    _, pipe_sh, _ = _make_pipes()
    rng = np.random.RandomState(1)
    frames = [(rng.rand(80, 60, 3) * 255).astype(np.uint8)
              for _ in range(5)]   # 5 % 8 != 0 -> padded to 8 on device
    people, metas = pipe_sh.run_batch(frames)
    assert len(people) == 5 and len(metas) == 5
    for m in metas:
        assert "upsampled" in m


def test_sharded_multiscale_batch_matches_single_device():
    """Fused multi-scale TTA over the mesh: stacked per-scale batches
    shard over `data` (padded to a multiple of it) and forward + in-graph
    bicubic resize + averaging + decode run SPMD — results identical to
    the single-device fused path (round-5: --multiscale now composes
    with --data-parallel)."""
    pipe, pipe_sh, _ = _make_pipes()
    rng = np.random.RandomState(5)
    frames = [(rng.rand(80, 60, 3) * 255).astype(np.uint8)
              for _ in range(6)]   # 6 % 8 != 0 -> padded to 8 on device
    scales = (0.75, 1.0)

    ticket = pipe_sh.run_multiscale_batch_submit(frames, scales)
    assert ticket[0] == "async"
    spec = ticket[1].coords.sharding.spec
    assert spec and spec[0] == pmesh.DATA_AXIS, spec

    people_sh, metas_sh = pipe_sh.run_batch_collect(ticket)
    people_ref, metas_ref = pipe.run_multiscale_batch(frames, scales)
    assert len(people_sh) == len(people_ref) == 6
    for ps, pr, ms, mr in zip(people_sh, people_ref, metas_sh, metas_ref):
        assert ms["upsampled"] == mr["upsampled"]
        assert len(ps) == len(pr)
        for a, b in zip(sorted(ps, key=_people_key),
                        sorted(pr, key=_people_key)):
            assert _people_key(a) == _people_key(b)
