"""Tensor parallelism and multi-host helpers — in-suite validation.

Round-1 gap: the DP4xTP2 claim was only backed by the (then-failing)
driver dryrun. These tests run on the virtual 8-device CPU mesh:

- num_model=2 (channel-sharded conv kernels over the `model` axis) must
  produce the same per-step losses and near-identical params as pure DP.
- the sharding rules must actually shard something (no silent all-replicate
  pass).
- eval-shard merge across simulated processes must reproduce the
  single-process evaluation exactly.
"""

import json

import numpy as np
import pytest

import jax

from rtpose_tpu.config import Config
from rtpose_tpu.parallel import mesh as pmesh
from rtpose_tpu.parallel.distributed import host_shard, merge_result_files
from rtpose_tpu.parallel.mesh import MODEL_AXIS
from rtpose_tpu.parallel.sharding import param_spec
from rtpose_tpu.train.trainer import Trainer


def _cfg(num_data, num_model):
    cfg = Config()
    cfg.model.num_stages = 1
    cfg.model.dtype = "float32"
    cfg.dataset.image_size = 64
    cfg.train.lr = 0.05
    cfg.train.freeze_base_epochs = 0
    cfg.parallel.num_data = num_data
    cfg.parallel.num_model = num_model
    return cfg


def _batches(n_steps, batch=8, size=64):
    rng = np.random.RandomState(0)
    out = []
    for _ in range(n_steps):
        images = rng.rand(batch, size, size, 3).astype(np.float32)
        kps = np.zeros((batch, 4, 18, 3), np.float32)
        kps[:, 0, :, 0] = rng.uniform(5, size - 5, (batch, 18))
        kps[:, 0, :, 1] = rng.uniform(5, size - 5, (batch, 18))
        kps[:, 0, :, 2] = 2
        mask = np.ones((batch, size // 8, size // 8, 1), np.float32)
        out.append((images, kps, mask))
    return out


def _run(num_data, num_model, n_steps=3):
    cfg = _cfg(num_data, num_model)
    mesh = pmesh.make_mesh(num_data, num_model)
    tr = Trainer(cfg, mesh=mesh)
    sh = pmesh.batch_sharding(mesh)
    losses = []
    for images, kps, mask in _batches(n_steps):
        args = [jax.device_put(x, sh) for x in (images, kps, mask)]
        tr.state, logs = tr.train_step(tr.state, *args)
        losses.append(float(np.asarray(logs["loss"])))
    params = jax.tree_util.tree_map(np.asarray, tr.state.params)
    return losses, params, tr


def test_tp2_matches_dp_losses_and_params():
    assert jax.device_count() == 8
    losses_dp, params_dp, _ = _run(8, 1)
    losses_tp, params_tp, tr_tp = _run(4, 2)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=0, atol=1e-6)
    flat_dp = jax.tree_util.tree_leaves_with_path(params_dp)
    flat_tp = jax.tree_util.tree_leaves(params_tp)
    for (path, a), b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5,
                                   err_msg=str(path))
    # the TP run must actually shard conv kernels over `model` — otherwise
    # this test would pass trivially with everything replicated
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(tr_tp.state.params)
        if any(MODEL_AXIS in (axis if isinstance(axis, tuple) else (axis,))
               for axis in (leaf.sharding.spec or ()) if axis is not None)
    ]
    assert sharded, "num_model=2 sharded no parameter leaf"


def test_param_spec_rules():
    # big conv kernel -> output-channel sharded
    k = np.zeros((3, 3, 128, 256))
    assert param_spec(k, 2)[-1] == MODEL_AXIS
    # small kernel or non-divisible channels -> replicated
    assert param_spec(np.zeros((3, 3, 16, 64)), 2) == ()
    assert param_spec(np.zeros((3, 3, 128, 129)), 2) == ()
    # bias follows its feature dim
    assert param_spec(np.zeros(256), 2) == (MODEL_AXIS,)
    # num_model=1 -> always replicated
    assert param_spec(k, 1) == ()


# ---- multi-"process" eval sharding + merge --------------------------------

def _gt(ann_id, kps, image_id):
    kps = np.asarray(kps, float)
    return {"id": ann_id, "image_id": image_id, "category_id": 1,
            "keypoints": [float(v) for v in kps.reshape(-1)],
            "num_keypoints": int((kps.reshape(-1, 3)[:, 2] > 0).sum()),
            "area": 5000.0, "iscrowd": 0,
            "bbox": [float(kps[:, 0].min()), float(kps[:, 1].min()),
                     50.0, 50.0]}


def _dt(kps, score, image_id):
    kps = np.asarray(kps, float)
    return {"image_id": image_id, "category_id": 1,
            "keypoints": [float(v) for v in kps.reshape(-1)],
            "score": float(score)}


def test_host_shard_partitions_exactly():
    items = list(range(23))
    shards = [host_shard(items, pi, 4) for pi in range(4)]
    flat = [x for s in shards for x in s]
    assert sorted(flat) == items
    assert len(set(map(tuple, shards))) == 4          # disjoint


def test_multiprocess_eval_merge_matches_single_process(tmp_path):
    from rtpose_tpu.evalx.cocoeval import evaluate_keypoints

    rng = np.random.RandomState(7)
    img_ids = list(range(1, 14))
    gts, dts = {}, {}
    ann_id = 1
    for img in img_ids:
        gts[img], dts[img] = [], []
        for _ in range(rng.randint(1, 4)):
            kps = np.zeros((17, 3))
            kps[:, 0] = rng.uniform(50, 300, 17)
            kps[:, 1] = rng.uniform(50, 300, 17)
            kps[:, 2] = 2
            gts[img].append(_gt(ann_id, kps, img))
            ann_id += 1
            jit = kps.copy()
            jit[:, :2] += rng.normal(0, 4, (17, 2))
            dts[img].append(_dt(jit, rng.uniform(0.3, 1.0), img))

    # single process
    ref = evaluate_keypoints(
        {i: list(gts[i]) for i in img_ids},
        {i: [dict(d) for d in dts[i]] for i in img_ids}, img_ids)

    # 4 simulated processes: each evaluates its host_shard of images and
    # writes results.rank{i}.json; rank 0 merges and scores
    paths = []
    for pi in range(4):
        my_ids = host_shard(img_ids, pi, 4)
        outputs = [dict(d) for i in my_ids for d in dts[i]]
        p = tmp_path / f"results.rank{pi}.json"
        p.write_text(json.dumps(outputs))
        paths.append(str(p))
    merged = merge_result_files(paths)
    dt_by_image = {}
    for r in merged:
        dt_by_image.setdefault(r["image_id"], []).append(r)
    got = evaluate_keypoints({i: list(gts[i]) for i in img_ids},
                             dt_by_image, img_ids)
    for k in ref:
        assert got[k] == pytest.approx(ref[k]), k
