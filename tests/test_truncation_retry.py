"""Truncation self-healing: crowded frames that overflow a fixed-shape
decode cap are automatically re-decoded at raised caps.

Round-2 verdict finding: `People.truncated` was computed everywhere and
acted on nowhere — on crowded images eval would silently drop people
exactly where AP is hardest (the reference keeps unbounded dynamic lists,
pafprocess.cpp:24-43, so it never truncates).  These tests pin the retry
contract at all three surfaces: PosePipeline.run, the batched
submit/collect path, and the eval harness.
"""

import json

import numpy as np
import PIL.Image
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.infer.pipeline import PosePipeline
from rtpose_tpu.models import get_model
from rtpose_tpu.ops.decode import decode_poses, people_to_numpy

from util_synth import grid_people, render_maps

# Caps tight enough that a multi-person scene overflows max_total_conns
# (19 limbs x N people > 32 for N >= 2) -> People.truncated.
TIGHT = dict(max_peaks=16, max_candidates=64, max_total_conns=32,
             max_people=64)
# Raised caps that fit the scene (kept small so CPU tests stay fast;
# production defaults are infer.pipeline.RETRY_CAPS).  'gather' sampling is
# cheapest at these sizes on CPU and retry_caps passes straight through.
RAISED = dict(max_peaks=16, max_candidates=512, max_total_conns=304,
              max_people=64, sampling="gather")


def _crowd_maps(n_rows=3, n_cols=4, h=46, w=46, seed=0):
    rng = np.random.RandomState(seed)
    people = grid_people(n_rows, n_cols, h, w, rng)
    heat, paf = render_maps(people, h, w)
    paf = paf + rng.normal(0, 1e-4, paf.shape).astype(np.float32)
    return people, jnp.asarray(heat), jnp.asarray(paf)


def _tiny_pipeline(**kwargs):
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return PosePipeline(model, params, input_size=368, flip=False,
                        retry_caps=RAISED, **{**TIGHT, **kwargs})


def _fake_infer(maps_list):
    """Replacement for PosePipeline._infer: pops precomputed maps in call
    order and decodes them at the pipeline's own tight caps (so the
    truncation signal is produced by the real decode, not faked)."""
    it = iter(maps_list)

    def infer(params, image_u8):
        heat, paf = next(it)
        people = decode_poses(heat, paf, sampling="gather", **TIGHT)
        return people, heat, paf

    return infer


def test_run_retries_truncated_frame():
    people_gt, heat, paf = _crowd_maps()
    pipe = _tiny_pipeline()
    pipe._infer = _fake_infer([(heat, paf)])
    img = np.zeros((368, 368, 3), np.uint8)
    people, _, _, meta = pipe.run(img)
    assert meta.get("retried") is True
    assert meta["truncated"] is False
    # the retried decode recovers every person the raised-cap decode finds
    direct = people_to_numpy(
        jax.device_get(decode_poses(heat, paf, **RAISED)), 368, 368)
    assert len(people) == len(direct) == len(people_gt)
    for a, b in zip(people, direct):
        assert a["parts"] == b["parts"]


def test_run_without_auto_retry_keeps_signal():
    _, heat, paf = _crowd_maps()
    pipe = _tiny_pipeline(auto_retry=False)
    pipe._infer = _fake_infer([(heat, paf)])
    people, _, _, meta = pipe.run(np.zeros((368, 368, 3), np.uint8))
    assert "retried" not in meta
    assert meta["truncated"] is True


def test_run_batch_collect_retries_only_truncated_frames():
    people_gt, heat_c, paf_c = _crowd_maps()
    rng = np.random.RandomState(1)
    sparse = grid_people(1, 1, 46, 46, rng)   # 19 conns < 32
    heat_s, paf_s = render_maps(sparse, 46, 46)
    heat_s = jnp.asarray(heat_s)
    paf_s = jnp.asarray(paf_s + rng.normal(0, 1e-4, paf_s.shape)
                        .astype(np.float32))

    pipe = _tiny_pipeline()

    def fake_batch(params, batch):
        heat = jnp.stack([heat_c, heat_s])
        paf = jnp.stack([paf_c, paf_s])
        from rtpose_tpu.ops.decode import decode_poses_batch
        people = decode_poses_batch(heat, paf, sampling="gather", **TIGHT)
        return people, heat, paf

    pipe._infer_batch = fake_batch
    frames = [np.zeros((368, 368, 3), np.uint8) for _ in range(2)]
    people_lists, metas = pipe.run_batch_collect(
        pipe.run_batch_submit(frames))
    assert metas[0].get("retried") is True
    assert metas[0]["truncated"] is False
    assert "retried" not in metas[1]
    assert metas[1]["truncated"] is False
    assert len(people_lists[0]) == len(people_gt)
    assert len(people_lists[1]) == len(sparse)
    # retried frame matches the direct raised-cap decode; untouched frame
    # matches the tight-cap decode (it never overflowed)
    direct_c = people_to_numpy(
        jax.device_get(decode_poses(heat_c, paf_c, **RAISED)), 368, 368)
    for a, b in zip(people_lists[0], direct_c):
        assert a["parts"] == b["parts"]


def test_batched_retry_pads_selection_to_full_batch(monkeypatch):
    """The retry re-decode must receive a FULL-batch-sized input no matter
    how many frames truncated: a data-dependent row count compiles a new
    XLA program per distinct count (8-15 s each on the tunnel TPU — the
    crowd-dense eval bench fell to 9 img/s before the padding fix,
    scripts/crowded_eval_bench.py / SCALING.md)."""
    people_gt, heat_c, paf_c = _crowd_maps()
    rng = np.random.RandomState(1)
    sparse = grid_people(1, 1, 46, 46, rng)
    heat_s, paf_s = render_maps(sparse, 46, 46)
    heat_s = jnp.asarray(heat_s)
    paf_s = jnp.asarray(paf_s + rng.normal(0, 1e-4, paf_s.shape)
                        .astype(np.float32))

    pipe = _tiny_pipeline()

    def fake_batch(params, batch):
        heat = jnp.stack([heat_c, heat_s, heat_c])   # frames 0,2 overflow
        paf = jnp.stack([paf_c, paf_s, paf_c])
        from rtpose_tpu.ops.decode import decode_poses_batch
        people = decode_poses_batch(heat, paf, sampling="gather", **TIGHT)
        return people, heat, paf

    pipe._infer_batch = fake_batch

    retry_shapes = []
    import rtpose_tpu.infer.pipeline as pl
    real = pl.decode_poses_batch

    def spy(heat, paf, **kw):
        retry_shapes.append(heat.shape)
        return real(heat, paf, **kw)

    monkeypatch.setattr(pl, "decode_poses_batch", spy)
    frames = [np.zeros((368, 368, 3), np.uint8) for _ in range(3)]
    people_lists, metas = pipe.run_batch_collect(
        pipe.run_batch_submit(frames))
    assert len(retry_shapes) == 1
    # 2 truncated frames, but the retry batch is padded to all 3 rows
    assert retry_shapes[0][0] == 3
    assert [bool(m.get("retried")) for m in metas] == [True, False, True]
    # pad rows repeat a real frame; results must still map per-frame
    assert len(people_lists[0]) == len(people_gt)
    assert len(people_lists[2]) == len(people_gt)
    assert len(people_lists[1]) == len(sparse)


def test_eval_harness_zero_silent_truncations(tmp_path):
    """A crowded synthetic COCO-format eval set evaluates with the retry
    firing and NO frame left truncated; AP stays near-oracle (the retried
    decode recovers the people the tight caps would have dropped)."""
    from rtpose_tpu.evalx.harness import run_eval
    from rtpose_tpu.skeleton import ORDER_COCO

    size = 368
    img_dir = tmp_path / "val"
    img_dir.mkdir()
    images, annotations, maps_list = [], [], []
    ann_id = 1   # 1-based like real COCO: the pycocotools matching
                 # protocol uses gt id 0 as the "unmatched" sentinel
    for img_id, (rows, cols) in ((1, (2, 3)), (2, (1, 1))):
        rng = np.random.RandomState(img_id)
        people = grid_people(rows, cols, size // 8, size // 8, rng)
        heat, paf = render_maps(people, size // 8, size // 8)
        paf = paf + rng.normal(0, 1e-4, paf.shape).astype(np.float32)
        maps_list.append((jnp.asarray(heat), jnp.asarray(paf)))
        name = f"{img_id:012d}.jpg"
        PIL.Image.fromarray(np.zeros((size, size, 3), np.uint8)
                            ).save(img_dir / name)
        images.append({"id": img_id, "file_name": name,
                       "width": size, "height": size})
        for person in people:
            coco_kp = np.zeros((17, 3))
            for slot, part in enumerate(ORDER_COCO):
                # (c + 0.5) * 8 matches the decode->append_result chain:
                # x_up = (x_low + 0.5)*8 - 0.5, then append_result adds 0.5
                coco_kp[slot] = ((person[part, 0] + 0.5) * 8,
                                 (person[part, 1] + 0.5) * 8, 2)
            xs, ys = coco_kp[:, 0], coco_kp[:, 1]
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": [float(v) for v in coco_kp.reshape(-1)],
                "num_keypoints": 17, "iscrowd": 0,
                "area": float((xs.max() - xs.min()) * (ys.max() - ys.min())),
                "bbox": [float(xs.min()), float(ys.min()),
                         float(xs.max() - xs.min()),
                         float(ys.max() - ys.min())]})
            ann_id += 1
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(
        {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "person"}]}))

    pipe = _tiny_pipeline()
    pipe._infer = _fake_infer(maps_list)
    stats = run_eval(str(img_dir), str(ann_file), pipe)
    assert stats["frames_retried"] == 1       # only the crowded image
    assert stats["frames_truncated"] == 0     # nothing silently dropped
    assert stats["AP"] > 0.9, stats


def test_decode_paths_share_gaussian_filt():
    """Regression: the multiscale decode (`_decode_only`) silently dropped
    gaussian_filt while the truncation retry applied it — same maps would
    refine differently depending on whether the crowd-retry fired.  All
    decode partials must carry the pipeline's gaussian_filt setting."""
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.models import get_model

    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    for gf in (False, True):
        pipe = PosePipeline(model, params, input_size=56, flip=False,
                            gaussian_filt=gf)
        assert pipe._decode_only.keywords["gaussian_filt"] is gf
        assert pipe._decode_retry.keywords["gaussian_filt"] is gf
