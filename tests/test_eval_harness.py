"""Eval harness end-to-end: synthetic COCO val dir -> run_eval -> stats.

Uses a tiny random-weight model, so mAP is ~0; the test checks the
plumbing: image loop, pipeline, COCO result conversion, OKS evaluation,
results-json dump, and the perfect-oracle path (detections fabricated from
GT must score AP=1)."""

import json
import os

import numpy as np
import PIL.Image
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.data.coco_json import CocoJson
from rtpose_tpu.evalx.harness import eval_results, run_eval
from rtpose_tpu.infer.pipeline import PosePipeline
from rtpose_tpu.models import get_model


@pytest.fixture
def coco_val(tmp_path):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "val"
    img_dir.mkdir()
    images, annotations = [], []
    for img_id in (1, 2):
        w, h = 96, 80
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"{img_id:012d}.jpg"
        PIL.Image.fromarray(arr).save(img_dir / name)
        images.append({"id": img_id, "file_name": name,
                       "width": w, "height": h})
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(10, w - 10)),
                    float(rng.uniform(10, h - 10)), 2]
        annotations.append({"id": img_id * 10, "image_id": img_id,
                            "category_id": 1, "keypoints": kps,
                            "num_keypoints": 17, "area": 2000.0,
                            "iscrowd": 0, "bbox": [10, 10, 60, 50],
                            "segmentation": []})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "person"}]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file), tmp_path


def test_run_eval_smoke(coco_val):
    img_dir, ann_file, tmp = coco_val
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    vis = tmp / "vis"
    vis.mkdir()
    results_path = str(tmp / "results.json")
    stats = run_eval(img_dir, ann_file, pipe, vis_dir=str(vis),
                     results_path=results_path)
    assert set(stats) >= {"AP", "AP50", "APm", "APl", "AR"}
    assert os.path.exists(results_path)
    # vis images written
    assert len(list(vis.iterdir())) == 2


def test_oracle_results_score_ap1(coco_val):
    """Results built directly from GT keypoints must evaluate to AP 1."""
    img_dir, ann_file, _ = coco_val
    coco = CocoJson(ann_file)
    img_ids = coco.img_ids([1])
    outputs = []
    for img_id in img_ids:
        for a in coco.annotations(img_id, [1]):
            outputs.append({"image_id": img_id, "category_id": 1,
                            "keypoints": list(map(float, a["keypoints"])),
                            "score": 1.0})
    stats = eval_results(outputs, coco, img_ids)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_score_mode_person_ranks_out_phantoms(coco_val):
    """With the reference's fixed score=1.0 a phantom detection listed
    before the true one halves AP (no ranking information); score_mode
    'person' carries the assembled person score so COCOeval ranks the
    real detection first."""
    from rtpose_tpu.evalx.harness import append_result
    _, ann_file, _ = coco_val
    coco = CocoJson(ann_file)
    img_ids = coco.img_ids([1])

    def outputs_for(score_mode):
        outputs = []
        for img_id in img_ids:
            ann = coco.annotations(img_id, [1])[0]
            kp = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
            w = coco.image_info(img_id)["width"]
            h = coco.image_info(img_id)["height"]
            # people dicts as people_to_numpy emits them: normalized
            # coords keyed by 18-part ids. Build via the inverse of
            # person_to_coco_keypoints (x = xn*W + 0.5).
            from rtpose_tpu.skeleton import ORDER_COCO
            true_parts = {
                part: ((kp[slot, 0] - 0.5) / w, (kp[slot, 1] - 0.5) / h,
                       0.9)
                for slot, part in enumerate(ORDER_COCO)}
            phantom_parts = {p: (0.02 + 0.001 * p, 0.02, 0.1)
                             for p in list(true_parts)[:6]}
            people = [{"parts": phantom_parts, "score": 0.4},   # listed 1st
                      {"parts": true_parts, "score": 9.0}]
            append_result(img_id, people, (h, w), outputs,
                          score_mode=score_mode)
        return outputs

    ap_parity = eval_results(outputs_for("parity"), coco, img_ids)["AP"]
    ap_person = eval_results(outputs_for("person"), coco, img_ids)["AP"]
    assert ap_person > ap_parity
    assert ap_person == pytest.approx(1.0)
    assert ap_parity == pytest.approx(0.5)


def test_run_eval_batched(coco_val):
    from rtpose_tpu.evalx.harness import run_eval_batched
    img_dir, ann_file, tmp = coco_val
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    vis = tmp / "vis_batched"   # harness creates it
    stats = run_eval_batched(img_dir, ann_file, pipe, batch_size=2,
                             vis_dir=str(vis))
    assert "AP" in stats
    # vis images written from the batched path too
    assert len(list(vis.iterdir())) == 2


def test_run_eval_batched_consumer_error_unblocks_producer(coco_val):
    """Regression: if the device side raises mid-eval, the decode-ahead
    producer thread must not stay parked forever on the full queue
    (leaking the thread and its decoded frames)."""
    import threading
    import time

    from rtpose_tpu.evalx.harness import run_eval_batched

    img_dir, ann_file, _tmp = coco_val
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)

    def boom(frames):
        raise RuntimeError("device fell over")

    pipe.run_batch_submit = boom
    before = threading.active_count()
    with pytest.raises(RuntimeError, match="device fell over"):
        run_eval_batched(img_dir, ann_file, pipe, batch_size=1)
    # the stop event lets the producer drain out within its 1 s put timeout
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_run_eval_batched_pads_partial_chunks(coco_val):
    """The remainder chunk is padded to batch_size (so every bucket runs
    ONE compiled program — at COCO-val scale the second tail-batch compile
    dominated bucket wall time) and the pad frames' results are dropped:
    the results json matches the unpadded run."""
    from rtpose_tpu.evalx.harness import run_eval_batched
    img_dir, ann_file, tmp = coco_val
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def spying_pipe():
        pipe = PosePipeline(model, params, input_size=56, flip=False)
        sizes = []
        orig = pipe.run_batch_submit
        pipe.run_batch_submit = (
            lambda frames: (sizes.append(len(frames)), orig(frames))[1])
        return pipe, sizes

    # 2 images in one bucket, batch_size 4 -> one padded chunk of 4
    pipe, sizes = spying_pipe()
    r_pad = str(tmp / "r_pad.json")
    stats = run_eval_batched(img_dir, ann_file, pipe, batch_size=4,
                             results_path=r_pad)
    assert sizes == [4]
    assert stats["frames_retried"] + stats["frames_truncated"] == 0

    pipe, sizes = spying_pipe()
    r_exact = str(tmp / "r_exact.json")
    run_eval_batched(img_dir, ann_file, pipe, batch_size=4,
                     results_path=r_exact, pad_partial=False)
    assert sizes == [2]

    padded = json.load(open(r_pad))
    exact = json.load(open(r_exact))
    assert len(padded) == len(exact)
    for a, b in zip(padded, exact):
        assert a["image_id"] == b["image_id"]
        np.testing.assert_allclose(a["keypoints"], b["keypoints"],
                                   atol=1e-4)


def test_run_eval_batched_pad_factor_collapses_buckets(tmp_path):
    """pad_factor quantizes padded shapes: images whose exact stride-8
    pads differ land in ONE bucket (one compile) when the pipeline pads to
    a coarser multiple — the evalx --pad-to flag's mechanism."""
    from rtpose_tpu.evalx.harness import run_eval_batched
    rng = np.random.RandomState(1)
    img_dir = tmp_path / "val"
    img_dir.mkdir()
    images, annotations = [], []
    for img_id, (h, w) in enumerate([(80, 96), (80, 107)], start=1):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"{img_id:012d}.jpg"
        PIL.Image.fromarray(arr).save(img_dir / name)
        images.append({"id": img_id, "file_name": name,
                       "width": w, "height": h})
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(10, w - 10)),
                    float(rng.uniform(10, h - 10)), 2]
        annotations.append({"id": img_id, "image_id": img_id,
                            "category_id": 1, "keypoints": kps,
                            "num_keypoints": 17, "area": 2000.0,
                            "iscrowd": 0, "bbox": [10, 10, 60, 50],
                            "segmentation": []})
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(
        {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "person"}]}))

    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    pipe = PosePipeline(model, params, input_size=56, flip=False)
    stats = run_eval_batched(str(img_dir), str(ann_file), pipe,
                             batch_size=2)
    assert stats["n_buckets"] == 2   # exact pads: (56, 72) vs (56, 80)

    pipe16 = PosePipeline(model, params, input_size=56, flip=False,
                          pad_factor=16)
    stats16 = run_eval_batched(str(img_dir), str(ann_file), pipe16,
                               batch_size=2)
    assert stats16["n_buckets"] == 1  # both pad to (64, 80)
