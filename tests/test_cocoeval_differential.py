"""Differential validation of the production OKS evaluator.

rtpose_tpu/evalx/cocoeval.py vs tests/pycoco_oracle.py (an independent,
pycocotools-literal transcription of the COCOeval keypoints protocol) on
hundreds of randomized annotation/detection sets covering crowd gts,
unlabeled (num_keypoints=0) gts with bbox-fallback OKS, area-range edges,
score ties, >maxDets detections, gt-less and dt-less images.

This is the round-2 answer to the 'mAP 0.653 unverifiable without COCO
data' gap: the protocol implementation is pinned to the pycocotools
algorithm; the only unverified link left is the trained weights.
"""

import numpy as np
import pytest

from rtpose_tpu.evalx.cocoeval import evaluate_keypoints
from pycoco_oracle import evaluate_keypoints_oracle

STAT_KEYS = ["AP", "AP50", "AP75", "APm", "APl",
             "AR", "AR50", "AR75", "ARm", "ARl"]


def _rand_gt(rng, ann_id, image_id):
    kind = rng.choice(["normal", "crowd", "empty"], p=[0.7, 0.15, 0.15])
    kps = np.zeros((17, 3))
    cx, cy = rng.uniform(50, 450, 2)
    spread = rng.uniform(5, 60)
    kps[:, 0] = cx + rng.normal(0, spread, 17)
    kps[:, 1] = cy + rng.normal(0, spread, 17)
    if kind == "empty":
        kps[:] = 0.0
        n_vis = 0
    else:
        # random visibility pattern; at least 1 visible
        vis = rng.randint(0, 3, 17)
        if (vis > 0).sum() == 0:
            vis[rng.randint(17)] = 2
        kps[:, 2] = vis
        kps[vis == 0, :2] = 0.0
        n_vis = int((vis > 0).sum())
    # areas spanning the medium/large boundaries, sometimes exactly on them
    area = float(rng.choice([
        rng.uniform(100, 2000), 32.0 ** 2, 96.0 ** 2,
        rng.uniform(1024, 9216), rng.uniform(9216, 60000)]))
    w, h = rng.uniform(20, 120, 2)
    return {
        "id": ann_id, "image_id": image_id, "category_id": 1,
        "keypoints": [float(v) for v in kps.reshape(-1)],
        "num_keypoints": n_vis, "area": area,
        "iscrowd": 1 if kind == "crowd" else 0,
        "bbox": [float(cx - w / 2), float(cy - h / 2), float(w), float(h)],
    }, kps


def _rand_dt(rng, image_id, base_kps=None):
    kps = np.zeros((17, 3))
    if base_kps is not None and rng.rand() < 0.8:
        jitter = rng.choice([1.0, 4.0, 15.0, 60.0])
        kps[:, 0] = base_kps[:, 0] + rng.normal(0, jitter, 17)
        kps[:, 1] = base_kps[:, 1] + rng.normal(0, jitter, 17)
    else:
        kps[:, 0] = rng.uniform(0, 500, 17)
        kps[:, 1] = rng.uniform(0, 500, 17)
    kps[:, 2] = 1
    if rng.rand() < 0.2:          # some parts missing (zeroed)
        drop = rng.rand(17) < 0.3
        kps[drop] = 0.0
    # quantized scores force ties; mergesort stability must agree
    score = float(np.round(rng.uniform(0.1, 1.0), 1))
    return {"image_id": image_id, "category_id": 1,
            "keypoints": [float(v) for v in kps.reshape(-1)],
            "score": score}


def _rand_case(seed):
    rng = np.random.RandomState(seed)
    n_imgs = rng.randint(1, 7)
    img_ids = list(range(1, n_imgs + 1))
    gts, dts = {}, {}
    ann_id = 1
    for img in img_ids:
        gts[img], dts[img] = [], []
        n_gt = rng.randint(0, 5)
        all_kps = []
        for _ in range(n_gt):
            g, kps = _rand_gt(rng, ann_id, img)
            ann_id += 1
            gts[img].append(g)
            all_kps.append(kps)
        # occasionally a flood of detections to exercise maxDets=20
        n_dt = rng.choice([0, rng.randint(1, 6), rng.randint(20, 28)],
                          p=[0.15, 0.7, 0.15])
        for _ in range(int(n_dt)):
            base = all_kps[rng.randint(len(all_kps))] if all_kps and \
                rng.rand() < 0.8 else None
            dts[img].append(_rand_dt(rng, img, base))
    return gts, dts, img_ids


@pytest.mark.parametrize("seed", range(40))
def test_differential_randomized(seed):
    gts, dts, img_ids = _rand_case(seed)
    # deep copies: both implementations mutate their inputs (add ids etc.)
    got = evaluate_keypoints(
        {i: [dict(g) for g in gts[i]] for i in img_ids},
        {i: [dict(d) for d in dts[i]] for i in img_ids}, img_ids)
    want = evaluate_keypoints_oracle(
        {i: [dict(g) for g in gts[i]] for i in img_ids},
        {i: [dict(d) for d in dts[i]] for i in img_ids}, img_ids)
    for k in STAT_KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), \
            f"seed={seed} stat={k}: {got[k]} vs oracle {want[k]}"


def test_differential_many_small_cases():
    """Hundreds of tiny adversarial cases in one test (fast)."""
    mismatches = []
    for seed in range(100, 400):
        gts, dts, img_ids = _rand_case(seed)
        got = evaluate_keypoints(
            {i: [dict(g) for g in gts[i]] for i in img_ids},
            {i: [dict(d) for d in dts[i]] for i in img_ids}, img_ids)
        want = evaluate_keypoints_oracle(
            {i: [dict(g) for g in gts[i]] for i in img_ids},
            {i: [dict(d) for d in dts[i]] for i in img_ids}, img_ids)
        for k in STAT_KEYS:
            if got[k] != pytest.approx(want[k], abs=1e-9):
                mismatches.append((seed, k, got[k], want[k]))
    assert not mismatches, mismatches[:10]


def test_empty_keypoint_gt_bbox_fallback_matches_oracle():
    """The ignore-bbox fallback (round-1 advisor fix) against the oracle,
    sweeping a detection across the region boundary."""
    rng = np.random.RandomState(0)
    real = np.zeros((17, 3))
    real[:, 0] = np.linspace(400, 430, 17)
    real[:, 1] = np.linspace(400, 430, 17)
    real[:, 2] = 2
    gt_real = {"id": 1, "image_id": 1, "category_id": 1,
               "keypoints": [float(v) for v in real.reshape(-1)],
               "num_keypoints": 17, "area": 900.0, "iscrowd": 0,
               "bbox": [400.0, 400.0, 30.0, 30.0]}
    gt_empty = {"id": 2, "image_id": 1, "category_id": 1,
                "keypoints": [0.0] * 51, "num_keypoints": 0,
                "area": 2500.0, "iscrowd": 0,
                "bbox": [100.0, 100.0, 50.0, 50.0]}
    for x in (40.0, 60.0, 120.0, 199.0, 201.0, 240.0, 260.0):
        junk = np.zeros((17, 3))
        junk[:, 0] = x + rng.uniform(-1, 1, 17)
        junk[:, 1] = x
        junk[:, 2] = 1
        dts = [{"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in real.reshape(-1)],
                "score": 0.8},
               {"image_id": 1, "category_id": 1,
                "keypoints": [float(v) for v in junk.reshape(-1)],
                "score": 0.9}]
        got = evaluate_keypoints({1: [dict(gt_real), dict(gt_empty)]},
                                 {1: [dict(d) for d in dts]}, [1])
        want = evaluate_keypoints_oracle(
            {1: [dict(gt_real), dict(gt_empty)]},
            {1: [dict(d) for d in dts]}, [1])
        assert got["AP"] == pytest.approx(want["AP"], abs=1e-9), x
