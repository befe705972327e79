"""Native OKS evaluator: hand-computable fixtures."""

import numpy as np
import pytest

from rtpose_tpu.evalx.cocoeval import (OKS_THRESHOLDS, compute_oks,
                                       evaluate_keypoints)
from rtpose_tpu.skeleton import COCO_SIGMAS


def _gt(ann_id, kps, area=5000.0, image_id=1, crowd=0):
    kps = np.asarray(kps, float)
    return {
        "id": ann_id, "image_id": image_id, "category_id": 1,
        "keypoints": [float(v) for v in kps.reshape(-1)],
        "num_keypoints": int((kps.reshape(-1, 3)[:, 2] > 0).sum()),
        "area": area, "iscrowd": crowd,
        "bbox": [float(kps.reshape(-1, 3)[:, 0].min()),
                 float(kps.reshape(-1, 3)[:, 1].min()), 50.0, 50.0],
    }


def _dt(kps, score=0.9, image_id=1):
    kps = np.asarray(kps, float)
    return {"image_id": image_id, "category_id": 1,
            "keypoints": [float(v) for v in kps.reshape(-1)],
            "score": score}


def _rand_kps(rng, n=17, visible=True):
    kps = np.zeros((n, 3))
    kps[:, 0] = rng.uniform(50, 300, n)
    kps[:, 1] = rng.uniform(50, 300, n)
    kps[:, 2] = 2 if visible else 0
    return kps


def test_oks_perfect_is_one():
    rng = np.random.RandomState(0)
    kps = _rand_kps(rng)
    assert compute_oks(kps, kps, gt_area=5000.0) == pytest.approx(1.0)


def test_oks_decreases_with_distance():
    rng = np.random.RandomState(0)
    kps = _rand_kps(rng)
    near = kps.copy()
    near[:, 0] += 2
    far = kps.copy()
    far[:, 0] += 30
    o_near = compute_oks(near, kps, gt_area=5000.0)
    o_far = compute_oks(far, kps, gt_area=5000.0)
    assert 1.0 > o_near > o_far > 0.0


def test_perfect_detections_ap_one():
    rng = np.random.RandomState(1)
    gts, dts = {}, {}
    for img in (1, 2, 3):
        kp1 = _rand_kps(rng)
        kp2 = _rand_kps(rng)
        gts[img] = [_gt(10 * img + 1, kp1, image_id=img),
                    _gt(10 * img + 2, kp2, image_id=img)]
        dts[img] = [_dt(kp1, 0.9, img), _dt(kp2, 0.8, img)]
    stats = evaluate_keypoints(gts, dts)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)


def test_missing_detection_halves_recall():
    rng = np.random.RandomState(2)
    kp1 = _rand_kps(rng)
    kp2 = _rand_kps(rng)
    gts = {1: [_gt(1, kp1), _gt(2, kp2)]}
    dts = {1: [_dt(kp1, 0.9)]}
    stats = evaluate_keypoints(gts, dts)
    assert stats["AR"] == pytest.approx(0.5)
    # perfect precision on the found one: AP = 0.5 (precision 1 up to
    # recall 0.5, 0 beyond)
    assert 0.45 < stats["AP"] <= 0.51


def test_false_positive_lowers_ap():
    rng = np.random.RandomState(3)
    kp1 = _rand_kps(rng)
    junk = _rand_kps(rng) + 500
    gts = {1: [_gt(1, kp1)]}
    # false positive scored higher than the true positive
    dts = {1: [_dt(junk, 0.95), _dt(kp1, 0.9)]}
    stats = evaluate_keypoints(gts, dts)
    assert stats["AP"] < 0.55
    assert stats["AR"] == pytest.approx(1.0)


def test_jittered_detections_partial():
    """Jitter ~ the keypoint sigma: OKS lands strictly inside (0.5, 0.95)
    so AP is between 0 and 1."""
    rng = np.random.RandomState(4)
    kp = _rand_kps(rng)
    s = np.sqrt(5000.0)
    jit = kp.copy()
    jit[:, 0] += COCO_SIGMAS * 2 * s * 0.7
    gts = {1: [_gt(1, kp)]}
    dts = {1: [_dt(jit, 0.9)]}
    stats = evaluate_keypoints(gts, dts)
    assert 0.0 < stats["AP"] < 1.0


def test_crowd_gt_is_ignored():
    rng = np.random.RandomState(5)
    kp = _rand_kps(rng)
    crowd_kp = _rand_kps(rng)
    gts = {1: [_gt(1, kp), _gt(2, crowd_kp, crowd=1)]}
    dts = {1: [_dt(kp, 0.9), _dt(crowd_kp, 0.8)]}
    stats = evaluate_keypoints(gts, dts)
    # crowd gt neither counts as fn nor penalizes its matched dt
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_unlabeled_gt_is_ignored():
    rng = np.random.RandomState(6)
    kp = _rand_kps(rng)
    empty = _rand_kps(rng, visible=False)
    gts = {1: [_gt(1, kp), _gt(2, empty)]}
    dts = {1: [_dt(kp, 0.9)]}
    stats = evaluate_keypoints(gts, dts)
    assert stats["AP"] == pytest.approx(1.0)
