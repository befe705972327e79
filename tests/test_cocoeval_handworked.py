"""Hand-computed precision/recall anchors for the OKS evaluator.

Round-2 verdict: the differential oracle (tests/pycoco_oracle.py) shares an
author with the implementation, so a shared misreading of the protocol
would pass all ~340 differential cases.  These tests anchor the
`_accumulate` math (101-point interpolation, right-monotone precision
envelope, searchsorted recall lookup, -1 undefined sentinel, area-range
averaging) against AP/AR values derived BY HAND from the published COCO
protocol definition — closed-form fractions like 51/101 and 56/101 that
only fall out of the exact interpolation rules, not from any
implementation.

Derivations (detections globally sorted by score; every TP here is an
exact keypoint copy, OKS = 1 at all 10 thresholds; every FP is displaced
far away, OKS ~ 0):

- 1 GT, 1 TP: precision 1 everywhere -> AP = 1, AR = 1.
- 2 GT, [TP(.9), FP(.8)]: cum recall [.5, .5], precision [1, .5];
  envelope [1, .5]; searchsorted(left) maps recall thresholds
  0.00..0.50 (51 of 101 points) to precision 1, the rest past the last
  recall to 0 -> AP = 51/101, AR = 1/2.
- 1 GT, [FP(.9), TP(.8)]: cum recall [0, 1], precision [0, .5];
  right-monotone envelope lifts index 0 to .5; every recall threshold
  lands on precision .5 -> AP = 1/2 exactly, AR = 1 (the envelope
  subtlety: a leading FP halves AP but does not zero any of it).
- 3 GT, [TP(.9), FP(.8), TP(.7)]: cum recall [1/3, 1/3, 2/3], precision
  [1, 1/2, 2/3]; envelope [1, 2/3, 2/3]; thresholds 0.00..0.33 (34
  points) -> 1, 0.34..0.66 (33 points) -> 2/3, rest 0
  -> AP = (34 + 22)/101 = 56/101, AR = 2/3.
- area ranges: a large-only GT set must report APm/ARm = -1 (the
  protocol's undefined sentinel), never 0.
"""

import numpy as np
import pytest

from rtpose_tpu.evalx.cocoeval import evaluate_keypoints


def _kps(x0, y0, spread):
    """17 visible keypoints spread over a spread x spread box."""
    pts = []
    for i in range(17):
        pts += [x0 + (i % 5) * spread / 4.0,
                y0 + (i // 5) * spread / 3.0, 2]
    return pts


def _gt(gid, img_id, x0, y0, spread):
    kps = _kps(x0, y0, spread)
    xs = np.array(kps).reshape(17, 3)
    return {"id": gid, "image_id": img_id, "category_id": 1,
            "keypoints": [float(v) for v in kps], "num_keypoints": 17,
            "iscrowd": 0, "area": float(spread * spread),
            "bbox": [x0, y0, float(spread), float(spread)]}


def _dt(img_id, x0, y0, spread, score):
    return {"image_id": img_id, "category_id": 1,
            "keypoints": [float(v) for v in _kps(x0, y0, spread)],
            "score": score}


MED = 64.0       # 64^2 = 4096: inside the medium range (32^2, 96^2)


def test_single_exact_detection_is_perfect():
    gts = {1: [_gt(1, 1, 10, 10, MED)]}
    dts = {1: [_dt(1, 10, 10, MED, 0.9)]}
    s = evaluate_keypoints(gts, dts)
    assert s["AP"] == pytest.approx(1.0)
    assert s["AR"] == pytest.approx(1.0)
    assert s["APm"] == pytest.approx(1.0)
    assert s["APl"] == -1.0 and s["ARl"] == -1.0    # no large gts


def test_tp_then_fp_gives_51_over_101():
    gts = {1: [_gt(1, 1, 10, 10, MED), _gt(2, 1, 300, 300, MED)]}
    dts = {1: [_dt(1, 10, 10, MED, 0.9),
               _dt(1, 5000, 5000, MED, 0.8)]}     # FP: no gt nearby
    s = evaluate_keypoints(gts, dts)
    assert s["AP"] == pytest.approx(51.0 / 101.0)
    assert s["AR"] == pytest.approx(0.5)


def test_leading_fp_halves_ap_via_envelope():
    gts = {1: [_gt(1, 1, 10, 10, MED)]}
    dts = {1: [_dt(1, 5000, 5000, MED, 0.9),      # FP outranks the TP
               _dt(1, 10, 10, MED, 0.8)]}
    s = evaluate_keypoints(gts, dts)
    assert s["AP"] == pytest.approx(0.5)
    assert s["AR"] == pytest.approx(1.0)


def test_interleaved_fp_gives_56_over_101():
    gts = {1: [_gt(1, 1, 10, 10, MED), _gt(2, 1, 300, 300, MED),
               _gt(3, 1, 600, 600, MED)]}
    dts = {1: [_dt(1, 10, 10, MED, 0.9),
               _dt(1, 5000, 5000, MED, 0.8),
               _dt(1, 300, 300, MED, 0.7)]}
    s = evaluate_keypoints(gts, dts)
    assert s["AP"] == pytest.approx(56.0 / 101.0)
    assert s["AR"] == pytest.approx(2.0 / 3.0)


def test_cross_image_score_ordering():
    """The global sort is by detection score across images: a low-scored
    FP on another image must not dent the envelope below the TP recall
    (AP = 51/101 exactly as in the single-image case)."""
    gts = {1: [_gt(1, 1, 10, 10, MED)], 2: [_gt(2, 2, 10, 10, MED)]}
    dts = {1: [_dt(1, 10, 10, MED, 0.9)],
           2: [_dt(2, 5000, 5000, MED, 0.8)]}
    s = evaluate_keypoints(gts, dts)
    assert s["AP"] == pytest.approx(51.0 / 101.0)
    assert s["AR"] == pytest.approx(0.5)


def test_undefined_area_range_reports_minus_one():
    big = 200.0                                   # 200^2 > 96^2: large
    gts = {1: [_gt(1, 1, 10, 10, big)]}
    dts = {1: [_dt(1, 10, 10, big, 0.9)]}
    s = evaluate_keypoints(gts, dts)
    assert s["AP"] == pytest.approx(1.0)
    assert s["APl"] == pytest.approx(1.0)
    assert s["APm"] == -1.0                        # undefined, NOT zero
    assert s["ARm"] == -1.0
