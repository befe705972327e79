"""Closed-loop convention check: perfect heatmaps/PAFs decoded by the
device pipeline and pushed through the COCO result conversion + OKS
evaluator must score ~1.0 AP.

This jointly validates the (c+0.5)*f-0.5 grid conventions, the sub-pixel
refinement, grouping, normalized-coordinate output, the append_result
pixel mapping (reference coco_eval.py:117-154), and the evaluator.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.data.gt import ground_truth_maps
from rtpose_tpu.evalx.cocoeval import evaluate_keypoints
from rtpose_tpu.evalx.harness import append_result
from rtpose_tpu.ops.decode import decode_poses, people_to_numpy
from rtpose_tpu.skeleton import NUM_PARTS, ORDER_COCO

from test_gt_decode_roundtrip import _spread_people


@pytest.mark.parametrize("size,stride,sigma,limb_width", [
    (368, 8, 7.0, 1.0),       # flagship recipe (train_VGG19.py)
    (256, 4, 4.416, 1.289),   # hourglass recipe (train_SH.py:76-77,267)
])
def test_oracle_maps_score_high_ap(size, stride, sigma, limb_width):
    rng = np.random.RandomState(0)
    gts = {}
    dts = {}
    for img_id, n_people in ((1, 1), (2, 3)):
        kps = _spread_people(rng, n_people, size=size)
        heat, paf = ground_truth_maps(kps, input_y=size, input_x=size,
                                      stride=stride, sigma=sigma,
                                      limb_width=limb_width)
        heat = heat + rng.normal(0, 1e-5, heat.shape)   # break ties
        people_dev = decode_poses(jnp.asarray(heat, jnp.float32),
                                  jnp.asarray(paf, jnp.float32),
                                  factor=stride, thresh_heatmap=0.3)
        people = people_to_numpy(people_dev, size, size)
        assert len(people) == n_people

        outputs = []
        # scale=1 -> upsample_keypoints == map size
        append_result(img_id, people, (size, size), outputs)
        dts[img_id] = outputs

        gt_list = []
        for pi, person in enumerate(kps):
            coco_kp = np.zeros((17, 3))
            for slot, part in enumerate(ORDER_COCO):
                coco_kp[slot] = (person[part, 0], person[part, 1], 2)
            xs, ys = coco_kp[:, 0], coco_kp[:, 1]
            area = float((xs.max() - xs.min()) * (ys.max() - ys.min()))
            gt_list.append({
                "id": img_id * 100 + pi, "image_id": img_id,
                "category_id": 1,
                "keypoints": [float(v) for v in coco_kp.reshape(-1)],
                "num_keypoints": 17, "area": area, "iscrowd": 0,
                "bbox": [float(xs.min()), float(ys.min()),
                         float(xs.max() - xs.min()),
                         float(ys.max() - ys.min())],
            })
        gts[img_id] = gt_list

    stats = evaluate_keypoints(gts, dts)
    # grid quantization at stride 8 costs a little OKS on small people,
    # but AP at the standard thresholds should be essentially perfect
    assert stats["AP"] > 0.95, stats
    assert stats["AR"] > 0.95, stats
