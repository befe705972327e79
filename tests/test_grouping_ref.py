"""Host grouping oracle: behavior tests + native C++ parity."""

import numpy as np
import pytest

from rtpose_tpu.ops import grouping_ref as G
from rtpose_tpu.skeleton import NUM_PARTS

from util_synth import synth_example


def test_find_peaks_simple():
    img = np.zeros((10, 10), dtype=np.float32)
    img[3, 4] = 0.9
    img[7, 2] = 0.5
    peaks = G.find_peaks(0.1, img)
    assert sorted(map(tuple, peaks)) == [(2, 7), (4, 3)]


def test_nms_refines_subpixel():
    # an off-center gaussian: refined coord should beat grid snap
    h = w = 20
    cx, cy = 8.3, 11.7
    yy, xx = np.mgrid[0:h, 0:w]
    heat = np.zeros((h, w, NUM_PARTS), dtype=np.float32)
    heat[:, :, 0] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 1.5**2))
    peaks = G.nms(heat, upsamp_factor=8, thresh=0.1)
    assert len(peaks[0]) == 1
    x, y, score, pid = peaks[0][0]
    assert abs(x / 8.0 - cx) < 0.5
    assert abs(y / 8.0 - cy) < 0.5
    assert score > 0.9
    assert all(len(p) == 0 for p in peaks[1:])


def test_end_to_end_recovers_people():
    people, heat, paf = synth_example(seed=0, n_people=3)
    found, scores = G.paf_to_people(heat, paf)
    assert len(found) == 3
    # each found person matches a distinct GT person within tolerance
    w_up = heat.shape[1] * 8
    h_up = heat.shape[0] * 8
    for fp in found:
        errs = []
        for gt in people:
            valid = fp[:, 2] > 0
            err = np.abs(fp[valid, 0] * w_up / 8 - gt[valid, 0]).mean() + \
                np.abs(fp[valid, 1] * h_up / 8 - gt[valid, 1]).mean()
            errs.append(err)
        assert min(errs) < 2.0
    assert (scores > 0.3).all()


def test_empty_maps_give_no_people():
    heat = np.zeros((46, 46, 19), dtype=np.float32)
    paf = np.zeros((46, 46, 38), dtype=np.float32)
    people, scores = G.paf_to_people(heat, paf)
    assert len(people) == 0


@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 3), (2, 5), (3, 8)])
def test_native_matches_python_oracle(seed, n_people):
    native = pytest.importorskip("rtpose_tpu.native")
    if not native.available():
        pytest.skip("native toolchain unavailable")
    _, heat, paf = synth_example(seed=seed, n_people=n_people)
    peaks = G.nms(heat, upsamp_factor=8, thresh=0.1)
    joint_list = G.joint_list_from_peaks(peaks)
    if joint_list.shape[0] == 0:
        pytest.skip("no peaks in synth example")
    paf_up = G.upsample_nearest(paf, 8)
    shape_up = (heat.shape[0] * 8, heat.shape[1] * 8)

    res_py = G.group_peaks(joint_list, shape_up, paf_up)
    subset_cc, peaks_cc = native.group_peaks_native(joint_list, shape_up,
                                                    paf_up)
    assert res_py.num_humans == len(subset_cc)
    np.testing.assert_allclose(res_py.subset, subset_cc, atol=1e-5)
    np.testing.assert_allclose(res_py.peak_x, peaks_cc[:, 0])
    np.testing.assert_allclose(res_py.peak_y, peaks_cc[:, 1])
    np.testing.assert_allclose(res_py.peak_score, peaks_cc[:, 2], atol=1e-6)
