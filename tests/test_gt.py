"""GT synthesis: golden values + host/device equivalence."""

import numpy as np
import pytest

from rtpose_tpu.data import gt


def _person(parts):
    """parts: {part_idx: (x, y)} -> (18, 3) with v=2"""
    kp = np.zeros((18, 3))
    for i, (x, y) in parts.items():
        kp[i] = (x, y, 2)
    return kp


def test_gaussian_peak_value_and_offset():
    heat = np.zeros((46, 46))
    out = gt.put_gaussian_map((100.0, 60.0), heat, 7.0, 46, 46, 8)
    # grid sample (gx, gy) at pixel (gx*8+3.5, gy*8+3.5); nearest to
    # (100, 60) is gx=12 (99.5), gy=7 (59.5)
    iy, ix = np.unravel_index(out.argmax(), out.shape)
    assert (ix, iy) == (12, 7)
    d2 = (99.5 - 100.0) ** 2 + (59.5 - 60.0) ** 2
    assert out[iy, ix] == pytest.approx(np.exp(-d2 / (2 * 49.0)))


def test_gaussian_clamps_at_one():
    heat = np.zeros((46, 46))
    heat = gt.put_gaussian_map((100.0, 60.0), heat, 7.0, 46, 46, 8)
    heat = gt.put_gaussian_map((101.0, 61.0), heat, 7.0, 46, 46, 8)
    assert heat.max() == pytest.approx(1.0)


def test_gaussian_support_cutoff():
    heat = gt.put_gaussian_map((180.0, 180.0), np.zeros((46, 46)), 7.0,
                               46, 46, 8)
    # support radius: exponent <= ln(100) -> d <= sigma*sqrt(2 ln 100)
    r = 7.0 * np.sqrt(2 * gt.LN100)
    yy, xx = np.mgrid[0:46, 0:46]
    px = xx * 8 + 3.5
    py = yy * 8 + 3.5
    d = np.sqrt((px - 180.0) ** 2 + (py - 180.0) ** 2)
    assert (out_zero := heat[d > r + 1e-6]).max() == 0.0
    assert heat[d < r - 1e-6].min() > 0.0


def test_vec_map_unit_vectors_and_average():
    accum = np.zeros((46, 46, 2))
    count = np.zeros((46, 46), dtype=np.uint32)
    accum, count = gt.put_vec_map((80, 100), (240, 100), accum, count,
                                  46, 46, 8)
    # horizontal limb -> unit vector (1, 0) inside the band
    on = accum[12, 25]       # pixel y=100/8=12.5 -> grid 12, x=200/8=25
    assert on[0] == pytest.approx(1.0)
    assert on[1] == pytest.approx(0.0)
    # overlapping opposite limb averages to 0
    accum, count = gt.put_vec_map((240, 100), (80, 100), accum, count,
                                  46, 46, 8)
    assert accum[12, 25][0] == pytest.approx(0.0)


def test_ground_truth_shapes_and_background():
    kps = np.stack([_person({0: (100, 50), 1: (100, 90), 2: (80, 90),
                             8: (90, 180)})])
    heat, paf = gt.ground_truth_maps(kps)
    assert heat.shape == (46, 46, 19)
    assert paf.shape == (46, 46, 38)
    np.testing.assert_allclose(
        heat[:, :, 18], np.maximum(1 - heat[:, :, :18].max(axis=2), 0))
    # limb 0 (neck 1 -> right_hip 8) has nonzero PAF
    assert np.abs(paf[:, :, 0:2]).max() > 0.9


def test_invisible_parts_are_skipped():
    kp = _person({0: (100, 50)})
    kp[5] = (120, 60, 0.0)   # not visible
    heat, paf = gt.ground_truth_maps(kp[None])
    assert heat[:, :, 5].max() == 0.0


@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 3), (2, 6)])
def test_device_matches_host(seed, n_people):
    rng = np.random.RandomState(seed)
    kps = np.zeros((n_people, 18, 3))
    kps[:, :, 0] = rng.uniform(-10, 380, (n_people, 18))
    kps[:, :, 1] = rng.uniform(-10, 380, (n_people, 18))
    kps[:, :, 2] = rng.choice([0, 1, 2], (n_people, 18), p=[.2, .2, .6])
    # mimic remove_illegal_joint (reference datasets.py:216-225)
    bad = ((kps[:, :, 0] < 0) | (kps[:, :, 0] >= 368)
           | (kps[:, :, 1] < 0) | (kps[:, :, 1] >= 368))
    kps[bad] = (-1, -1, 0)

    heat_h, paf_h = gt.ground_truth_maps(kps)
    heat_d, paf_d = gt.ground_truth_maps_device(kps)
    np.testing.assert_allclose(np.asarray(heat_d), heat_h, atol=2e-6)
    np.testing.assert_allclose(np.asarray(paf_d), paf_h, atol=2e-6)


def test_batched_device_gt():
    rng = np.random.RandomState(3)
    kps = rng.uniform(50, 300, (4, 5, 18, 3))
    kps[:, :, :, 2] = 2
    heat, paf = gt.ground_truth_maps_batch(kps)
    assert heat.shape == (4, 46, 46, 19)
    assert paf.shape == (4, 46, 46, 38)


@pytest.mark.parametrize("seed,n_people", [(0, 0), (1, 3), (2, 8)])
def test_pallas_gt_matches_host_and_xla(seed, n_people):
    """Fused pallas kernel (interpret mode on CPU) == host oracle == XLA
    scan path, including empty scenes and invalid rows mid-padding."""
    from rtpose_tpu.ops.pallas_gt import gt_maps_pallas

    rng = np.random.RandomState(seed)
    kps = np.zeros((2, 16, 18, 3), np.float32)
    for b in range(2):
        for p in range(n_people):
            kps[b, p, :, 0] = rng.uniform(0, 367, 18)
            kps[b, p, :, 1] = rng.uniform(0, 367, 18)
            kps[b, p, :, 2] = rng.choice([0, 2], 18, p=[.3, .7])
    if n_people >= 3:
        kps[0, 1] = 0.0      # all-invisible person inside the padding

    heat_p, paf_p = gt_maps_pallas(kps, grid_y=46, grid_x=46, stride=8,
                                   sigma=7.0, interpret=True)
    heat_x, paf_x = gt.ground_truth_maps_batch(kps, backend="xla")
    np.testing.assert_allclose(np.asarray(heat_p), np.asarray(heat_x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(paf_p), np.asarray(paf_x),
                               atol=1e-6)
    for b in range(2):
        heat_h, paf_h = gt.ground_truth_maps(kps[b])
        np.testing.assert_allclose(np.asarray(heat_p)[b], heat_h, atol=2e-6)
        np.testing.assert_allclose(np.asarray(paf_p)[b], paf_h, atol=2e-6)


def test_pallas_gt_nonsquare_grid():
    from rtpose_tpu.ops.pallas_gt import gt_maps_pallas

    rng = np.random.RandomState(7)
    kps = np.zeros((1, 4, 18, 3), np.float32)
    kps[0, 0, :, 0] = rng.uniform(0, 300, 18)
    kps[0, 0, :, 1] = rng.uniform(0, 200, 18)
    kps[0, 0, :, 2] = 2.0
    heat_p, paf_p = gt_maps_pallas(kps, grid_y=28, grid_x=40, stride=8,
                                   sigma=7.0, interpret=True)
    assert heat_p.shape == (1, 28, 40, 19)
    fn = gt._get_device_fn()
    heat_x, paf_x = fn(kps[0], grid_y=28, grid_x=40, stride=8, sigma=7.0,
                       limb_width=1.0)
    np.testing.assert_allclose(np.asarray(heat_p)[0], np.asarray(heat_x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(paf_p)[0], np.asarray(paf_x),
                               atol=1e-6)
