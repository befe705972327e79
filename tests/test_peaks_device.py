"""On-device NMS vs host oracle: peak sets, sub-pixel refinement, scores."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.ops import grouping_ref as G
from rtpose_tpu.ops import peaks as P
from rtpose_tpu.skeleton import NUM_PARTS

from util_synth import synth_example


def _device_peaks_as_sets(pk):
    """{part: set of (x, y, round(score, 4))}"""
    out = {}
    x = np.asarray(pk.x)
    y = np.asarray(pk.y)
    s = np.asarray(pk.score)
    v = np.asarray(pk.valid)
    for part in range(NUM_PARTS):
        out[part] = {(int(x[part, k]), int(y[part, k]))
                     for k in range(x.shape[1]) if v[part, k]}
    return out


def _host_peaks_as_sets(peaks_per_part):
    out = {}
    for part, arr in enumerate(peaks_per_part):
        out[part] = {(int(r[0]), int(r[1])) for r in arr}
    return out


@pytest.mark.parametrize("seed,n_people", [(0, 2), (1, 4), (2, 6)])
def test_device_nms_matches_host(seed, n_people):
    _, heat, paf = synth_example(seed=seed, n_people=n_people)
    host = G.nms(heat, upsamp_factor=8, thresh=0.1)
    dev = P.nms(jnp.asarray(heat), factor=8, thresh=0.1)
    hs = _host_peaks_as_sets(host)
    ds = _device_peaks_as_sets(dev)
    for part in range(NUM_PARTS):
        assert ds[part] == hs[part], f"part {part}: {ds[part]} vs {hs[part]}"


def test_device_refined_values_match_cv2():
    """Sub-pixel floats and scores must match the cv2 bicubic path closely."""
    _, heat, _ = synth_example(seed=3, n_people=3)
    host = G.nms(heat, upsamp_factor=8, thresh=0.1)
    dev = P.nms(jnp.asarray(heat), factor=8, thresh=0.1)
    xf = np.asarray(dev.xf)
    yf = np.asarray(dev.yf)
    sc = np.asarray(dev.score)
    v = np.asarray(dev.valid)
    n_checked = 0
    for part, arr in enumerate(host):
        for hx, hy, hscore, _ in arr:
            # find matching device peak
            cand = [(k, xf[part, k], yf[part, k], sc[part, k])
                    for k in range(xf.shape[1]) if v[part, k]]
            # two low-res peaks can refine to identical coords with
            # different patch scores -> match jointly on coords + score
            best = min(cand, key=lambda c: abs(c[1] - hx) + abs(c[2] - hy)
                       + abs(c[3] - hscore))
            assert abs(best[1] - hx) < 1e-3
            assert abs(best[2] - hy) < 1e-3
            assert abs(best[3] - hscore) < 1e-4
            n_checked += 1
    assert n_checked > 10


def test_border_peak_refinement():
    """Peaks at map borders use clipped patches like the reference."""
    h = w = 12
    heat = np.zeros((h, w, NUM_PARTS), dtype=np.float32)
    # peak exactly at a corner and at edges
    for part, (py, px) in enumerate([(0, 0), (0, 5), (5, 0), (11, 11),
                                     (1, 1), (10, 5)]):
        heat[py, px, part] = 1.0
        if 0 < py < h - 1:
            heat[py - 1, px, part] = 0.5
    host = G.nms(heat, upsamp_factor=8, thresh=0.1)
    dev = P.nms(jnp.asarray(heat), factor=8, thresh=0.1)
    hs = _host_peaks_as_sets(host)
    ds = _device_peaks_as_sets(dev)
    for part in range(6):
        assert ds[part] == hs[part]


def test_interp_matrix_matches_cv2_resize():
    import cv2
    rng = np.random.RandomState(0)
    for n in (3, 4, 5):
        patch = rng.rand(n, n).astype(np.float32)
        want = cv2.resize(patch, None, fx=8, fy=8,
                          interpolation=cv2.INTER_CUBIC)
        mats = P._interp_matrices(8)
        M = mats[n - 3][:n * 8, :n]
        got = M @ patch @ M.T
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_filt_refine_matches_reference_formula():
    """gaussian_filt=True: sigma=3 smoothing of the upsampled refine patch
    (reference paf_to_pose.py:106-141 with bool_gaussian_filt=True —
    default-off upstream and here).  Oracle: cv2 INTER_CUBIC + scipy
    gaussian_filter, argmax and score from the FILTERED map."""
    import cv2
    from scipy.ndimage import gaussian_filter

    _, heat, _ = synth_example(seed=5, n_people=3)
    H, W, _ = heat.shape
    f = 8
    dev = P.nms(jnp.asarray(heat), factor=f, thresh=0.1,
                gaussian_filt=True)
    xf = np.asarray(dev.xf)
    yf = np.asarray(dev.yf)
    sc = np.asarray(dev.score)
    v = np.asarray(dev.valid)
    n_checked = 0
    host = G.nms(heat, upsamp_factor=1, thresh=0.1)  # coarse peaks, f=1
    for part, arr in enumerate(host):
        for hx0, hy0, _s, _ in arr:
            px0, py0 = int(round(hx0)), int(round(hy0))
            x_min, y_min = max(0, px0 - 2), max(0, py0 - 2)
            x_max, y_max = min(W - 1, px0 + 2), min(H - 1, py0 + 2)
            patch = heat[y_min:y_max + 1, x_min:x_max + 1, part]
            up = cv2.resize(patch, None, fx=f, fy=f,
                            interpolation=cv2.INTER_CUBIC)
            up = gaussian_filter(up, sigma=3)
            loc = np.unravel_index(up.argmax(), up.shape)       # (y, x)
            cy = (py0 - y_min + 0.5) * f - 0.5
            cx = (px0 - x_min + 0.5) * f - 0.5
            ry = (py0 + 0.5) * f - 0.5 + (loc[0] - cy)
            rx = (px0 + 0.5) * f - 0.5 + (loc[1] - cx)
            score = up[loc]
            cand = [(xf[part, k], yf[part, k], sc[part, k])
                    for k in range(xf.shape[1]) if v[part, k]]
            best = min(cand, key=lambda c: abs(c[0] - rx) + abs(c[1] - ry))
            assert abs(best[0] - rx) < 1e-3, (part, best, rx, ry)
            assert abs(best[1] - ry) < 1e-3, (part, best, rx, ry)
            assert abs(best[2] - score) < 1e-4, (part, best, score)
            n_checked += 1
    assert n_checked > 10
