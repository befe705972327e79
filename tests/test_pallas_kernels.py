"""Pallas refine kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.ops import peaks as P

from util_synth import synth_example


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_refine_matches_xla(seed):
    _, heat, _ = synth_example(seed=seed, n_people=3)
    xla = P.nms(jnp.asarray(heat), factor=8, thresh=0.1)
    plk = P.nms(jnp.asarray(heat), factor=8, thresh=0.1,
                use_pallas=True, pallas_interpret=True)
    v = np.asarray(xla.valid)
    np.testing.assert_array_equal(v, np.asarray(plk.valid))
    for arr_x, arr_p in ((xla.xf, plk.xf), (xla.yf, plk.yf),
                         (xla.score, plk.score)):
        np.testing.assert_allclose(np.asarray(arr_x)[v],
                                   np.asarray(arr_p)[v], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(xla.x)[v],
                                  np.asarray(plk.x)[v])
    np.testing.assert_array_equal(np.asarray(xla.y)[v],
                                  np.asarray(plk.y)[v])


def test_pallas_refine_border_peaks():
    from rtpose_tpu.skeleton import NUM_PARTS
    h = w = 12
    heat = np.zeros((h, w, NUM_PARTS), dtype=np.float32)
    for part, (py, px) in enumerate([(0, 0), (0, 5), (5, 0), (11, 11)]):
        heat[py, px, part] = 1.0
    xla = P.nms(jnp.asarray(heat), factor=8, thresh=0.1)
    plk = P.nms(jnp.asarray(heat), factor=8, thresh=0.1,
                use_pallas=True, pallas_interpret=True)
    v = np.asarray(xla.valid)
    np.testing.assert_allclose(np.asarray(xla.xf)[v],
                               np.asarray(plk.xf)[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(xla.yf)[v],
                               np.asarray(plk.yf)[v], atol=1e-5)


def test_paf_sample_scores_matches_xla_paths():
    """Fused sampling kernel (interpret mode on CPU) vs the onehot and
    gather XLA formulations: scores and validity must agree exactly."""
    import jax.numpy as jnp

    from rtpose_tpu.ops import grouping as G
    from rtpose_tpu.ops.peaks import nms
    from util_synth import synth_example

    for seed in (0, 5, 9):
        _, heat, paf = synth_example(seed=seed, n_people=1 + seed % 5)
        peaks = nms(jnp.asarray(heat))
        outs = {}
        for mode in ("onehot", "gather", "pallas", "pallas_fused"):
            s, v = G.score_connections(peaks, jnp.asarray(paf),
                                       sampling=mode)
            outs[mode] = (np.asarray(s), np.asarray(v))
        # the two pallas variants share the accumulation order: bit-equal
        np.testing.assert_array_equal(outs["pallas"][0],
                                      outs["pallas_fused"][0])
        np.testing.assert_array_equal(outs["pallas"][1],
                                      outs["pallas_fused"][1])
        for mode in ("gather", "pallas", "pallas_fused"):
            sv, vv = outs[mode]
            s0, v0 = outs["onehot"]
            np.testing.assert_array_equal(vv, v0, err_msg=f"{mode} seed={seed}")
            np.testing.assert_allclose(
                np.where(v0, sv, 0), np.where(v0, s0, 0), atol=1e-6,
                err_msg=f"{mode} seed={seed}")
