"""Fused (single-dispatch) multi-scale TTA vs the host cv2 path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.infer.pipeline import PosePipeline
from rtpose_tpu.models import get_model
from rtpose_tpu.ops.resize import resize_bicubic


@pytest.mark.parametrize("src,dst", [((23, 29), (46, 58)),
                                     ((69, 46), (46, 31)),
                                     ((10, 10), (17, 13))])
def test_resize_bicubic_matches_cv2(src, dst):
    import cv2
    rng = np.random.RandomState(0)
    maps = rng.rand(src[0], src[1], 7).astype(np.float32)
    want = cv2.resize(maps, (dst[1], dst[0]),
                      interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_bicubic(jnp.asarray(maps), dst))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_multiscale_matches_host_path():
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    img = (np.random.RandomState(0).rand(90, 70, 3) * 255).astype(np.uint8)
    scales = (0.75, 1.0, 1.25)
    p_host, h_host, paf_host, m_host = pipe.run_multiscale_host(img, scales)
    p_dev, h_dev, paf_dev, m_dev = pipe.run_multiscale(img, scales)
    assert m_dev["upsampled"] == m_host["upsampled"]
    np.testing.assert_allclose(h_dev, h_host, atol=1e-5)
    np.testing.assert_allclose(paf_dev, paf_host, atol=1e-5)
    assert len(p_dev) == len(p_host)
    for a, b in zip(p_dev, p_host):
        assert set(a["parts"]) == set(b["parts"])
        assert a["score"] == pytest.approx(b["score"], abs=1e-5)


def test_fused_multiscale_single_dispatch():
    """The fused path must not dispatch per scale: its jitted fn is entered
    exactly once per call."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    img = (np.random.RandomState(1).rand(90, 70, 3) * 255).astype(np.uint8)
    calls = []
    orig = pipe._multiscale_fn

    def counting(n, hw):
        fn = orig(n, hw)

        def wrapper(params, *ims):
            calls.append(len(ims))
            return fn(params, *ims)
        return wrapper

    pipe._multiscale_fn = counting
    pipe.run_multiscale(img, scales=(0.5, 1.0, 1.5))
    assert calls == [3]


def test_batched_multiscale_matches_single_image():
    """run_multiscale_batch == per-image run_multiscale on every frame
    (same scales): identical averaged maps, people and metas — the
    round-5 composition of fused multi-scale TTA with batched eval."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    rng = np.random.RandomState(2)
    frames = [(rng.rand(90, 70, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    scales = (0.75, 1.0, 1.25)

    people_b, metas_b = pipe.run_multiscale_batch(frames, scales)
    assert len(people_b) == len(metas_b) == len(frames)
    for img, people, meta in zip(frames, people_b, metas_b):
        p_one, _, _, m_one = pipe.run_multiscale(img, scales)
        assert meta["upsampled"] == m_one["upsampled"]
        assert meta["scale"] == m_one["scale"]
        assert len(people) == len(p_one)
        for a, b in zip(people, p_one):
            assert set(a["parts"]) == set(b["parts"])
            for part in a["parts"]:
                np.testing.assert_allclose(a["parts"][part],
                                           b["parts"][part], atol=1e-5)
            assert a["score"] == pytest.approx(b["score"], abs=1e-5)


def test_batched_multiscale_mixed_shapes():
    """Frames with different per-scale padded shapes fall into per-shape
    sub-batches and results come back in input order."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    rng = np.random.RandomState(3)
    frames = [(rng.rand(90, 70, 3) * 255).astype(np.uint8),
              (rng.rand(60, 100, 3) * 255).astype(np.uint8),
              (rng.rand(90, 70, 3) * 255).astype(np.uint8)]
    scales = (1.0, 1.25)
    people_b, metas_b = pipe.run_multiscale_batch(frames, scales)
    assert len(people_b) == 3
    for img, people, meta in zip(frames, people_b, metas_b):
        p_one, _, _, m_one = pipe.run_multiscale(img, scales)
        assert meta["upsampled"] == m_one["upsampled"]
        assert len(people) == len(p_one)


def test_batched_multiscale_pixel_budget_split(monkeypatch):
    """HBM guard: a same-shape chunk whose B * max-scale pixels exceeds
    MS_PIXEL_BUDGET splits into capped sub-batches (v5e OOM regression:
    a padded 16-frame tail bucket at max-scale 576x1920 compiled to a
    16.9 GiB program) — and results still come back in input order,
    identical to the unsplit path."""
    from rtpose_tpu.infer import pipeline as plmod
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False)
    rng = np.random.RandomState(7)
    frames = [(rng.rand(90, 70, 3) * 255).astype(np.uint8)
              for _ in range(5)]
    scales = (0.75, 1.0)
    people_ref, metas_ref = pipe.run_multiscale_batch(frames, scales)

    ims, _, _ = pipe._prep_scales(frames[0], scales)
    max_px = max(im.shape[0] * im.shape[1] for im in ims)
    # budget is expressed for bf16; this test model is f32, so the cap is
    # MS_PIXEL_BUDGET // 2 // max_px — set it so exactly 2 frames fit
    monkeypatch.setattr(plmod, "MS_PIXEL_BUDGET", 4 * max_px)
    assert pipe.ms_chunk_cap(max_px) == 2
    ticket = pipe.run_multiscale_batch_submit(frames, scales)
    assert ticket[0] == "multi"
    subs = ticket[2]
    assert [len(idxs) for idxs, _ in subs] == [2, 2, 1]
    people, metas = pipe.run_batch_collect(ticket)
    assert len(people) == len(frames)
    for got, want, mg, mw in zip(people, people_ref, metas, metas_ref):
        assert mg["upsampled"] == mw["upsampled"]
        assert len(got) == len(want)
        for a, b in zip(got, want):
            for part in a["parts"]:
                np.testing.assert_allclose(a["parts"][part],
                                           b["parts"][part], atol=1e-5)


def test_multiscale_unaffected_by_device_resize():
    """Regression: with device_resize on, the maps-only infer fn used by
    the multi-scale paths must NOT re-resize the host-prepped per-scale
    images back to input_size (which silently collapsed the TTA to
    single-scale).  Multi-scale maps must be identical with and without
    device_resize."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    img = (np.random.RandomState(1).rand(90, 70, 3) * 255).astype(np.uint8)
    scales = (0.75, 1.0, 1.25)
    plain = PosePipeline(model, params, input_size=56, flip=False)
    resz = PosePipeline(model, params, input_size=56, flip=False,
                        device_resize=True)
    _, h0, p0, _ = plain.run_multiscale(img, scales)
    _, h1, p1, _ = resz.run_multiscale(img, scales)
    np.testing.assert_array_equal(h1, h0)
    np.testing.assert_array_equal(p1, p0)
    # and the per-scale maps genuinely differ from single-scale (TTA is
    # doing something): compare vs the 1.0-only result
    _, h_single, _, _ = resz.run_multiscale(img, (1.0,))
    assert not np.array_equal(h1, h_single)
