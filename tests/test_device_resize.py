"""Device-side frame resize (ship raw uint8, scale+pad in-graph).

Round-2 verdict: serving is transfer-bound and `_prep` shipped the
ENLARGED frame (240x320 -> ~368x496 = 2.3x the source bytes).  The
device_resize pipeline mode ships the raw frame and runs
crop_with_factor's scale+pad inside the jitted program via a
cv2-INTER_LINEAR-parity bilinear (ops/resize.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.infer.pipeline import PosePipeline
from rtpose_tpu.models import get_model
from rtpose_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("src,dst", [((24, 30), (46, 57)),
                                     ((46, 57), (24, 30)),
                                     ((17, 23), (29, 31))])
def test_resize_bilinear_matches_cv2_float(src, dst):
    """Exact parity with cv2.resize INTER_LINEAR on float inputs (the
    interpolation crop_with_factor uses), up/down/non-integer ratios."""
    import cv2
    rng = np.random.RandomState(0)
    maps = rng.rand(*src, 3).astype(np.float32)
    ref = cv2.resize(maps, (dst[1], dst[0]),
                     interpolation=cv2.INTER_LINEAR)
    out = np.asarray(resize_bilinear(jnp.asarray(maps), dst))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def _pipes():
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    host = PosePipeline(model, params, input_size=56, flip=False)
    dev = PosePipeline(model, params, input_size=56, flip=False,
                       device_resize=True)
    return host, dev


def test_prep_shape_arithmetic_matches_crop_with_factor():
    """device_resize's host-side shape math (scale, real/padded shapes)
    must agree with what cv2-backed crop_with_factor actually produces —
    including cvRound's round-half-to-even dsize convention."""
    host, dev = _pipes()
    rng = np.random.RandomState(0)
    for _ in range(40):
        h = int(rng.randint(20, 200))
        w = int(rng.randint(20, 200))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        _, mh = host._prep(img)
        raw, md = dev._prep(img)
        assert raw.shape == img.shape          # raw frame shipped as-is
        assert md["scale"] == pytest.approx(mh["scale"])
        assert tuple(md["real_shape"][:2]) == tuple(mh["real_shape"][:2])
        assert tuple(md["padded_shape"][:2]) == tuple(mh["padded_shape"][:2])


def test_device_resize_matches_host_path():
    """Same frame through both modes: identical metas, near-identical maps
    (the only difference is the host path's uint8 rounding after resize,
    <=0.5/255 per input pixel)."""
    host, dev = _pipes()
    rng = np.random.RandomState(2)
    img = (rng.rand(40, 30, 3) * 255).astype(np.uint8)   # upscaled to 56
    ph, hh, fh, mh = host.run(img)
    pd, hd, fd, md = dev.run(img)
    assert mh["upsampled"] == md["upsampled"]
    assert mh["scale"] == pytest.approx(md["scale"])
    assert hh.shape == hd.shape and fh.shape == fd.shape
    np.testing.assert_allclose(hd, hh, atol=0.02)
    np.testing.assert_allclose(fd, fh, atol=0.02)


def test_device_resize_batch_path():
    """run_batch groups raw same-resolution frames and decodes on device;
    results line up with per-frame run()."""
    _, dev = _pipes()
    rng = np.random.RandomState(3)
    frames = [(rng.rand(40, 30, 3) * 255).astype(np.uint8)
              for _ in range(2)]
    people_lists, metas = dev.run_batch(frames)
    assert len(people_lists) == 2
    for frame, people, meta in zip(frames, people_lists, metas):
        single, _, _, smeta = dev.run(frame)
        assert meta["upsampled"] == smeta["upsampled"]
        assert len(people) == len(single)


def test_auto_mode_ships_raw_only_when_upscaling():
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=False,
                        device_resize="auto")
    rng = np.random.RandomState(4)
    small = (rng.rand(40, 30, 3) * 255).astype(np.uint8)
    big = (rng.rand(120, 90, 3) * 255).astype(np.uint8)
    raw, _ = pipe._prep(small)
    assert raw.shape == small.shape            # upscale: raw ship
    prepped, meta = pipe._prep(big)
    assert min(prepped.shape[:2]) >= 56        # downscale: host resize+pad
    assert prepped.shape[0] < big.shape[0]
    # the device program treats the host-prepped frame as identity resize:
    # results must match the plain host pipeline
    host = PosePipeline(model, params, input_size=56, flip=False)
    ph, hh, _, mh = host.run(big)
    pa, ha, _, ma = pipe.run(big)
    assert mh["upsampled"] == ma["upsampled"]
    np.testing.assert_allclose(ha, hh, atol=1e-5)


def test_auto_mode_nondivisible_input_size_ships_raw():
    """Regression: with input_size % downsample != 0 the downscale
    shortcut is invalid — the host pad raises the min side above
    input_size, so the in-graph program would re-resize the already
    prepped frame while meta still described the host geometry.  The
    auto path must ship raw instead, and end-to-end results must match
    the plain host pipeline."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=60, flip=False,
                        device_resize="auto")
    rng = np.random.RandomState(5)
    big = (rng.rand(120, 90, 3) * 255).astype(np.uint8)   # downscale regime
    raw, meta = pipe._prep(big)
    assert raw.shape == big.shape                         # raw ship
    host = PosePipeline(model, params, input_size=60, flip=False)
    ph, hh, fh, mh = host.run(big)
    pa, ha, fa, ma = pipe.run(big)
    assert mh["upsampled"] == ma["upsampled"]
    assert mh["scale"] == pytest.approx(ma["scale"])
    np.testing.assert_allclose(ha, hh, atol=0.02)
    np.testing.assert_allclose(fa, fh, atol=0.02)
