"""Pixel normalization modes: host formulas + device equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.infer import preprocess as P


@pytest.fixture
def img():
    return (np.random.RandomState(0).rand(16, 20, 3) * 255).astype(np.uint8)


def test_rtpose_mode(img):
    out = P.rtpose_preprocess(img)
    np.testing.assert_allclose(out, img.astype(np.float32) / 256 - 0.5)
    # inverse round-trip
    back = P.inverse_rtpose_preprocess(out)
    np.testing.assert_array_equal(back, img)


def test_vgg_mode(img):
    out = P.vgg_preprocess(img)
    rgb = img[:, :, ::-1].astype(np.float32) / 255
    expect = (rgb - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_inception_mode(img):
    out = P.inception_preprocess(img)
    np.testing.assert_allclose(
        out, img[:, :, ::-1].astype(np.float32) / 128 - 1)


def test_ssd_mode(img):
    out = P.ssd_preprocess(img)
    rgb = img[:, :, ::-1].astype(np.float32)
    rgb = rgb - np.array([104.0, 117.0, 123.0], np.float32)
    np.testing.assert_allclose(out, rgb[:, :, ::-1])


@pytest.mark.parametrize("mode", ["rtpose", "vgg", "inception", "ssd"])
def test_device_normalize_matches_host(img, mode):
    host = P.preprocess(img, mode)
    dev = np.asarray(P.normalize_device(jnp.asarray(img), mode))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_dispatcher_unknown_mode_passthrough(img):
    out = P.preprocess(img, "nope")
    np.testing.assert_array_equal(out, img)


def test_pad_to_bucket():
    img = np.ones((100, 130, 3), np.uint8)
    out, (h, w) = P.pad_to_bucket(img, 64)
    assert out.shape == (128, 192, 3)
    assert (h, w) == (100, 130)
    assert out[:100, :130].all() and not out[100:].any()


def test_letterbox():
    img = np.full((50, 100, 3), 7, np.uint8)
    out, scale, (dx, dy) = P.letterbox(img, 64)
    assert out.shape == (64, 64, 3)
    assert scale == 64 / 100
    assert dx == 0 and dy == (64 - 32) // 2
    assert (out[dy:dy + 32, :] == 7).all()
    assert (out[:dy] == 128).all()
