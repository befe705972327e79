"""Round-2 parity closures: hue jitter, preprocessing inverses,
keypoint_sets_inverse (VERDICT round-1 'Missing' items 3-5)."""

import colorsys

import numpy as np
import PIL.Image
import pytest

from rtpose_tpu.data import transforms as T
from rtpose_tpu.infer import preprocess as PP


# ---- hue jitter ------------------------------------------------------------

def test_adjust_hue_zero_is_identity():
    rng = np.random.RandomState(0)
    img = PIL.Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8))
    out = T.adjust_hue(img, 0.0)
    # HSV roundtrip at zero shift: lossless for the hue channel, the
    # RGB->HSV->RGB conversion itself is PIL-exact
    np.testing.assert_array_equal(np.asarray(out), np.asarray(
        PIL.Image.merge("HSV", img.convert("HSV").split()).convert("RGB")))


@pytest.mark.parametrize("factor", [-0.5, -0.25, 0.1, 0.25, 0.5])
def test_adjust_hue_matches_colorsys(factor):
    """The uint8-wraparound hue shift against the float colorsys formula
    (reference ColorJitter hue semantics, transforms.py:53-58)."""
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (180, 120, 60)]
    img = PIL.Image.fromarray(
        np.array(colors, np.uint8).reshape(1, len(colors), 3))
    out = np.asarray(T.adjust_hue(img, factor)).reshape(-1, 3)
    for (r, g, b), got in zip(colors, out):
        h, s, v = colorsys.rgb_to_hsv(r / 255, g / 255, b / 255)
        want = np.array(colorsys.hsv_to_rgb((h + factor) % 1.0, s, v)) * 255
        # PIL HSV is uint8-quantized (256 hue bins): a few units of slack
        assert np.abs(got - want).max() < 16, (got, want)


def test_colorjitter_applies_hue():
    rng = np.random.default_rng(0)
    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:, :] = (200, 40, 40)
    sample = T.Sample.new(PIL.Image.fromarray(arr), np.zeros((1, 17, 3)))
    # strength 0 isolates the hue component
    out = T.ColorJitter(strength=0.0, hue=0.4)(sample, rng)
    assert not np.array_equal(np.asarray(out.image), arr)
    out0 = T.ColorJitter(strength=0.0, hue=0.0)(sample, rng)
    np.testing.assert_array_equal(np.asarray(out0.image), arr)


# ---- preprocessing inverses -------------------------------------------------

@pytest.mark.parametrize("mode", ["rtpose", "vgg", "inception", "ssd"])
def test_preprocess_inverse_roundtrip(mode):
    rng = np.random.RandomState(1)
    img = (rng.rand(12, 10, 3) * 255).astype(np.uint8)
    fwd = PP.preprocess(img.astype(np.float32), mode)
    back = PP.inverse_preprocess(fwd, mode)
    np.testing.assert_allclose(back.astype(np.float32),
                               img.astype(np.float32), atol=1.0)


def test_inverse_inception_matches_reference_formula():
    # reference preprocessing.py:67-75: (chw + 1) * 128, RGB->BGR, uint8
    rng = np.random.RandomState(2)
    x = (rng.rand(6, 5, 3).astype(np.float32) * 2) - 1
    got = PP.inverse_inception_preprocess(x)
    want = ((x + 1.0) * 128.0)[:, :, ::-1].astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_inverse_preprocess_unknown_mode():
    with pytest.raises(ValueError, match="unknown"):
        PP.inverse_preprocess(np.zeros((2, 2, 3)), "bogus")


# ---- keypoint_sets_inverse ---------------------------------------------------

def _sample(seed=0, n=3, w=120, h=90):
    rng = np.random.RandomState(seed)
    img = PIL.Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    kps = np.zeros((n, 17, 3))
    kps[:, :, 0] = rng.uniform(30, 60, (n, 17))
    kps[:, :, 1] = rng.uniform(25, 55, (n, 17))
    kps[:, :, 2] = 2
    return T.Sample.new(img, kps)


@pytest.mark.parametrize("with_flip", [False, True])
def test_keypoint_sets_inverse_roundtrip(with_flip):
    """Forward-augment keypoints, then invert through the meta: originals
    come back (reference Preprocess.keypoint_sets_inverse,
    transforms.py:74-90)."""
    rng = np.random.default_rng(3)
    sample = _sample()
    orig = sample.keypoints.copy()
    # flip FIRST, like the reference training pipeline (train_VGG19.py:
    # 124-130) — the inverse formula un-offsets/un-scales before un-flipping
    steps = ([T.HFlip()] if with_flip else []) + \
        [T.RescaleAbsolute(72), T.Crop(64), T.CenterPad(64)]
    out = T.Compose(steps)(sample, rng)
    back = T.keypoint_sets_inverse(out.keypoints, out.meta)
    np.testing.assert_allclose(back[:, :, :2], orig[:, :, :2], atol=1e-6)


def test_keypoint_sets_inverse_formula_values():
    """Hand-check the exact reference arithmetic on a fixed meta."""
    kps = np.zeros((1, 17, 3))
    kps[0, 0] = (10.0, 20.0, 2)
    meta = {"offset": np.array([3.0, -2.0]), "scale": np.array([0.5, 2.0]),
            "hflip": False, "width_height": np.array([100, 80])}
    out = T.keypoint_sets_inverse(kps, meta)
    assert out[0, 0, 0] == pytest.approx((10.0 + 3.0 + 0.5) / 0.5 - 0.5)
    assert out[0, 0, 1] == pytest.approx((20.0 - 2.0 + 0.5) / 2.0 - 0.5)
