"""Inference pipeline: flip-TTA algebra + end-to-end smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.infer.pipeline import PosePipeline, average_flip
from rtpose_tpu.infer.preprocess import crop_with_factor
from rtpose_tpu.models import get_model


def test_average_flip_is_identity_for_equivariant_predictions():
    """If the flipped-image prediction equals the mirror+swap of the normal
    prediction (a perfectly equivariant model), averaging must return the
    normal prediction unchanged."""
    rng = np.random.RandomState(0)
    heat = rng.rand(12, 16, 19).astype(np.float32)
    paf = rng.rand(12, 16, 38).astype(np.float32)
    from rtpose_tpu.skeleton import FLIP_HEAT, FLIP_PAF, NUM_LIMBS
    neg = np.ones(2 * NUM_LIMBS, np.float32)
    neg[0::2] = -1
    heat_f = heat[:, ::-1, :][:, :, np.array(FLIP_HEAT)]
    paf_f = (paf * neg)[:, ::-1, :][:, :, np.array(FLIP_PAF)]
    h_avg, p_avg = average_flip(jnp.asarray(heat), jnp.asarray(heat_f),
                                jnp.asarray(paf), jnp.asarray(paf_f))
    np.testing.assert_allclose(np.asarray(h_avg), heat, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_avg), paf, atol=1e-6)


def test_crop_with_factor():
    img = np.zeros((100, 150, 3), dtype=np.uint8)
    out, scale, real_shape = crop_with_factor(img, 64, factor=8)
    assert scale == 64 / 100
    assert out.shape[0] % 8 == 0 and out.shape[1] % 8 == 0
    assert out.shape[0] >= real_shape[0] and out.shape[1] >= real_shape[1]


@pytest.mark.parametrize("flip", [False, True])
def test_pipeline_end_to_end_smoke(flip):
    model = get_model("vgg19", num_stages=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pipe = PosePipeline(model, params, input_size=56, flip=flip,
                        preprocess_mode="vgg")
    img = (np.random.RandomState(0).rand(80, 60, 3) * 255).astype(np.uint8)
    people, heat, paf, meta = pipe.run(img)
    assert heat.shape[-1] == 19
    assert paf.shape[-1] == 38
    assert isinstance(people, list)
    # map normalized coords to original pixels
    pix = pipe.keypoints_pixels(people, meta)
    assert isinstance(pix, list)


def test_hourglass_pipeline_stride4_pad64():
    """Regression: serving a stride-4 hourglass requires downsample=4 for
    the coordinate math AND pad_factor=64 so its depth-4 skip-adds line up
    on non-square frames (the demos previously hardcoded 8/8, drawing
    skeletons at 2x scale or failing to trace)."""
    from rtpose_tpu.models import get_model

    model = get_model("hourglass", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    pipe = PosePipeline(model, params, input_size=128, flip=False,
                        downsample=4, pad_factor=64)
    img = (np.random.RandomState(0).rand(130, 170, 3) * 255) \
        .astype(np.uint8)
    people, heat, paf, meta = pipe.run(img)
    ph, pw = meta["padded_shape"][:2]
    assert ph % 64 == 0 and pw % 64 == 0
    # upsampled size is heat grid x the TRUE output stride
    assert meta["upsampled"] == (heat.shape[0] * 4, heat.shape[1] * 4)
    assert heat.shape[0] == ph // 4 and heat.shape[1] == pw // 4
