"""Model zoo: every family initializes and produces correct output shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.models import get_model


@pytest.mark.parametrize("name,kwargs,stride,stages", [
    ("mobilenet", {"num_stages": 2}, 8, 2),
    ("hourglass", {"num_stacks": 2}, 4, 2),
    ("shufflenet_v2", {}, 8, 1),
    ("openpose_v2", {"num_paf_stages": 2, "num_heat_stages": 1}, 8, 2),
    ("atrous_resnet50", {}, 8, 1),
    ("atrous_cpm", {"num_stages": 2}, 8, 2),
    ("atrous_cpm_shared", {"num_stages": 2}, 8, 2),
])
def test_forward_shapes(name, kwargs, stride, stages):
    model = get_model(name, dtype=jnp.float32, **kwargs)
    size = 64
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.pafs.shape == (stages, 1, size // stride, size // stride, 38)
    assert out.heatmaps.shape == (stages, 1, size // stride,
                                  size // stride, 19)


def test_hourglass_train_mode_updates_batch_stats():
    model = get_model("hourglass", num_stacks=1, dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    # running stats actually change
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_shufflenet_channel_shuffle():
    from rtpose_tpu.models.shufflenet_v2 import channel_shuffle
    x = jnp.arange(8).reshape(1, 1, 1, 8).astype(jnp.float32)
    y = channel_shuffle(x, 2)
    # interleaves the two halves: [0,4,1,5,2,6,3,7]
    np.testing.assert_array_equal(np.asarray(y).ravel(),
                                  [0, 4, 1, 5, 2, 6, 3, 7])


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model("resnext9000")


def test_remat_same_output_and_grad():
    import jax
    from rtpose_tpu.models import get_model
    m0 = get_model("vgg19", num_stages=2, dtype=jnp.float32)
    m1 = get_model("vgg19", num_stages=2, dtype=jnp.float32, remat=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 48, 48, 3),
                    jnp.float32)
    p = m0.init(jax.random.PRNGKey(0), x)
    o0 = m0.apply(p, x)
    o1 = m1.apply(p, x)
    np.testing.assert_allclose(np.asarray(o0.pafs), np.asarray(o1.pafs),
                               atol=1e-6)

    def loss(params, model):
        out = model.apply(params, x)
        return jnp.sum(out.heatmaps ** 2)

    g0 = jax.grad(loss)(p, m0)
    g1 = jax.grad(loss)(p, m1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
