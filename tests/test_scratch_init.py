"""From-scratch training support: He re-init + gradient clipping.

The reference never trains from scratch — its N(0,0.01) init
(rtpose_vgg.py:200-206) is always paired with the ImageNet trunk
(use_vgg, :235-251).  models.common.he_reinit provides the from-scratch
init (validated end-to-end on hardware by scripts/hw_train_to_eval.py:
AP 0.49 on held-out synthetic scenes after 3000 steps, vs AP 0.0 and a
background-loss plateau with the reference init).
"""

import numpy as np

import jax
import jax.numpy as jnp

from rtpose_tpu.config import Config
from rtpose_tpu.models import get_model
from rtpose_tpu.models.common import he_reinit


def _init_params(size=56):
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, size, size, 3), jnp.float32))


def test_he_reinit_shapes_and_scales():
    params = _init_params()
    re = he_reinit(params, seed=3)
    assert (jax.tree_util.tree_structure(re)
            == jax.tree_util.tree_structure(params))

    flat = jax.tree_util.tree_flatten_with_path(re)[0]
    checked_hidden = checked_out = 0
    for path, leaf in flat:
        names = [getattr(p, "key", None) for p in path]
        orig = params
        for n in names:
            orig = orig[n]
        if names[-1] != "kernel":
            np.testing.assert_array_equal(leaf, orig)  # biases untouched
            continue
        if "out" in names:
            # stage output heads keep the reference N(0, 0.01) draw
            np.testing.assert_array_equal(leaf, orig)
            checked_out += 1
        else:
            fan_in = int(np.prod(leaf.shape[:-1]))
            expect = np.sqrt(2.0 / fan_in)
            got = float(jnp.std(leaf))
            assert 0.7 * expect < got < 1.3 * expect, (names, got, expect)
            assert leaf.shape == orig.shape and leaf.dtype == orig.dtype
            checked_hidden += 1
    assert checked_hidden >= 10 and checked_out >= 2


def test_he_reinit_activations_do_not_vanish():
    """The reference init decays activations ~3x per conv; the stage-input
    features must carry signal after the 12-conv trunk under He init."""
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out_ref = model.apply(params, x)
    out_he = model.apply(he_reinit(params, seed=3), x)
    # heads are N(0,0.01) in both; the difference is the feature magnitude
    # reaching them
    assert float(jnp.std(out_he.heatmap)) > 30 * float(jnp.std(out_ref.heatmap))


def test_clip_grad_norm_bounds_update():
    from rtpose_tpu.train.trainer import make_optimizer

    cfg = Config()
    cfg.train.clip_grad_norm = 1.0
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros((4,)), "b": jnp.zeros(())}
    opt_state = tx.init(params)
    huge = {"w": jnp.full((4,), 1e8), "b": jnp.asarray(1e8)}
    updates, _ = tx.update(huge, opt_state, params)
    gnorm = float(optax_global_norm(updates))
    # nesterov SGD emits (1 + momentum) * clipped_grad on the first step
    assert gnorm <= (1.0 + cfg.train.momentum) + 1e-5

    cfg.train.clip_grad_norm = 0.0
    tx_off = make_optimizer(cfg)
    updates_off, _ = tx_off.update(huge, tx_off.init(params), params)
    assert float(optax_global_norm(updates_off)) > 1e7


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x))
                        for x in jax.tree_util.tree_leaves(tree)))


def test_trainer_scratch_init_trains_past_reference_plateau():
    """3 tiny CPU steps: scratch init must cut the loss, reference init
    barely moves (the hardware signature, in miniature)."""
    def run(scheme):
        cfg = Config()
        cfg.model.num_stages = 1
        cfg.model.dtype = "float32"
        cfg.model.init_scheme = scheme
        cfg.dataset.image_size = 56
        cfg.train.lr = 0.1
        cfg.train.clip_grad_norm = 1.0
        cfg.train.freeze_base_epochs = 0
        from rtpose_tpu.train.trainer import Trainer
        tr = Trainer(cfg)
        rng = np.random.RandomState(0)
        img = rng.rand(8, 56, 56, 3).astype(np.float32)
        kps = np.zeros((8, 32, 18, 3), np.float32)
        kps[:, 0, :, :2] = rng.rand(8, 18, 2) * 40 + 8
        kps[:, 0, :, 2] = 2
        losses = []
        for _ in range(3):
            tr.state, logs = tr.train_step(
                tr.state, jnp.asarray(img), jnp.asarray(kps), None)
            losses.append(float(np.asarray(logs["loss"])))
        return losses

    scratch = run("scratch")
    assert scratch[-1] < 0.7 * scratch[0], scratch
    # ...and the reference init really does plateau (if init_scheme were
    # silently ignored and He applied everywhere, this half would fail)
    reference = run("reference")
    assert reference[-1] > 0.9 * reference[0], reference


def test_he_reinit_preserves_all_family_heads():
    """Regression: the head exemption must cover every family's head
    module names — hourglass (score_paf*/score_ht*) and shufflenet
    (paf/heatmap), not just the CPM families' 'out'."""
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.models import get_model
    from rtpose_tpu.models.common import he_reinit

    for name, head_probe in (("hourglass", ("score_paf0",)),
                             ("shufflenet_v2", ("paf",)),
                             ("vgg19", ("stages", "stage1_L1", "out"))):
        model = get_model(name, num_stages=1, dtype=jnp.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        re = he_reinit(v, seed=1)
        node_b = v["params"] if "params" in v else v
        node_a = re["params"] if "params" in re else re
        for p in head_probe:
            node_b, node_a = node_b[p], node_a[p]
        np.testing.assert_array_equal(np.asarray(node_a["kernel"]),
                                      np.asarray(node_b["kernel"]),
                                      err_msg=f"{name} head was redrawn")
