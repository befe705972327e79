"""Training stack: sharded train step, freeze mask, plateau, checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.config import Config
from rtpose_tpu.train.schedule import ReduceLROnPlateau, freeze_mask
from rtpose_tpu.train.trainer import Trainer


def _tiny_cfg(tmp=None):
    cfg = Config()
    cfg.model.num_stages = 1
    cfg.model.dtype = "float32"
    cfg.dataset.image_size = 64
    cfg.train.lr = 0.05
    cfg.train.freeze_base_epochs = 1
    cfg.train.print_freq = 100
    if tmp:
        cfg.train.checkpoint_dir = str(tmp)
    return cfg


def _fake_batch(rng, batch=8, size=64):
    images = rng.rand(batch, size, size, 3).astype(np.float32)
    kps = np.zeros((batch, 4, 18, 3), np.float32)
    kps[:, 0, :, 0] = rng.uniform(5, size - 5, (batch, 18))
    kps[:, 0, :, 1] = rng.uniform(5, size - 5, (batch, 18))
    kps[:, 0, :, 2] = 2
    return {"image": images, "keypoints": kps}


def test_sharded_train_step_decreases_loss():
    assert jax.device_count() == 8, "virtual 8-device CPU mesh expected"
    cfg = _tiny_cfg()
    tr = Trainer(cfg)
    rng = np.random.RandomState(0)
    batch = _fake_batch(rng)
    losses = []
    for _ in range(6):
        losses.append(tr.run_epoch([batch], train=True)["loss"])
    assert losses[-1] < losses[0]


def test_freeze_mask_blocks_backbone_updates():
    cfg = _tiny_cfg()
    tr = Trainer(cfg)   # freeze_base_epochs=1 -> backbone frozen at start
    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    batch = _fake_batch(np.random.RandomState(1))
    tr.run_epoch([batch], train=True)
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    root0 = p0["params"] if "params" in p0 else p0
    root1 = p1["params"] if "params" in p1 else p1
    # frozen conv unchanged
    np.testing.assert_array_equal(root0["backbone"]["conv1_1"]["kernel"],
                                  root1["backbone"]["conv1_1"]["kernel"])
    # CPM neck + heads updated
    assert not np.array_equal(root0["backbone"]["conv4_3_CPM"]["kernel"],
                              root1["backbone"]["conv4_3_CPM"]["kernel"])
    # release phase: mask flips to 1 and updates flow (grad magnitude at
    # random init is ~1e-12 through the deep trunk, so amplify lr to make
    # the weight delta representable in fp32)
    tr.epoch = cfg.train.freeze_base_epochs
    tr.maybe_release_backbone()
    m = jax.tree_util.tree_map(np.asarray, tr.state.grad_mask)
    mroot = m["params"] if "params" in m else m
    assert mroot["backbone"]["conv1_1"]["kernel"] == 1.0
    tr.state = tr.state.replace(lr=jnp.asarray(1e7, jnp.float32))
    tr.run_epoch([batch], train=True)
    p2 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    root2 = p2["params"] if "params" in p2 else p2
    assert not np.array_equal(root1["backbone"]["conv1_1"]["kernel"],
                              root2["backbone"]["conv1_1"]["kernel"])


def test_nonfinite_batch_skips_whole_update():
    """A NaN batch must leave params AND optimizer state (momentum)
    untouched — not just zero the grads, which would still move params by
    lr*mu*trace under nesterov momentum (round-1 advisor finding)."""
    cfg = _tiny_cfg()
    cfg.train.freeze_base_epochs = 0
    tr = Trainer(cfg)
    rng = np.random.RandomState(4)
    good = _fake_batch(rng)
    mask = np.ones((8, 8, 8, 1), np.float32)
    # one good step to build nonzero momentum
    tr.state, logs = tr.train_step(tr.state, jnp.asarray(good["image"]),
                                   jnp.asarray(good["keypoints"]),
                                   jnp.asarray(mask))
    assert float(logs["skipped_nonfinite"]) == 0.0
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    o1 = jax.tree_util.tree_map(np.asarray, tr.state.opt_state)
    bad = np.full_like(good["image"], np.nan)
    tr.state, logs = tr.train_step(tr.state, jnp.asarray(bad),
                                   jnp.asarray(good["keypoints"]),
                                   jnp.asarray(mask))
    assert float(logs["skipped_nonfinite"]) == 1.0
    p2 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    o2 = jax.tree_util.tree_map(np.asarray, tr.state.opt_state)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(o1),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(a, b)
    # and training still proceeds after the skip
    tr.state, logs = tr.train_step(tr.state, jnp.asarray(good["image"]),
                                   jnp.asarray(good["keypoints"]),
                                   jnp.asarray(mask))
    assert np.isfinite(float(logs["loss"]))


def test_plateau_schedule():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, cooldown=1)
    assert s.step(1.0) == 1.0           # improves (best=1.0)
    for _ in range(2):
        assert s.step(2.0) == 1.0       # bad x2 (= patience)
    assert s.step(2.0) == 0.5           # third bad epoch -> drop
    assert s.step(2.0) == 0.5           # cooldown consumes one bad epoch
    s2 = ReduceLROnPlateau(lr=1.0)
    s2.load_state_dict(s.state_dict())
    assert s2.lr == 0.5


def test_plateau_threshold_rel():
    """Micro-improvements below the 1e-4 rel threshold must count as bad
    epochs (reference train_VGG19.py:332 threshold semantics) — without
    this, a flat-lined val loss that jitters by 1e-7 never drops the LR
    (observed live in the round-2 hardware run)."""
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=1, cooldown=0)
    s.step(1.0)
    assert s.step(0.99999) == 1.0       # bad 1 (improvement < threshold)
    assert s.step(0.99998) == 0.5       # bad 2 > patience -> drop
    # a real improvement resets
    s2 = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=1, cooldown=0)
    s2.step(1.0)
    assert s2.step(0.9) == 1.0
    assert s2.num_bad == 0


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    tr = Trainer(cfg)
    batch = _fake_batch(np.random.RandomState(2))
    tr.run_epoch([batch], train=True)
    from rtpose_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path), keep=2)
    mgr.save(tr.state, step=1, is_best=True, meta={"epoch": 1})
    state2, meta = mgr.restore(1, tr.state)
    assert meta["epoch"] == 1
    before = jax.tree_util.tree_map(np.asarray, tr.state.params)
    after = state2.params
    r_b = before["params"] if "params" in before else before
    r_a = after["params"] if "params" in after else after
    np.testing.assert_array_equal(r_b["backbone"]["conv1_1"]["kernel"],
                                  r_a["backbone"]["conv1_1"]["kernel"])


def test_mid_epoch_checkpointing(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.train.checkpoint_every_steps = 2
    tr = Trainer(cfg)
    from rtpose_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path), keep=5)
    batch = _fake_batch(np.random.RandomState(3))
    tr.run_epoch([batch, batch, batch, batch], train=True, ckpt=mgr)
    steps = mgr._steps()
    assert len(steps) == 2         # after step 2 and step 4
    restored = mgr.restore_latest(tr.state)
    assert restored is not None
    _state, meta = restored
    assert meta["mid_epoch"] is True


def test_nonfinite_batch_protects_batchnorm_state():
    """Regression: the non-finite guard must also revert model_state — a
    NaN batch's BatchNorm running stats would otherwise poison every
    subsequent eval forward permanently."""
    cfg = _tiny_cfg()
    cfg.model.name = "hourglass"
    cfg.model.num_stages = 1
    cfg.model.downsample = 4          # hourglass outputs at stride 4
    cfg.dataset.sigma = 4.416
    cfg.train.freeze_base_epochs = 0
    tr = Trainer(cfg)
    rng = np.random.RandomState(0)
    good = _fake_batch(rng, batch=8, size=64)
    gy = 64 // cfg.model.downsample
    mask = np.ones((8, gy, gy, 1), np.float32)
    tr.state, logs = tr.train_step(tr.state, jnp.asarray(good["image"]),
                                   jnp.asarray(good["keypoints"]),
                                   jnp.asarray(mask))
    assert float(logs["skipped_nonfinite"]) == 0.0
    state_before = jax.tree_util.tree_map(np.asarray, tr.state.model_state)
    bad = np.full_like(good["image"], np.nan)
    tr.state, logs = tr.train_step(tr.state, jnp.asarray(bad),
                                   jnp.asarray(good["keypoints"]),
                                   jnp.asarray(mask))
    assert float(logs["skipped_nonfinite"]) == 1.0
    state_after = jax.tree_util.tree_map(np.asarray, tr.state.model_state)
    leaves_b = jax.tree_util.tree_leaves(state_before)
    leaves_a = jax.tree_util.tree_leaves(state_after)
    assert leaves_b, "hourglass must carry batch_stats"
    for b, a in zip(leaves_b, leaves_a):
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)


def test_epoch_and_mid_epoch_checkpoints_share_step_namespace(tmp_path):
    """Regression: fit()'s epoch-end checkpoints must use the GLOBAL
    optimizer step like the mid-epoch saves — a per-epoch counter sorts
    below mid-epoch step numbers, so restore_latest resumed stale state
    and _gc deleted the newest epoch-end save."""
    cfg = _tiny_cfg(tmp_path)
    cfg.train.freeze_base_epochs = 0
    cfg.train.checkpoint_every_steps = 2
    cfg.train.epochs = 1
    tr = Trainer(cfg)
    batch = _fake_batch(np.random.RandomState(5))
    loader = [batch, batch, batch]
    tr.fit(loader, [batch], epochs=1)
    from rtpose_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path))
    steps = mgr._steps()
    # mid-epoch save at step 2 and epoch-end save at global step 3
    assert steps == [2, 3], steps
    _state, meta = mgr.restore_latest(tr.state)
    assert meta["epoch"] == 1
    assert not meta.get("mid_epoch", False)


def test_plateau_cooldown_decrements_on_improved_epochs():
    """torch parity: cooldown expires with wall-clock epochs, improved or
    not — alternating improve/plateau epochs must not stretch it."""
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=0, cooldown=2)
    s.step(1.0)
    assert s.step(2.0) == 0.5     # bad > patience=0 -> drop, cooldown=2
    assert s.step(0.5) == 0.5     # improves; cooldown 2 -> 1
    assert s.step(0.4) == 0.5     # improves; cooldown 1 -> 0
    assert s.step(2.0) == 0.25    # cooldown over: bad epoch drops again
