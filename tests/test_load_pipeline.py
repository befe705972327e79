"""Checkpoint -> serving pipeline round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_load_pipeline_from_reference_torch_ckpt(tmp_path):
    """Full-scale (6-stage) weight import from a lightning-prefixed .ckpt
    FILE with the reference's exact key layout (model.model0.0.weight, ...,
    model.model6_2.12.bias — rtpose_vgg.py state_dict + evaluation.py:15-18
    prefix), through the public load_pipeline path, with numeric parity of
    the served heatmaps vs the torch twin.  With this, the only unverified
    link to mAP 0.653 is the trained weight values themselves (no COCO data
    or pose_model.pth in this environment)."""
    torch = pytest.importorskip("torch")
    from test_vgg19_model import _build_torch_twin
    from rtpose_tpu.infer.pipeline import load_pipeline
    from rtpose_tpu.infer.preprocess import crop_with_factor, vgg_preprocess

    twin = _build_torch_twin().eval()
    sd = {"model." + k: v for k, v in twin.state_dict().items()}
    keys = set(sd)
    assert "model.model0.0.weight" in keys          # reference layout
    assert "model.model6_2.12.bias" in keys
    ckpt_path = tmp_path / "_ckpt_epoch_82.ckpt"
    torch.save({"state_dict": sd, "epoch": 82}, str(ckpt_path))

    pipe = load_pipeline(torch_weights=str(ckpt_path), num_stages=6,
                         input_size=64, flip=False, dtype=jnp.float32)
    img = (np.random.RandomState(0).rand(80, 60, 3) * 255).astype(np.uint8)
    _people, heat, paf, meta = pipe.run(img)

    padded, _scale, _real = crop_with_factor(img, 64, factor=8)
    x = vgg_preprocess(padded)[None].transpose(0, 3, 1, 2)
    with torch.no_grad():
        tpaf, theat = twin(torch.from_numpy(np.ascontiguousarray(x)))
    np.testing.assert_allclose(heat, theat.numpy()[0].transpose(1, 2, 0),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(paf, tpaf.numpy()[0].transpose(1, 2, 0),
                               atol=2e-4, rtol=1e-3)


def test_load_pipeline_from_checkpoint(tmp_path):
    from rtpose_tpu.config import Config
    from rtpose_tpu.infer.pipeline import load_pipeline
    from rtpose_tpu.train.checkpoint import CheckpointManager
    from rtpose_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.num_stages = 1
    cfg.model.dtype = "float32"
    cfg.dataset.image_size = 64
    cfg.train.freeze_base_epochs = 0
    cfg.train.print_freq = 100
    # regression: a clip_grad_norm checkpoint has an optax.chain opt_state
    # pytree that a default-config serving process cannot reconstruct;
    # load_pipeline must restore params-only (template-free), not rebuild
    # a Trainer
    cfg.train.clip_grad_norm = 1.0
    tr = Trainer(cfg)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr.state, step=1, is_best=True, meta={"epoch": 1})

    pipe = load_pipeline(str(tmp_path), num_stages=1, input_size=56,
                         flip=False, dtype=jnp.float32)
    img = (np.random.RandomState(0).rand(70, 60, 3) * 255).astype(np.uint8)
    people, heat, _paf, _meta = pipe.run(img)
    assert heat.shape[-1] == 19

    # the loaded params must be the trained ones, not a fresh init
    saved = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params)[0])
    loaded = np.asarray(
        jax.tree_util.tree_leaves(pipe.params["params"])[0])
    np.testing.assert_array_equal(saved, loaded)


def test_load_pipeline_hourglass_nondivisible_input(tmp_path):
    """Regression: from-scratch hourglass pipelines must init at a
    pad_factor-rounded dummy size — a raw non-64-divisible input_size
    crashed the init trace in the depth-4 skip adds."""
    import numpy as np

    from rtpose_tpu.infer.pipeline import load_pipeline

    pipe = load_pipeline(None, model_name="hourglass", num_stages=1,
                         input_size=120, dtype=jnp.float32,
                         downsample=4, pad_factor=64)
    img = (np.random.RandomState(0).rand(130, 150, 3) * 255) \
        .astype(np.uint8)
    people, heat, _paf, meta = pipe.run(img)
    ph, pw = meta["padded_shape"][:2]
    assert ph % 64 == 0 and pw % 64 == 0
    assert heat.shape[0] == ph // 4


def test_load_pipeline_rejects_ambiguous_sources(tmp_path):
    import pytest

    from rtpose_tpu.infer.pipeline import load_pipeline

    with pytest.raises(ValueError, match="not both"):
        load_pipeline(str(tmp_path), torch_weights="pose_model.pth")
