"""Checkpoint -> serving pipeline round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


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
    tr = Trainer(cfg)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(tr.state, step=1, is_best=True, meta={"epoch": 1})

    # loading requires a Trainer with the same architecture settings; the
    # helper rebuilds from defaults, so mirror the tiny config here
    import rtpose_tpu.infer.pipeline as pl_mod

    pipe = None
    # patch: the helper builds its own trainer with default num_stages=6,
    # which would not match — construct directly instead
    from rtpose_tpu.models import get_model
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    restored = mgr.restore_best(tr.state)
    assert restored is not None
    state, meta = restored
    assert meta["epoch"] == 1
    params = jax.tree_util.tree_map(jnp.asarray,
                                    {"params": state.params})
    pipe = pl_mod.PosePipeline(model, params, input_size=56, flip=False)
    img = (np.random.RandomState(0).rand(70, 60, 3) * 255).astype(np.uint8)
    people, heat, _paf, _meta = pipe.run(img)
    assert heat.shape[-1] == 19
