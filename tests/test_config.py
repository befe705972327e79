"""Config system: yaml overlays, dotlist overrides, experiment files."""

import glob
import os

import pytest

from rtpose_tpu.config import Config, apply_dotlist, load_config

# anchored to this file so the parametrization never silently empties when
# pytest runs from another cwd
_EXPERIMENT_YAMLS = glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "experiments", "*.yaml"))
assert _EXPERIMENT_YAMLS, "experiments/*.yaml not found"


def test_defaults():
    cfg = Config()
    assert cfg.model.name == "vgg19"
    assert cfg.model.downsample == 8
    assert cfg.train.lr == 1.0
    assert cfg.test.thresh_heatmap == 0.1
    assert cfg.test.flip is True


@pytest.mark.parametrize("path", sorted(_EXPERIMENT_YAMLS))
def test_experiment_yamls_parse(path):
    cfg = load_config(path)
    assert cfg.dataset.image_size in (256, 368)
    assert cfg.model.name in ("vgg19", "hourglass", "shufflenet_v2")


def test_dotlist_overrides():
    cfg = Config()
    apply_dotlist(cfg, ["train.lr=0.5", "model.num_stages=4",
                        "dataset.train_annotations=[\"a.json\"]",
                        "test.scales=[0.5, 1.0]"])
    assert cfg.train.lr == 0.5
    assert cfg.model.num_stages == 4
    assert cfg.dataset.train_annotations == ["a.json"]
    assert cfg.test.scales == (0.5, 1.0)


def test_unknown_key_rejected():
    cfg = Config()
    with pytest.raises(KeyError):
        from rtpose_tpu.config import apply_overrides
        apply_overrides(cfg, {"model": {"does_not_exist": 1}})


def test_json_round_trip(tmp_path):
    cfg = Config()
    cfg.train.lr = 0.25
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    cfg2 = load_config(str(p))
    assert cfg2.train.lr == 0.25
    assert cfg2.model.name == cfg.model.name
