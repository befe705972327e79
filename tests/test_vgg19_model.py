"""VGG19 rtpose model: shapes, param count, and numeric parity with an
independently-built torch model of the same architecture via weight import.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.models import get_model
from rtpose_tpu.models.import_torch import (import_rtpose_state_dict,
                                            torch_layout_map)


@pytest.fixture(scope="module")
def model_and_params():
    model = get_model("vgg19", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_output_shapes(model_and_params):
    model, params = model_and_params
    x = jnp.zeros((2, 64, 96, 3))
    out = model.apply(params, x)
    assert out.pafs.shape == (6, 2, 8, 12, 38)
    assert out.heatmaps.shape == (6, 2, 8, 12, 19)


def test_param_count(model_and_params):
    # Reference rtpose VGG19 has ~52.3M params (SURVEY.md §2.3).
    _, params = model_and_params
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    assert 50e6 < n < 55e6, n


def _build_torch_twin():
    """An independent torch construction of the rtpose architecture,
    state_dict-compatible with the reference layout (model0.*, modelT_B.*)."""
    import torch
    import torch.nn as nn

    def conv(i, o, k):
        return nn.Conv2d(i, o, k, padding=k // 2)

    feats = [64, 64, "P", 128, 128, "P", 256, 256, 256, 256, "P", 512, 512,
             256, 128]
    layers, cin = [], 3
    for f in feats:
        if f == "P":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [conv(cin, f, 3), nn.ReLU()]
            cin = f
    model0 = nn.Sequential(*layers)

    def stage1(out_ch):
        return nn.Sequential(
            conv(128, 128, 3), nn.ReLU(), conv(128, 128, 3), nn.ReLU(),
            conv(128, 128, 3), nn.ReLU(), conv(128, 512, 1), nn.ReLU(),
            conv(512, out_ch, 1))

    def stageT(out_ch):
        return nn.Sequential(
            conv(185, 128, 7), nn.ReLU(), conv(128, 128, 7), nn.ReLU(),
            conv(128, 128, 7), nn.ReLU(), conv(128, 128, 7), nn.ReLU(),
            conv(128, 128, 7), nn.ReLU(), conv(128, 128, 1), nn.ReLU(),
            conv(128, out_ch, 1))

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.model0 = model0
            for t in range(1, 7):
                mk = stage1 if t == 1 else stageT
                setattr(self, f"model{t}_1", mk(38))
                setattr(self, f"model{t}_2", mk(19))

        def forward(self, x):
            import torch as T
            feat = self.model0(x)
            paf, heat = self.model1_1(feat), self.model1_2(feat)
            for t in range(2, 7):
                inp = T.cat([paf, heat, feat], 1)
                paf = getattr(self, f"model{t}_1")(inp)
                heat = getattr(self, f"model{t}_2")(inp)
            return paf, heat

    return Twin()


def test_numeric_parity_with_torch(model_and_params):
    torch = pytest.importorskip("torch")
    model, params = model_and_params
    twin = _build_torch_twin().eval()
    sd = {k: v for k, v in twin.state_dict().items()}

    imported = import_rtpose_state_dict(sd, params)
    x = np.random.RandomState(1).rand(1, 40, 48, 3).astype(np.float32)

    out = model.apply(jax.tree_util.tree_map(jnp.asarray, imported),
                      jnp.asarray(x))
    with torch.no_grad():
        tpaf, theat = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out.paf)[0],
                               tpaf.numpy()[0].transpose(1, 2, 0),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.heatmap)[0],
                               theat.numpy()[0].transpose(1, 2, 0),
                               atol=2e-4, rtol=1e-3)


def test_layout_map_covers_all_convs(model_and_params):
    _, params = model_and_params
    flat = jax.tree_util.tree_leaves_with_path(params)
    n_convs = sum(1 for path, _ in flat
                  if path[-1].key == "kernel")  # type: ignore[union-attr]
    assert len(torch_layout_map()) == n_convs
