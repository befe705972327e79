"""Caffe interop: prototxt export + caffe-pickle weight import."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.models.caffe_interop import (export_shufflenet_caffe,
                                             import_openpose_caffe_pickle,
                                             load_openpose_caffe_pickle,
                                             openpose_module_order,
                                             shufflenet_prototxt)
from rtpose_tpu.models.openpose_v2 import OpenPoseV2
from rtpose_tpu.models.shufflenet_v2 import ShuffleNetV2RTPose


def test_prototxt_structure():
    txt = shufflenet_prototxt(1.0, 368)
    # one unit1 (downsample) per stage + the right unit counts
    assert txt.count('type: "ShuffleChannel"') == 4 + 8 + 4
    assert txt.count('name: "stage3_unit8_shuffle"') == 1
    assert 'num_output: 38' in txt and 'num_output: 19' in txt
    assert 'dim: 368' in txt
    # downsample units carry the projection branch
    assert 'stage2_unit1_dw_proj' in txt
    assert 'stage2_unit2_dw_proj' not in txt
    # really balanced: every opened brace closes, and plenty of layers
    assert txt.count("{") == txt.count("}")
    assert txt.count("layer {") > 40


def test_prototxt_export_with_weights(tmp_path):
    model = ShuffleNetV2RTPose(width_multiplier=0.5, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    paths = export_shufflenet_caffe(str(tmp_path / "shuf"), params,
                                    width_multiplier=0.5, image_hw=64)
    assert len(paths) == 2
    data = np.load(paths[1])
    # keys are caffe LAYER names from the prototxt, not flax paths
    txt = shufflenet_prototxt(0.5, 64)
    conv_keys = [k for k in data.files if k.endswith("/weight")
                 and not k.endswith("_scale/weight")]
    assert conv_keys
    for k in conv_keys:
        assert f'name: "{k.split("/")[0]}"' in txt, k
    # kernels exported OIHW: spatial dims last
    k = data["stage1_conv/weight"]
    assert k.ndim == 4 and k.shape[2] == k.shape[3]
    # BN running stats + scale_factor present for every BatchNorm layer,
    # gamma/beta on the Scale layers, biases only on the heads
    assert "stage1_conv_bn/mean" in data.files
    assert "stage1_conv_bn/var" in data.files
    assert float(data["stage1_conv_bn/scale_factor"][0]) == 1.0
    assert "stage1_conv_scale/weight" in data.files
    assert "stage1_conv_scale/bias" in data.files
    assert "data_bn/mean" in data.files            # input BN keeps its name
    assert "data_bn_scale/weight" in data.files
    assert "paf/bias" in data.files and "heatmap/bias" in data.files
    bn_layers = {k.split("/")[0] for k in data.files if "/mean" in k}
    for bn in bn_layers:
        assert f'name: "{bn}"' in txt, bn


@pytest.fixture(scope="module")
def openpose_model():
    model = OpenPoseV2(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, params


def _synth_pickle(params, rng):
    """Fake openpose.pkl with the reference's entry layout, shaped to the
    model (includes decoy split/concat entries the loader must skip)."""
    root = params["params"] if "params" in params else params
    entries = [{"name": "data_split", "weights": []}]
    for i, (kind, path) in enumerate(openpose_module_order()):
        leaf = root
        for p in path:
            leaf = leaf[p]
        if kind == "conv":
            hwio = np.asarray(leaf["kernel"]).shape
            w = rng.randn(hwio[3], hwio[2], hwio[0], hwio[1]) * 0.01
            b = rng.randn(hwio[3]) * 0.01
            entries.append({"name": f"conv_l{i}",
                            "weights": [w.astype(np.float32),
                                        b.astype(np.float32)]})
        else:
            n = np.asarray(leaf["alpha"]).shape[0]
            entries.append({"name": f"prelu_l{i}",
                            "weights": [rng.rand(n).astype(np.float32)]})
        if i == 3:
            entries.append({"name": "prelu_concat_decoy", "weights": []})
    return entries


def test_caffe_pickle_import_roundtrip(openpose_model, tmp_path):
    model, params = openpose_model
    rng = np.random.RandomState(0)
    entries = _synth_pickle(params, rng)
    pkl = tmp_path / "openpose.pkl"
    pkl.write_bytes(pickle.dumps(entries))

    imported = load_openpose_caffe_pickle(str(pkl), params)
    root = imported["params"]
    # first conv == first conv entry, transposed OIHW->HWIO
    first = next(e for e in entries if e["name"].startswith("conv"))
    np.testing.assert_array_equal(
        root["backbone"]["conv1_1"]["kernel"],
        first["weights"][0].transpose(2, 3, 1, 0))
    # a prelu deep in the net took its entry
    prelu_entries = [e for e in entries if e["name"].startswith("prelu_l")]
    np.testing.assert_array_equal(root["backbone"]["prelu4_2"]["alpha"],
                                  prelu_entries[0]["weights"][0])
    # the imported tree still runs
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, imported),
                      jnp.zeros((1, 32, 32, 3)))
    assert out.heatmap.shape[-1] == 19
    assert np.isfinite(np.asarray(out.heatmap)).all()


def test_caffe_pickle_shape_mismatch_raises(openpose_model):
    _, params = openpose_model
    rng = np.random.RandomState(1)
    entries = _synth_pickle(params, rng)
    first = next(e for e in entries if e["name"].startswith("conv"))
    first["weights"][0] = first["weights"][0][:, :, :1, :1]
    with pytest.raises(ValueError, match="conv shape mismatch"):
        import_openpose_caffe_pickle(entries, params)
