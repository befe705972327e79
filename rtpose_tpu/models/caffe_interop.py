"""Caffe-side interop: prototxt export + caffe-pickle weight import.

Closes the two legacy interop paths of the reference:

- ShuffleNetV2 deploy-prototxt export (reference
  rtpose_shufflenetV2.py:150-165 — which depends on a `slim` module and a
  caffe install that are absent from the reference repo, so it never ran).
  Here the prototxt is emitted directly from the same architecture
  constants as models/shufflenet_v2.py, with no caffe dependency.  Weights
  are exported alongside as an .npz keyed by caffe layer name in caffe's
  OIHW layout (writing a binary .caffemodel needs caffe's protobuf schema,
  which this environment does not have; a caffe user loads the prototxt
  and fills params from the npz).

- OpenPose caffe-pickle import (reference openpose.py:189-209): a pickled
  list of {'name': ..., 'weights': [w, b]} layer dicts, consumed in module
  order — conv entries onto Conv kernels/biases (OIHW -> HWIO), prelu
  entries onto PReLU alphas.
"""

from __future__ import annotations

import io
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .shufflenet_v2 import WIDTH_CONFIGS

# ---------------------------------------------------------------------------
# prototxt export (ShuffleNetV2 rtpose)
# ---------------------------------------------------------------------------


def _layer(out, type_, name, bottoms, tops, body=""):
    out.write("layer {\n")
    out.write(f'  name: "{name}"\n  type: "{type_}"\n')
    for b in bottoms:
        out.write(f'  bottom: "{b}"\n')
    for t in tops:
        out.write(f'  top: "{t}"\n')
    if body:
        out.write(body)
    out.write("}\n")


def _conv_bn_relu(out, name, bottom, num_output, kernel, stride=1,
                  dilation=1, group=1, relu=True):
    pad = ((kernel - 1) * dilation) // 2
    body = ("  convolution_param {\n"
            f"    num_output: {num_output}\n"
            f"    kernel_size: {kernel}\n"
            f"    stride: {stride}\n"
            f"    pad: {pad}\n")
    if dilation != 1:
        body += f"    dilation: {dilation}\n"
    if group != 1:
        body += f"    group: {group}\n"
    body += "    bias_term: false\n  }\n"
    _layer(out, "Convolution", name, [bottom], [name], body)
    _layer(out, "BatchNorm", f"{name}_bn", [name], [name])
    _layer(out, "Scale", f"{name}_scale", [name], [name],
           "  scale_param { bias_term: true }\n")
    if relu:
        _layer(out, "ReLU", f"{name}_relu", [name], [name])
    return name


def _shuffle_unit(out, name, bottom, in_ch, out_ch, stride=1, dilation=1,
                  downsample=False):
    half = out_ch // 2
    if not downsample and stride == 1:
        _layer(out, "Slice", f"{name}_slice", [bottom],
               [f"{name}_x1", f"{name}_x2"],
               "  slice_param { axis: 1 "
               f"slice_point: {in_ch // 2} }}\n")
        y = _conv_bn_relu(out, f"{name}_pw1", f"{name}_x2", half, 1)
        y = _conv_bn_relu(out, f"{name}_dw", y, half, 3, stride=1,
                          dilation=dilation, group=half, relu=False)
        y = _conv_bn_relu(out, f"{name}_pw2", y, half, 1)
        _layer(out, "Concat", f"{name}_concat", [f"{name}_x1", y],
               [f"{name}_concat"], "  concat_param { axis: 1 }\n")
    else:
        y = _conv_bn_relu(out, f"{name}_pw1", bottom, half, 1)
        y = _conv_bn_relu(out, f"{name}_dw", y, half, 3, stride=stride,
                          dilation=dilation, group=half, relu=False)
        y = _conv_bn_relu(out, f"{name}_pw2", y, half, 1)
        z = _conv_bn_relu(out, f"{name}_dw_proj", bottom, in_ch, 3,
                          stride=stride, dilation=dilation, group=in_ch,
                          relu=False)
        z = _conv_bn_relu(out, f"{name}_pw_proj", z, half, 1)
        _layer(out, "Concat", f"{name}_concat", [z, y],
               [f"{name}_concat"], "  concat_param { axis: 1 }\n")
    _layer(out, "ShuffleChannel", f"{name}_shuffle", [f"{name}_concat"],
           [name], "  shuffle_channel_param { group: 2 }\n")
    return name


def shufflenet_prototxt(width_multiplier: float = 1.0,
                        image_hw: int = 368) -> str:
    """Deploy prototxt mirroring ShuffleNetV2RTPose layer for layer."""
    c1, c2, c3, c5 = WIDTH_CONFIGS[width_multiplier]
    out = io.StringIO()
    out.write(f'name: "rtpose_shufflenet_v2_x{width_multiplier}"\n')
    _layer(out, "Input", "data", [], ["data"],
           "  input_param { shape { dim: 1 dim: 3 "
           f"dim: {image_hw} dim: {image_hw} }} }}\n")
    _layer(out, "BatchNorm", "data_bn", ["data"], ["data_bn"])
    _layer(out, "Scale", "data_bn_scale", ["data_bn"], ["data_bn"],
           "  scale_param { bias_term: true }\n")
    x = _conv_bn_relu(out, "stage1_conv", "data_bn", 24, 3, stride=2)
    _layer(out, "Pooling", "pool1", [x], ["pool1"],
           "  pooling_param { pool: MAX kernel_size: 3 stride: 2 }\n")
    x = "pool1"
    in_ch = 24
    for si, (ch, stride, dil, blocks) in enumerate(
            ((c1, 2, 1, 4), (c2, 1, 1, 8), (c3, 1, 1, 4))):
        x = _shuffle_unit(out, f"stage{si + 2}_unit1", x, in_ch, ch,
                          stride=stride, dilation=dil, downsample=True)
        for b in range(1, blocks):
            x = _shuffle_unit(out, f"stage{si + 2}_unit{b + 1}", x, ch, ch,
                              stride=1, dilation=dil)
        in_ch = ch
    x = _conv_bn_relu(out, "conv5", x, c5, 1)
    _layer(out, "Convolution", "paf", [x], ["paf"],
           "  convolution_param { num_output: 38 kernel_size: 1 }\n")
    _layer(out, "Convolution", "heatmap", [x], ["heatmap"],
           "  convolution_param { num_output: 19 kernel_size: 1 }\n")
    return out.getvalue()


def export_shufflenet_caffe(prefix: str, params=None,
                            width_multiplier: float = 1.0,
                            image_hw: int = 368) -> List[str]:
    """Write <prefix>.prototxt (+ <prefix>.weights.npz if params given).

    npz keys are caffe layer names: '<conv layer>/weight' (OIHW) [+
    '/bias' for the paf/heatmap heads], '<conv>_scale/{weight,bias}' for
    the BN gamma/beta (caffe Scale layers), and '<conv>_bn/{mean,var,
    scale_factor}' for the BatchNorm running statistics.  Pass the FULL
    variables dict ({'params', 'batch_stats'}) from a trained model so
    the BN blobs are real; params-only input exports convs/Scales only.
    """
    paths = [f"{prefix}.prototxt"]
    with open(paths[0], "w") as f:
        f.write(shufflenet_prototxt(width_multiplier, image_hw))
    if params is not None:
        import jax

        def _names(path):
            return [str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path]

        def _layer_of(mods):
            # flax auto-names the inner Conv/BatchNorm submodules; the
            # caffe layer name is the joined module path without them
            if mods and mods[-1] in ("Conv_0", "BatchNorm_0"):
                mods = mods[:-1]
            return "_".join(mods)

        flat = {}
        # trainable leaves: conv kernels/biases + BN gamma/beta (the
        # prototxt's Scale layers)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                params.get("params", params)):
            keys = _names(path)
            mods, last = keys[:-1], keys[-1]
            layer = _layer_of(mods)
            arr = np.asarray(leaf)
            if last == "kernel":
                flat[f"{layer}/weight"] = arr.transpose(3, 2, 0, 1)
            elif last == "scale":          # BN gamma -> caffe Scale weight
                flat[f"{layer}_scale/weight"] = arr
            elif last == "bias" and mods and \
                    (mods[-1] == "BatchNorm_0" or layer.endswith("_bn")):
                flat[f"{layer}_scale/bias"] = arr    # BN beta -> Scale bias
            else:
                flat[f"{layer}/{'bias' if last == 'bias' else last}"] = arr
        # running statistics: caffe BatchNorm blobs (mean, var,
        # scale_factor) — without these a caffe deploy of a trained model
        # normalizes with garbage and produces garbage inference
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                params.get("batch_stats", {})):
            keys = _names(path)
            layer = _layer_of(keys[:-1])
            bn = layer if layer.endswith("_bn") else f"{layer}_bn"
            flat[f"{bn}/{keys[-1]}"] = np.asarray(leaf)
            # caffe divides the stored blobs by scale_factor at load time
            flat.setdefault(f"{bn}/scale_factor", np.ones((1,), np.float32))
        paths.append(f"{prefix}.weights.npz")
        np.savez(paths[1], **flat)
    return paths


# ---------------------------------------------------------------------------
# caffe-pickle import (OpenPose v2)
# ---------------------------------------------------------------------------

def openpose_module_order() -> List[Tuple[str, Tuple[str, ...]]]:
    """(kind, flax path) sequence matching the reference's modules() walk
    (openpose.py:202-209): backbone convs + PReLUs in definition order,
    then PAF stages, then heat stages."""
    order: List[Tuple[str, Tuple[str, ...]]] = []
    vgg = ["conv1_1", "conv1_2", "conv2_1", "conv2_2",
           "conv3_1", "conv3_2", "conv3_3", "conv3_4",
           "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM"]
    for name in vgg:
        order.append(("conv", ("backbone", name)))
        if name == "conv4_2":
            order.append(("prelu", ("backbone", "prelu4_2")))
        elif name == "conv4_3_CPM":
            order.append(("prelu", ("backbone", "prelu4_3")))
        elif name == "conv4_4_CPM":
            order.append(("prelu", ("backbone", "prelu4_4")))
    for prefix, n in (("paf_stage", 4), ("heat_stage", 2)):
        for i in range(n):
            for j in range(5):
                for k in range(3):
                    base = (f"{prefix}{i}", f"m{j}_{k}")
                    order.append(("conv", base + ("Conv_0",)))
                    order.append(("prelu", base + ("PReLU_0",)))
            order.append(("conv", (f"{prefix}{i}", "m6", "Conv_0")))
            order.append(("prelu", (f"{prefix}{i}", "m6", "PReLU_0")))
            order.append(("conv", (f"{prefix}{i}", "out")))
    return order


def import_openpose_caffe_pickle(weights: Sequence[Dict],
                                 params: Dict) -> Dict:
    """Fill OpenPoseV2 params from a caffe-pickle layer list
    (reference openpose.py:189-209: conv entries in order onto Conv2d
    modules, prelu entries onto PReLU modules).

    weights: [{'name': str, 'weights': [w, (b)]}, ...]; conv w is OIHW.
    """
    import copy

    import jax

    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    root = out["params"] if "params" in out else out
    convs = [d for d in weights
             if "conv" in d["name"] and "split" not in d["name"]
             and "concat" not in d["name"]]
    prelus = [d for d in weights
              if "prelu" in d["name"] and "split" not in d["name"]
              and "concat" not in d["name"]]
    order = openpose_module_order()
    need_c = sum(1 for k, _ in order if k == "conv")
    need_p = len(order) - need_c
    if len(convs) < need_c or len(prelus) < need_p:
        raise ValueError(
            f"caffe pickle has {len(convs)} conv / {len(prelus)} prelu "
            f"entries; the model needs {need_c} / {need_p}")
    ci = iter(convs)
    pi = iter(prelus)
    for kind, path in order:
        leaf = root
        for p in path:
            leaf = leaf[p]
        if kind == "conv":
            d = next(ci)
            w = np.asarray(d["weights"][0], np.float32)
            expect = leaf["kernel"].shape
            got = w.transpose(2, 3, 1, 0).shape
            if expect != got:
                raise ValueError(
                    f"conv shape mismatch at {path}: {expect} vs {got} "
                    f"(caffe layer {d['name']})")
            leaf["kernel"] = w.transpose(2, 3, 1, 0)
            leaf["bias"] = np.asarray(d["weights"][1], np.float32)
        else:
            d = next(pi)
            alpha = np.asarray(d["weights"][0], np.float32).reshape(-1)
            if alpha.shape != leaf["alpha"].shape:
                raise ValueError(
                    f"prelu shape mismatch at {path}: "
                    f"{leaf['alpha'].shape} vs {alpha.shape}")
            leaf["alpha"] = alpha
    return out


def load_openpose_caffe_pickle(path: str, params: Dict) -> Dict:
    """torch-free loader for the reference's openpose.pkl format."""
    import pickle
    with open(path, "rb") as f:
        weights = pickle.load(f, encoding="latin1")
    return import_openpose_caffe_pickle(weights, params)
