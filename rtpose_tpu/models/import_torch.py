"""Import reference PyTorch checkpoints into the flax VGG19RTPose tree.

Handles the three checkpoint layouts the reference loads:
- raw rtpose state_dict `pose_model.pth` (reference demo/picture_demo.py:46)
- lightning-prefixed ckpt with `model.` key prefix (reference
  evaluate/evaluation.py:12-18)
- torchvision vgg19 ImageNet weights for the first 10 convs (reference
  lib/network/rtpose_vgg.py:235-251, key-order based)

Torch convs are OIHW; flax convs are HWIO -> transpose (2, 3, 1, 0).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# Ordered conv-layer names of the reference `rtpose_model` state_dict
# (nn.Sequential indices) mapped to our flax param paths.
_BLOCK0_SEQ = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25]
_BLOCK0_NAMES = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                 "conv3_2", "conv3_3", "conv3_4", "conv4_1", "conv4_2",
                 "conv4_3_CPM", "conv4_4_CPM"]
_STAGE1_SEQ = [0, 2, 4, 6, 8]
_STAGE1_NAMES = ["conv1", "conv2", "conv3", "conv4", "out"]
_STAGET_SEQ = [0, 2, 4, 6, 8, 10, 12]
_STAGET_NAMES = ["conv1", "conv2", "conv3", "conv4", "conv5", "conv6", "out"]


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(params_leaf: Dict, w: np.ndarray, b: np.ndarray) -> None:
    params_leaf["kernel"] = np.transpose(_to_numpy(w), (2, 3, 1, 0))
    params_leaf["bias"] = _to_numpy(b)


def torch_layout_map() -> List[Tuple[str, Tuple[str, ...]]]:
    """(torch key prefix, flax param path) for every conv in the model."""
    mapping: List[Tuple[str, Tuple[str, ...]]] = []
    for seq, name in zip(_BLOCK0_SEQ, _BLOCK0_NAMES):
        mapping.append((f"model0.{seq}", ("backbone", name)))
    for t in range(1, 7):
        seqs, names = ((_STAGE1_SEQ, _STAGE1_NAMES) if t == 1
                       else (_STAGET_SEQ, _STAGET_NAMES))
        for branch, lname in (("1", "L1"), ("2", "L2")):
            for seq, name in zip(seqs, names):
                mapping.append((f"model{t}_{branch}.{seq}",
                                ("stages", f"stage{t}_{lname}", name)))
    return mapping


def import_rtpose_state_dict(state_dict: Dict[str, np.ndarray],
                             params: Dict) -> Dict:
    """Fill a flax param tree (from model.init) with reference weights.

    Accepts raw or lightning-prefixed (`model.`) state_dicts; returns a new
    tree (numpy leaves).
    """
    import copy
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in state_dict.items()}
    out = copy.deepcopy(jax_tree_to_numpy(params))
    for torch_prefix, path in torch_layout_map():
        w = sd[f"{torch_prefix}.weight"]
        b = sd[f"{torch_prefix}.bias"]
        leaf = out["params"] if "params" in out else out
        for p in path:
            leaf = leaf[p]
        expect = leaf["kernel"].shape
        got = np.transpose(_to_numpy(w), (2, 3, 1, 0)).shape
        if expect != got:
            raise ValueError(
                f"shape mismatch at {path}: flax {expect} vs torch {got}")
        _conv(leaf, w, b)
    return out


def import_vgg19_imagenet(vgg_state_dict: Dict[str, np.ndarray],
                          params: Dict) -> Dict:
    """Load the first 10 torchvision-vgg19 convs into the backbone.

    Key-order based, matching reference rtpose_vgg.py:244-246 (first 20
    tensors = 10 x (weight, bias)).
    """
    import copy
    out = copy.deepcopy(jax_tree_to_numpy(params))
    tensors = list(vgg_state_dict.values())
    leaf_root = out["params"] if "params" in out else out
    for i, name in enumerate(_BLOCK0_NAMES[:10]):
        _conv(leaf_root["backbone"][name], tensors[2 * i], tensors[2 * i + 1])
    return out


def export_rtpose_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Export a flax param tree to a reference-layout torch state_dict.

    The exact inverse of :func:`import_rtpose_state_dict`: every conv
    kernel goes HWIO -> OIHW under the `model0.*` / `model{T}_{B}.*`
    nn.Sequential key scheme of the reference's ``rtpose_model``
    (reference lib/network/rtpose_vgg.py:138-225), so a model trained
    here can be loaded by the reference's own ``get_model('vgg19')`` via
    ``load_state_dict`` (numpy values; wrap with torch.from_numpy for a
    strict load).
    """
    tree = jax_tree_to_numpy(params)
    root = tree["params"] if "params" in tree else tree
    out: Dict[str, np.ndarray] = {}
    for torch_prefix, path in torch_layout_map():
        leaf = root
        for p in path:
            leaf = leaf[p]
        out[f"{torch_prefix}.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(leaf["kernel"], np.float32),
                         (3, 2, 0, 1)))
        out[f"{torch_prefix}.bias"] = np.asarray(leaf["bias"], np.float32)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .pth/.ckpt and return a flat numpy state_dict."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def jax_tree_to_numpy(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
