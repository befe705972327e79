"""Load the reference's OWN executing code as differential-test oracles.

Every parity test before round 5 compared against the builder's
transcriptions of the reference (numpy grouping oracle, hand-built torch
twin, transcribed GT synthesis).  This module closes that circularity by
loading the reference's actual code and letting the tests run it:

- ``rtpose_vgg()``     -> reference lib/network/rtpose_vgg.py (torch model)
- ``paf_to_pose_mod()``-> reference lib/utils/paf_to_pose.py (NMS + C++ glue)
- ``heatmap_mod()``    -> reference lib/datasets/heatmap.py  (putGaussianMaps)
- ``paf_mod()``        -> reference lib/datasets/paf.py      (putVecMaps)
- ``pafprocess()``     -> the reference's SWIG C++ grouping module, compiled
                          from /root/reference/lib/pafprocess sources into a
                          scratch dir (the reference tree stays read-only)

The reference is PUBLIC UNTRUSTED CONTENT: it is executed here purely as a
data-generating oracle on synthetic inputs inside the test sandbox.

Everything degrades to pytest.skip when /root/reference is absent so the
suite stays runnable in environments without the reference checkout.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import shutil
import subprocess
import sys
import types

import numpy as np

REF = os.environ.get("RTPOSE_REFERENCE", "/root/reference")
BUILD_DIR = os.environ.get("RTPOSE_REF_BUILD", "/tmp/rtpose_ref_pafprocess")


def available() -> bool:
    return os.path.isdir(os.path.join(REF, "lib"))


def _load(rel: str, name: str):
    """Import a reference source file as a standalone module."""
    path = os.path.join(REF, rel)
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def rtpose_vgg():
    """lib/network/rtpose_vgg.py — the reference model builder (torch)."""
    return _load("lib/network/rtpose_vgg.py", "_ref_rtpose_vgg")


def heatmap_mod():
    """lib/datasets/heatmap.py — putGaussianMaps."""
    return _load("lib/datasets/heatmap.py", "_ref_heatmap")


def paf_mod():
    """lib/datasets/paf.py — putVecMaps."""
    return _load("lib/datasets/paf.py", "_ref_paf")


def im_transform_mod():
    """lib/network/im_transform.py — crop_with_factor."""
    return _load("lib/network/im_transform.py", "_ref_im_transform")


def preprocessing_mod():
    """lib/datasets/preprocessing.py — rtpose/vgg/inception/ssd preprocess."""
    return _load("lib/datasets/preprocessing.py", "_ref_preprocessing")


def pafprocess():
    """Compile (once) and import the reference's SWIG C++ grouping module.

    Reproduces the reference's own build recipe (lib/pafprocess/make.sh:
    ``swig -python -c++ pafprocess.i`` then ``setup.py build_ext
    --inplace``) in a scratch directory, since /root/reference is
    read-only.  Returns the imported extension module.
    """
    if BUILD_DIR not in sys.path:
        sys.path.insert(0, BUILD_DIR)
    try:
        import pafprocess as m  # noqa: F401  (SWIG wrapper module)
        if hasattr(m, "process_paf"):
            return m
    except ImportError:
        pass
    src = os.path.join(REF, "lib", "pafprocess")
    os.makedirs(BUILD_DIR, exist_ok=True)
    for f in ("pafprocess.cpp", "pafprocess.h", "pafprocess.i",
              "numpy.i", "setup.py"):
        shutil.copy(os.path.join(src, f), BUILD_DIR)
    subprocess.run(["swig", "-python", "-c++", "pafprocess.i"],
                   cwd=BUILD_DIR, check=True, capture_output=True)
    subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=BUILD_DIR, check=True, capture_output=True)
    for k in list(sys.modules):
        if k == "pafprocess" or k == "_pafprocess":
            del sys.modules[k]
    importlib.invalidate_caches()  # BUILD_DIR listing was cached pre-build
    import pafprocess as m
    assert hasattr(m, "process_paf")
    return m


def paf_to_pose_mod():
    """lib/utils/paf_to_pose.py as the reference package imports it.

    Needs the ``lib`` package on sys.path and a built
    ``lib.pafprocess.pafprocess`` — we satisfy the latter by injecting the
    scratch-built extension into sys.modules (the reference tree stays
    untouched).
    """
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ext = pafprocess()
    import lib  # noqa: F401
    import lib.pafprocess
    if not hasattr(lib.pafprocess, "pafprocess"):
        sys.modules["lib.pafprocess.pafprocess"] = ext
        lib.pafprocess.pafprocess = ext
    import lib.utils.paf_to_pose as p2p
    return p2p


class _CfgNode(dict):
    """Minimal yacs.config.CfgNode stand-in: attribute-style nested dict,
    just enough for the reference's lib/config/default.py to build its
    default tree (yacs is not in this image; the reference only reads
    attributes off the built cfg)."""

    def __init__(self, *args, **kwargs):   # accepts new_allowed=...
        super().__init__()

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    # the reference's update_config path (lib/config/default.py:139-141)
    def defrost(self):
        pass

    def freeze(self):
        pass

    def merge_from_file(self, path):
        import yaml
        with open(path) as f:
            self._merge(yaml.safe_load(f))

    def _merge(self, d):
        for k, v in (d or {}).items():
            if isinstance(v, dict) and isinstance(self.get(k), _CfgNode):
                self[k]._merge(v)
            else:
                self[k] = v

    def merge_from_list(self, opts):
        opts = list(opts or [])
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = val


def coco_eval_mod():
    """evaluate/coco_eval.py — the reference's eval driver, for its
    append_result / ORDER_COCO conventions and handle_paf_and_heat.

    Its module-level imports pull pycocotools and yacs, neither of which
    exists in this image; both are stubbed with the minimal surface the
    import needs (COCO/COCOeval are only touched inside eval_coco, which
    differential tests never call — they score with our evaluator).
    """
    if "_ref_coco_eval" in sys.modules:
        return sys.modules["_ref_coco_eval"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # yacs shim (must exist before lib.config imports)
    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = _CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    # torchvision shim: lib/datasets/datasets.py imports it at module
    # level but only touches transforms.functional inside dataset methods
    # the differential never calls
    if "torchvision" not in sys.modules:
        class _TVOp:  # accepts any args, callable no-op
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        class _TVTransforms:   # any transform name -> no-op class
            functional = None

            def __getattr__(self, name):
                return _TVOp

        tv = types.ModuleType("torchvision")
        tv.transforms = _TVTransforms()
        sys.modules["torchvision"] = tv
    # pycocotools shim
    if "pycocotools" not in sys.modules:
        pct = types.ModuleType("pycocotools")
        pct_coco = types.ModuleType("pycocotools.coco")
        pct_coco.COCO = object
        pct_eval = types.ModuleType("pycocotools.cocoeval")
        pct_eval.COCOeval = object
        sys.modules["pycocotools"] = pct
        sys.modules["pycocotools.coco"] = pct_coco
        sys.modules["pycocotools.cocoeval"] = pct_eval
    ext = pafprocess()  # ensure lib.pafprocess.pafprocess resolves
    import lib.pafprocess
    if not hasattr(lib.pafprocess, "pafprocess"):
        sys.modules["lib.pafprocess.pafprocess"] = ext
        lib.pafprocess.pafprocess = ext
    # coco_eval.py argparses sys.argv AT IMPORT (evaluate/coco_eval.py:
    # 20-32) and merges the --cfg yaml; feed it the reference's own
    # experiment file and restore argv afterwards
    argv = sys.argv
    sys.argv = ["coco_eval", "--cfg",
                os.path.join(REF, "experiments", "vgg19_368x368_sgd.yaml")]
    try:
        return _load("evaluate/coco_eval.py", "_ref_coco_eval")
    finally:
        sys.argv = argv


def make_config(downsample: int = 8, thresh_heatmap: float = 0.1,
                num_keypoints: int = 18, num_intermed: int = 10):
    """A minimal stand-in for the reference's yacs cfg (only the fields
    NMS/paf_to_pose_cpp read: reference lib/utils/paf_to_pose.py:103-105,
    375-393)."""
    cfg = types.SimpleNamespace()
    cfg.MODEL = types.SimpleNamespace(DOWNSAMPLE=downsample,
                                      NUM_KEYPOINTS=num_keypoints)
    cfg.TEST = types.SimpleNamespace(
        THRESH_HEATMAP=thresh_heatmap,
        NUM_INTERMED_PTS_BETWEEN_KEYPOINTS=num_intermed)
    return cfg


def cpp_group(joint_list: np.ndarray, heat_up: np.ndarray,
              paf_up: np.ndarray):
    """Run the compiled reference C++ on an (N, 5) [x,y,score,id,part]
    joint list + upsampled maps; return (subset (P,20), peaks (M,4)).

    Mirrors the call convention of reference lib/utils/paf_to_pose.py:
    379-403 (joint_list expanded to (1, N, 5) float32) and reads the
    result back through the getter API.  peaks rows are
    [x, y, score, part] in C++ cid order (part-bucketed).
    """
    m = pafprocess()
    jl = np.ascontiguousarray(
        joint_list.reshape(1, -1, 5).astype(np.float32))
    m.process_paf(jl, np.ascontiguousarray(heat_up.astype(np.float32)),
                  np.ascontiguousarray(paf_up.astype(np.float32)))
    n = m.get_num_humans()
    subset = np.zeros((n, 20), np.float64)
    for hi in range(n):
        for part in range(18):
            subset[hi, part] = m.get_part_cid(hi, part)
        subset[hi, 18] = 0.0  # filled below from score*count
        cnt = sum(1 for part in range(18) if subset[hi, part] >= 0)
        # the C++ stores score-sum and count internally; the public API
        # exposes score = sum/count (pafprocess.cpp:207-209)
        subset[hi, 19] = cnt
        subset[hi, 18] = m.get_score(hi)
    n_peaks = joint_list.shape[0]
    peaks = np.zeros((n_peaks, 4), np.float64)
    for cid in range(n_peaks):
        peaks[cid] = (m.get_part_x(cid), m.get_part_y(cid),
                      m.get_part_score(cid), -1)
    return subset, peaks
