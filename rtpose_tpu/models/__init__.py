"""Model zoo registry.

``get_model(name)`` mirrors reference lib/network/rtpose_vgg.py:60
(get_model) but covers every family in the reference inventory behind one
``Backbone -> CPMStages`` contract (SURVEY.md C9-C15).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from .common import ModelOutput, CPMStages  # noqa: F401

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str = "vgg19", *, num_stages: int = 6,
              dtype: Any = jnp.float32, **kwargs):
    """Build a flax model by family name.

    Supported: vgg19, mobilenet, hourglass, shufflenet_v2, openpose_v2,
    atrous_resnet50.
    """
    if name not in _REGISTRY:
        _load_builtin(name)
    if name not in _REGISTRY:
        raise KeyError(f"unknown model family '{name}'; "
                       f"known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](num_stages=num_stages, dtype=dtype, **kwargs)


def _load_builtin(name: str) -> None:
    # Lazy imports keep `import rtpose_tpu.models` light.
    if name == "vgg19":
        from .vgg19 import VGG19RTPose
        _REGISTRY["vgg19"] = lambda **kw: VGG19RTPose(
            num_stages=kw.get("num_stages", 6), dtype=kw.get("dtype"),
            remat=kw.get("remat", False))
    elif name == "mobilenet":
        from .mobilenet_v2 import MobileNetRTPose
        _REGISTRY["mobilenet"] = lambda **kw: MobileNetRTPose(
            num_stages=kw.get("num_stages", 6), dtype=kw.get("dtype"))
    elif name == "hourglass":
        from .hourglass import HourglassRTPose
        _REGISTRY["hourglass"] = lambda **kw: HourglassRTPose(
            num_stacks=kw.get("num_stacks", kw.get("num_stages", 8)),
            dtype=kw.get("dtype"))
    elif name == "shufflenet_v2":
        from .shufflenet_v2 import ShuffleNetV2RTPose
        _REGISTRY["shufflenet_v2"] = lambda **kw: ShuffleNetV2RTPose(
            width_multiplier=kw.get("width_multiplier", 1.0),
            dtype=kw.get("dtype"))
    elif name == "openpose_v2":
        from .openpose_v2 import OpenPoseV2
        _REGISTRY["openpose_v2"] = lambda **kw: OpenPoseV2(
            num_paf_stages=kw.get("num_paf_stages", 4),
            num_heat_stages=kw.get("num_heat_stages", 2),
            dtype=kw.get("dtype"))
    elif name == "atrous_resnet50":
        from .atrous import AtrousPose
        _REGISTRY["atrous_resnet50"] = lambda **kw: AtrousPose(
            dtype=kw.get("dtype"))
    elif name == "atrous_cpm":
        from .atrous_cpm import AtrousCPM
        _REGISTRY["atrous_cpm"] = lambda **kw: AtrousCPM(
            num_stages=kw.get("num_stages", 5), dtype=kw.get("dtype"))
    elif name == "atrous_cpm_shared":
        from .atrous_cpm import AtrousCPMShared
        _REGISTRY["atrous_cpm_shared"] = lambda **kw: AtrousCPMShared(
            num_stages=kw.get("num_stages", 5), dtype=kw.get("dtype"))
