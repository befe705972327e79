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
    # Lazy imports keep `import rtpose_tpu.models` light.  Builders have
    # EXPLICIT signatures so a mistyped or unsupported get_model kwarg
    # raises TypeError instead of being silently swallowed (e.g.
    # remat=True on a family that cannot remat, or num_stage= typos).
    if name == "vgg19":
        from .vgg19 import VGG19RTPose

        def _build(*, num_stages=6, dtype=None, remat=False):
            return VGG19RTPose(num_stages=num_stages, dtype=dtype,
                               remat=remat)
    elif name == "mobilenet":
        from .mobilenet_v2 import MobileNetRTPose

        def _build(*, num_stages=6, dtype=None):
            return MobileNetRTPose(num_stages=num_stages, dtype=dtype)
    elif name == "hourglass":
        from .hourglass import HourglassRTPose

        def _build(*, num_stages=8, dtype=None, num_stacks=None):
            return HourglassRTPose(
                num_stacks=num_stacks if num_stacks is not None
                else num_stages, dtype=dtype)
    elif name == "shufflenet_v2":
        from .shufflenet_v2 import ShuffleNetV2RTPose

        def _build(*, num_stages=1, dtype=None, width_multiplier=1.0):
            # single-stage by construction (reference
            # rtpose_shufflenetV2.py has no refinement stages);
            # num_stages is accepted for the common call contract
            return ShuffleNetV2RTPose(width_multiplier=width_multiplier,
                                      dtype=dtype)
    elif name == "openpose_v2":
        from .openpose_v2 import OpenPoseV2

        def _build(*, num_stages=6, dtype=None, num_paf_stages=4,
                   num_heat_stages=2):
            # staged as num_paf_stages + num_heat_stages (reference
            # openpose.py:160-177); num_stages accepted for the contract
            return OpenPoseV2(num_paf_stages=num_paf_stages,
                              num_heat_stages=num_heat_stages, dtype=dtype)
    elif name == "atrous_resnet50":
        from .atrous import AtrousPose

        def _build(*, num_stages=1, dtype=None):
            # single-stage by construction (reference atrouspose.py)
            return AtrousPose(dtype=dtype)
    elif name == "atrous_cpm":
        from .atrous_cpm import AtrousCPM

        def _build(*, num_stages=5, dtype=None):
            return AtrousCPM(num_stages=num_stages, dtype=dtype)
    elif name == "atrous_cpm_shared":
        from .atrous_cpm import AtrousCPMShared

        def _build(*, num_stages=5, dtype=None):
            return AtrousCPMShared(num_stages=num_stages, dtype=dtype)
    else:
        return
    _REGISTRY[name] = _build
