"""Persistent XLA compile cache for every TPU entry point.

The 6-stage VGG19 serving program costs minutes to compile; the cached
binary loads in milliseconds (measured 0.74 s -> 0.02 s on a toy program,
~10 min -> 173 s for the full bench).  Enabling the cache makes demo /
eval / selftest process startup pay compilation once per machine instead
of once per process — the TPU-native analogue of the reference shipping
pre-built CUDA binaries.

Opt-out with RTPOSE_NO_COMPILE_CACHE=1; relocate with
RTPOSE_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_enabled = False


def enable(default_dir: str = None) -> None:
    """Idempotent: the first call in a process pins the cache dir and
    later calls are true no-ops — so e.g. PosePipeline's internal enable()
    cannot silently redirect a dir an entry point already chose."""
    global _enabled
    if _enabled or os.environ.get("RTPOSE_NO_COMPILE_CACHE"):
        return
    import jax

    path = (os.environ.get("RTPOSE_COMPILE_CACHE_DIR") or default_dir
            or os.path.join(os.environ.get("XDG_CACHE_HOME")
                            or os.path.expanduser("~/.cache"),
                            "rtpose_tpu", "xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except (OSError, AttributeError):  # read-only fs / old jax: run uncached
        pass
