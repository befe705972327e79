"""ctypes bindings for the native pafgroup C++ module.

Builds the shared library on first use (g++ -O3) and exposes
:func:`group_peaks_native` with the same contract as
rtpose_tpu.ops.grouping_ref.group_peaks.  Thread-safe: every call uses its
own context object (the reference SWIG module kept file-scope globals,
reference lib/pafprocess/pafprocess.cpp:12-13).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pafgroup.cpp")
_LIB_PATH = os.path.join(_HERE, "libpafgroup.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pafgroup_create.restype = ctypes.c_void_p
        lib.pafgroup_destroy.argtypes = [ctypes.c_void_p]
        lib.pafgroup_process.restype = ctypes.c_int
        lib.pafgroup_process.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int]
        lib.pafgroup_num_humans.restype = ctypes.c_int
        lib.pafgroup_num_humans.argtypes = [ctypes.c_void_p]
        lib.pafgroup_get_subset.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        lib.pafgroup_get_peaks.restype = ctypes.c_int
        lib.pafgroup_get_peaks.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def group_peaks_native(joint_list: np.ndarray,
                       heat_up_shape: Tuple[int, int],
                       paf_up: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the native assembler.

    joint_list: (N, 5) float32 [x, y, score, id, part], upsampled coords.
    Returns (subset (P, 20), peaks (N, 4) [x, y, score, part]).
    """
    lib = _load()
    joint_list = np.ascontiguousarray(joint_list, dtype=np.float32)
    paf_up = np.ascontiguousarray(paf_up, dtype=np.float32)
    n = joint_list.shape[0]
    ctx = lib.pafgroup_create()
    try:
        num = lib.pafgroup_process(ctx, joint_list, n, paf_up,
                                   int(heat_up_shape[0]),
                                   int(heat_up_shape[1]))
        subset = np.zeros((num, 20), dtype=np.float32)
        if num:
            lib.pafgroup_get_subset(ctx, subset)
        peaks = np.zeros((max(n, 1), 4), dtype=np.float32)
        got = lib.pafgroup_get_peaks(ctx, peaks)
        return subset, peaks[:got]
    finally:
        lib.pafgroup_destroy(ctx)
