"""In-graph bicubic map resize with cv2 float-path parity.

cv2.resize(..., INTER_CUBIC) on float inputs evaluates output pixel i at
source coordinate (i + 0.5) * src/dst - 0.5 with 4 Catmull-Rom-family taps
(A = -0.75) and border replication.  For a fixed (src, dst) pair that is a
dense linear map, so the whole 2-D resize is two matmuls — the same trick
as the NMS sub-pixel refinement (ops/peaks.py), generalized to arbitrary
(non-integer) ratios.  Used by the fused multi-scale TTA path
(infer/pipeline.py run_multiscale) to replace the reference-era host
cv2.resize round trip (reference evaluate/coco_eval.py:107 left
multi-scale unused; round-1 ran it half-hosted).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .peaks import _cubic_weights


@functools.lru_cache(maxsize=None)
def resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) dense interpolation matrix for one axis."""
    i = np.arange(dst)
    srcf = (i + 0.5) * (src / dst) - 0.5
    f = np.floor(srcf).astype(np.int64)
    t = srcf - f
    w = _cubic_weights(t)                      # (dst, 4)
    out = np.zeros((dst, src), dtype=np.float32)
    for k in range(4):
        r = np.clip(f - 1 + k, 0, src - 1)     # border replication
        np.add.at(out, (i, r), w[:, k])
    return out


@functools.lru_cache(maxsize=None)
def resize_matrix_linear(src: int, dst: int) -> np.ndarray:
    """(dst, src) dense interpolation matrix for cv2 INTER_LINEAR.

    Same pixel-center convention as the bicubic matrix but 2 taps;
    cv2's INTER_LINEAR never antialiases (even on downscale), so the
    2-tap formula is the whole operator.
    """
    i = np.arange(dst)
    srcf = (i + 0.5) * (src / dst) - 0.5
    f = np.floor(srcf).astype(np.int64)
    t = (srcf - f).astype(np.float32)
    out = np.zeros((dst, src), dtype=np.float32)
    for k, wk in ((0, 1.0 - t), (1, t)):
        r = np.clip(f + k, 0, src - 1)         # border replication
        np.add.at(out, (i, r), wk)
    return out


def resize_bilinear(maps: jax.Array, dst_hw: Tuple[int, int]) -> jax.Array:
    """(H, W, C) float maps -> (dst_h, dst_w, C), cv2 INTER_LINEAR parity
    (the interpolation crop_with_factor / the reference's cv2.resize
    default uses, im_transform.py:119-134)."""
    my = jnp.asarray(resize_matrix_linear(maps.shape[0], dst_hw[0]))
    mx = jnp.asarray(resize_matrix_linear(maps.shape[1], dst_hw[1]))
    out = jnp.einsum("ys,swc->ywc", my, maps,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("xw,ywc->yxc", mx, out,
                      precision=jax.lax.Precision.HIGHEST)


def resize_bicubic(maps: jax.Array, dst_hw: Tuple[int, int]) -> jax.Array:
    """(H, W, C) float maps -> (dst_h, dst_w, C), cv2 INTER_CUBIC parity.

    Precision.HIGHEST: the TPU default would run these fp32 matmuls as a
    single bf16 MXU pass, breaking cv2 parity (same lesson as the NMS
    refinement matmuls, commit 31b15b3).
    """
    my = jnp.asarray(resize_matrix(maps.shape[0], dst_hw[0]))
    mx = jnp.asarray(resize_matrix(maps.shape[1], dst_hw[1]))
    out = jnp.einsum("ys,swc->ywc", my, maps,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("xw,ywc->yxc", mx, out,
                      precision=jax.lax.Precision.HIGHEST)
