"""On-device peak NMS with sub-pixel refinement (XLA, fixed shapes).

TPU-native re-expression of the host NMS (reference
lib/utils/paf_to_pose.py:67-145):

- local maxima under a 4-connected footprint above threshold: one
  `lax.reduce_window` max + compare — no scipy.
- top-K peaks per part (fixed K) with a validity mask instead of ragged
  per-part lists.
- sub-pixel refinement: the reference upsamples a clipped 5x5 patch around
  each peak with cv2 INTER_CUBIC (A=-0.75) x8 and takes the argmax.  Here
  that becomes two tiny matmuls per peak with precomputed interpolation
  matrices (one per possible clipped patch height 3/4/5), vmapped over all
  peaks — identical values to cv2's float path, verified in
  tests/test_peaks_device.py.

All outputs are fixed-shape arrays: x/y int32 coords in the upsampled frame
(float coords truncated, matching the C++ Peak struct int cast,
reference pafprocess.cpp:30-32), float scores, bool validity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..skeleton import NUM_PARTS

_WIN = 2          # 5x5 patch, reference paf_to_pose.py:100
_PATCH = 2 * _WIN + 1


@dataclasses.dataclass
class Peaks:
    """Fixed-shape per-part peak set.  All arrays (num_parts, K) except
    `truncated`, a scalar bool: True when some part had more above-threshold
    local maxima than K (the fixed cap silently dropped peaks — raise
    max_peaks and re-run; the reference keeps unbounded per-part lists,
    lib/pafprocess/pafprocess.cpp:24-43)."""
    x: jax.Array        # int32, upsampled-frame column (truncated)
    y: jax.Array        # int32, upsampled-frame row (truncated)
    xf: jax.Array       # float32 refined column (pre-truncation)
    yf: jax.Array       # float32 refined row
    score: jax.Array    # float32 refined peak score
    valid: jax.Array    # bool
    truncated: jax.Array  # bool scalar


jax.tree_util.register_pytree_node(
    Peaks,
    lambda p: ((p.x, p.y, p.xf, p.yf, p.score, p.valid, p.truncated), None),
    lambda _, c: Peaks(*c),
)


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """cv2 bicubic (Catmull-Rom family, A=-0.75) weights for fraction t.

    Returns (..., 4) weights for taps at offsets (-1, 0, 1, 2).
    """
    A = -0.75
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    tt = 1 - t
    w2 = ((A + 2) * tt - (A + 3)) * tt * tt + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=None)
def _interp_matrices(factor: int) -> np.ndarray:
    """(3, PATCH*factor, PATCH) matrices M[p] for patch extents 3/4/5.

    Upsampling a length-`n` patch by `factor` evaluates output index i at
    source coordinate (i + 0.5)/factor - 0.5 with 4 bicubic taps, indices
    clamped to [0, n-1] (cv2 border replication).  M[p][i, r] accumulates
    the tap weights that land on source row r for extent n = p + 3.
    Rows i >= n*factor are invalid (masked downstream).
    """
    out = np.zeros((3, _PATCH * factor, _PATCH), dtype=np.float32)
    i = np.arange(_PATCH * factor)
    src = (i + 0.5) / factor - 0.5
    f = np.floor(src).astype(np.int64)
    t = src - f
    w = _cubic_weights(t)  # (len, 4)
    for p, n in enumerate((3, 4, 5)):
        for k in range(4):
            r = np.clip(f - 1 + k, 0, n - 1)
            np.add.at(out[p], (i, r), w[:, k])
        out[p, n * factor:, :] = 0.0
    return out


@functools.lru_cache(maxsize=None)
def _blur_matrices(factor: int, sigma: float = 3.0,
                   truncate: float = 4.0) -> np.ndarray:
    """(3, PATCH*factor, PATCH*factor) separable-Gaussian blur matrices.

    B[p] acts on an upsampled patch of extent n = (p+3)*factor exactly like
    scipy.ndimage.gaussian_filter(..., sigma, mode='reflect') along one
    axis (the reference's optional NMS smoothing, paf_to_pose.py:121-122,
    default-off upstream).  The blur is linear, so the matrix IS the
    operator: kernel w_i ~ exp(-i^2/(2 sigma^2)) normalized, radius
    int(truncate*sigma + 0.5), indices reflected at the true patch
    boundary (d c b a | a b c d | d c b a).  Rows/cols >= n are zeroed so
    the padded invalid region neither leaks in nor out.
    """
    r = int(truncate * sigma + 0.5)
    k = np.arange(-r, r + 1, dtype=np.float64)
    w = np.exp(-0.5 * (k / sigma) ** 2)
    w /= w.sum()
    size = _PATCH * factor
    out = np.zeros((3, size, size), dtype=np.float32)
    for p, e in enumerate((3, 4, 5)):
        n = e * factor
        idx = np.arange(n)[:, None] + k[None, :].astype(np.int64)  # (n, 2r+1)
        # scipy 'reflect' (a a b c | period-2n sawtooth): -1 -> 0, n -> n-1
        idx = np.mod(idx, 2 * n)
        idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
        for j in range(2 * r + 1):
            np.add.at(out[p], (np.arange(n), idx[:, j]), w[j])
    return out


def find_peak_mask(heat: jax.Array, thresh: float) -> jax.Array:
    """4-connected local-max mask (reference paf_to_pose.py:25-38).

    heat: (..., H, W).  scipy's maximum_filter uses reflect padding; -inf
    padding is equivalent here because the center pixel is in the footprint
    (max >= center always; border reflection only re-adds in-bounds values).
    """
    # 4-connected footprint (not the full 3x3): build the neighbor cross
    # from shifts; -inf padding is equivalent to scipy's reflect mode here
    # because a reflected border neighbor equals the center pixel, which
    # never breaks the `center >= neighbors` test.
    up = jnp.pad(heat, [(0, 0)] * (heat.ndim - 2) + [(1, 0), (0, 0)],
                 constant_values=-jnp.inf)[..., :-1, :]
    down = jnp.pad(heat, [(0, 0)] * (heat.ndim - 2) + [(0, 1), (0, 0)],
                   constant_values=-jnp.inf)[..., 1:, :]
    left = jnp.pad(heat, [(0, 0)] * (heat.ndim - 2) + [(0, 0), (1, 0)],
                   constant_values=-jnp.inf)[..., :, :-1]
    right = jnp.pad(heat, [(0, 0)] * (heat.ndim - 2) + [(0, 0), (0, 1)],
                    constant_values=-jnp.inf)[..., :, 1:]
    cross_max = jnp.maximum(jnp.maximum(up, down),
                            jnp.maximum(left, right))
    return (heat >= cross_max) & (heat > thresh)


def _refine(heat_part: jax.Array, py: jax.Array, px: jax.Array,
            factor: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sub-pixel refinement of one peak on one (H, W) map.

    Returns (xf, yf, score) in the upsampled frame
    (reference paf_to_pose.py:106-141).
    """
    H, W = heat_part.shape
    y_min = jnp.maximum(0, py - _WIN)
    y_max = jnp.minimum(H - 1, py + _WIN)
    x_min = jnp.maximum(0, px - _WIN)
    x_max = jnp.minimum(W - 1, px + _WIN)
    ph = y_max - y_min + 1
    pw = x_max - x_min + 1

    ry = jnp.arange(_PATCH)
    rx = jnp.arange(_PATCH)
    rows = jnp.clip(y_min + ry, 0, H - 1)
    cols = jnp.clip(x_min + rx, 0, W - 1)
    patch = heat_part[rows[:, None], cols[None, :]]
    patch = jnp.where((ry[:, None] < ph) & (rx[None, :] < pw), patch, 0.0)

    mats = jnp.asarray(_interp_matrices(factor))   # (3, P*f, P)
    My = mats[ph - 3]                              # (P*f, P)
    Mx = mats[pw - 3]
    # Precision.HIGHEST: the TPU default would run these fp32 matmuls as a
    # single bf16 MXU pass, breaking cv2-bicubic parity by ~1e-3
    up = jnp.matmul(jnp.matmul(My, patch,
                               precision=jax.lax.Precision.HIGHEST),
                    Mx.T, precision=jax.lax.Precision.HIGHEST)

    n = _PATCH * factor
    iy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    valid = (iy < ph * factor) & (ix < pw * factor)
    up_masked = jnp.where(valid, up, -jnp.inf)
    flat_idx = jnp.argmax(up_masked.reshape(-1))
    my = flat_idx // n
    mx = flat_idx % n
    score = up.reshape(-1)[flat_idx]

    # Row-major first-max parity with numpy argmax on the (ph*f, pw*f)
    # array: masking preserves row-major order of valid entries.
    cy = (py - y_min + 0.5) * factor - 0.5
    cx = (px - x_min + 0.5) * factor - 0.5
    yf = (py + 0.5) * factor - 0.5 + (my - cy)
    xf = (px + 0.5) * factor - 0.5 + (mx - cx)
    return xf, yf, score


def _refine_onehot(heat: jax.Array, py: jax.Array, px: jax.Array,
                   factor: int, gaussian_filt: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched sub-pixel refinement of all peaks at once, gather-free.

    Identical math to :func:`_refine` but reformulated for the TPU: the
    per-peak 5x5 patch extraction becomes two one-hot contractions (row
    selector x heat x column selector) and the bicubic upsample becomes a
    batched einsum with one-hot-selected interpolation matrices.  One-hot
    weights are exactly 0/1, so at Precision.HIGHEST every output value is
    bit-identical to the gather formulation (same trick as the PAF-sampling
    einsum, ops/grouping.py) — but without the per-peak dynamic-index
    gathers that dominate decode latency on TPU.

    heat: (P, H, W); py/px: (P, K) int32.  Returns (xf, yf, score), (P, K).
    """
    P, H, W = heat.shape
    K = py.shape[1]
    hi = jax.lax.Precision.HIGHEST

    y_min = jnp.maximum(0, py - _WIN)
    y_max = jnp.minimum(H - 1, py + _WIN)
    x_min = jnp.maximum(0, px - _WIN)
    x_max = jnp.minimum(W - 1, px + _WIN)
    ph = y_max - y_min + 1                               # (P, K) in 3..5
    pw = x_max - x_min + 1

    r = jnp.arange(_PATCH)
    rows = jnp.clip(y_min[..., None] + r, 0, H - 1)      # (P, K, 5)
    cols = jnp.clip(x_min[..., None] + r, 0, W - 1)
    rsel = ((rows[..., None] == jnp.arange(H)) &
            (r[:, None] < ph[..., None, None])).astype(heat.dtype)
    csel = ((cols[..., None] == jnp.arange(W)) &
            (r[:, None] < pw[..., None, None])).astype(heat.dtype)
    patch = jnp.einsum("pkrh,phw->pkrw", rsel, heat, precision=hi)
    patch = jnp.einsum("pkrw,pkcw->pkrc", patch, csel, precision=hi)

    mats = jnp.asarray(_interp_matrices(factor))         # (3, P*f, 5)
    ysel = (ph[..., None] - 3 == jnp.arange(3)).astype(heat.dtype)
    xsel = (pw[..., None] - 3 == jnp.arange(3)).astype(heat.dtype)
    My = jnp.einsum("pki,ifr->pkfr", ysel, mats, precision=hi)
    Mx = jnp.einsum("pki,igc->pkgc", xsel, mats, precision=hi)
    up = jnp.einsum("pkfr,pkrc->pkfc", My, patch, precision=hi)
    up = jnp.einsum("pkfc,pkgc->pkfg", up, Mx, precision=hi)

    if gaussian_filt:
        # optional sigma=3 smoothing of the upsampled patch (reference
        # paf_to_pose.py:121-122); argmax AND score then come from the
        # filtered map, like the reference
        blur = jnp.asarray(_blur_matrices(factor))       # (3, n, n)
        By = jnp.einsum("pki,ifg->pkfg", ysel, blur, precision=hi)
        Bx = jnp.einsum("pki,ifg->pkfg", xsel, blur, precision=hi)
        up = jnp.einsum("pkfr,pkrc->pkfc", By, up, precision=hi)
        up = jnp.einsum("pkfc,pkgc->pkfg", up, Bx, precision=hi)

    n = _PATCH * factor
    iy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    valid = ((iy < ph[..., None, None] * factor) &
             (ix < pw[..., None, None] * factor))
    up_masked = jnp.where(valid, up, -jnp.inf)
    flat_idx = jnp.argmax(up_masked.reshape(P, K, -1), axis=-1)
    my = flat_idx // n
    mx = flat_idx % n
    # the argmax cell is always inside the valid region (ph, pw >= 3), so
    # the unmasked value there equals the masked max — no gather needed
    score = jnp.max(up_masked.reshape(P, K, -1), axis=-1)

    cy = (py - y_min + 0.5) * factor - 0.5
    cx = (px - x_min + 0.5) * factor - 0.5
    yf = (py + 0.5) * factor - 0.5 + (my - cy)
    xf = (px + 0.5) * factor - 0.5 + (mx - cx)
    return xf, yf, score


def _gather_patch(heat_part: jax.Array, py: jax.Array, px: jax.Array):
    """Clipped 5x5 window + extents for one peak (invalid cells zeroed)."""
    H, W = heat_part.shape
    y_min = jnp.maximum(0, py - _WIN)
    y_max = jnp.minimum(H - 1, py + _WIN)
    x_min = jnp.maximum(0, px - _WIN)
    x_max = jnp.minimum(W - 1, px + _WIN)
    ph = y_max - y_min + 1
    pw = x_max - x_min + 1
    ry = jnp.arange(_PATCH)
    rx = jnp.arange(_PATCH)
    rows = jnp.clip(y_min + ry, 0, H - 1)
    cols = jnp.clip(x_min + rx, 0, W - 1)
    patch = heat_part[rows[:, None], cols[None, :]]
    patch = jnp.where((ry[:, None] < ph) & (rx[None, :] < pw), patch, 0.0)
    return patch, ph, pw, y_min, x_min


def _refine_pallas(heat: jax.Array, py: jax.Array, px: jax.Array,
                   factor: int, interpret: bool):
    """Refinement via the fused pallas kernel (ops/pallas_kernels.py)."""
    from .pallas_kernels import bicubic_refine
    P, K = py.shape
    gfn = jax.vmap(jax.vmap(_gather_patch, in_axes=(None, 0, 0)),
                   in_axes=(0, 0, 0))
    patch, ph, pw, y_min, x_min = gfn(heat, py, px)
    my, mx, score = bicubic_refine(
        patch.reshape(P * K, _PATCH, _PATCH), ph.reshape(-1),
        pw.reshape(-1), factor=factor, interpret=interpret)
    my = my.reshape(P, K)
    mx = mx.reshape(P, K)
    score = score.reshape(P, K)
    cy = (py - y_min + 0.5) * factor - 0.5
    cx = (px - x_min + 0.5) * factor - 0.5
    yf = (py + 0.5) * factor - 0.5 + (my - cy)
    xf = (px + 0.5) * factor - 0.5 + (mx - cx)
    return xf, yf, score


def nms(heatmaps: jax.Array, *, factor: int = 8, thresh: float = 0.1,
        max_peaks: int = 32, refine: bool = True,
        use_pallas: bool = False, pallas_interpret: bool = False,
        gaussian_filt: bool = False) -> Peaks:
    """Fixed-shape NMS over (H, W, C>=num_parts) heatmaps.

    Top-`max_peaks` per part by score (the reference keeps all peaks;
    images essentially never exceed ~20 per part).  `use_pallas` routes
    sub-pixel refinement through the fused pallas kernel.
    `gaussian_filt` applies the reference's optional sigma=3 smoothing of
    the upsampled refine patch (paf_to_pose.py:121-122, default off there
    too); it forces the one-hot refine path.
    """
    heat = jnp.moveaxis(heatmaps[..., :NUM_PARTS], -1, 0)  # (parts, H, W)
    H, W = heat.shape[-2:]
    mask = find_peak_mask(heat, thresh)
    # truncation signal: a part with more local maxima than K loses peaks
    n_found = jnp.sum(mask.reshape(NUM_PARTS, -1), axis=-1)
    truncated = jnp.any(n_found > max_peaks)
    masked = jnp.where(mask, heat, -jnp.inf)
    flat = masked.reshape(NUM_PARTS, H * W)
    scores0, idx = jax.lax.top_k(flat, max_peaks)      # (parts, K)
    py = (idx // W).astype(jnp.int32)
    px = (idx % W).astype(jnp.int32)
    valid = scores0 > thresh
    # Re-sort each part's surviving peaks into row-major (y, x) order
    # (invalid slots pushed last) so slot ids — and therefore candidate
    # enumeration order and greedy tie-breaks downstream — match the
    # reference's scan order (lib/utils/paf_to_pose.py:25-38 enumerates
    # np.nonzero row-major; pafprocess.cpp:24-43 buckets in that order).
    # top_k emits score order, which greedy-orders near-equal candidates
    # differently than the C++ when scores tie within fp noise.
    key = jnp.where(valid, py * W + px, H * W)
    _, scores0, py, px, valid = jax.lax.sort(
        (key, scores0, py, px, valid), num_keys=1, is_stable=True)

    if refine and use_pallas and not gaussian_filt:
        xf, yf, score = _refine_pallas(heat, py, px, factor,
                                       pallas_interpret)
    elif refine:
        xf, yf, score = _refine_onehot(heat, py, px, factor,
                                       gaussian_filt=gaussian_filt)
    else:
        xf = (px + 0.5) * factor - 0.5
        yf = (py + 0.5) * factor - 0.5
        score = scores0

    xf = jnp.where(valid, xf, 0.0)
    yf = jnp.where(valid, yf, 0.0)
    score = jnp.where(valid, score, 0.0)
    return Peaks(x=xf.astype(jnp.int32), y=yf.astype(jnp.int32),
                 xf=xf, yf=yf, score=score, valid=valid,
                 truncated=truncated)
