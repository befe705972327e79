"""Pallas TPU kernels for the pose decode hot path.

`paf_sample_scores` fuses the hottest decode stage — the 10-point PAF
line-integral sampling (reference pafprocess.cpp:220-238 semantics, the
one-hot-contraction formulation of ops/grouping.py) — into one kernel per
(pair) grid step: the one-hot row/column selectors, the (46, K*K) sample
matrices, and the per-sample score accumulators all live in VMEM and
never touch HBM.  The XLA scan path materializes ~(B,19,K,K,46) one-hot
and row intermediates in HBM every sample step; measured round 2 on the
v5e that makes scoring 0.69 ms/img of the 1.35 ms/img decode.

`bicubic_refine` fuses the NMS sub-pixel refinement (see ops/peaks.py
_refine).  Measured round 2: 0.45 ms/img vs 0.055 for the batched
one-hot-einsum XLA path (ops/peaks.py _refine_onehot) — XLA wins there
decisively (this kernel's host-side patch extraction still pays the
per-peak gathers), so the XLA path stays the default and this kernel is
kept only as a reference pattern.

Falls back to interpret mode off-TPU; tests/test_pallas_kernels.py checks
bit-parity against the XLA paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .peaks import _PATCH, _interp_matrices


_BLK = 8   # peaks per grid step (Mosaic wants 8-divisible sublane blocks)


def _refine_kernel(ext_ref, patches_ref, mats_ref, out_ref):
    """_BLK peaks per grid step.

    ext_ref: scalar-prefetch (n, 2) int32 [ph-3, pw-3]
    patches_ref: (_BLK, PATCH, PATCH) f32 block
    mats_ref: (3 * PATCH*f, PATCH) f32 — stacked interpolation matrices
    out_ref: (_BLK, 4) f32 rows [my, mx, score, 0]
    """
    i = pl.program_id(0)
    n = mats_ref.shape[0] // 3          # PATCH * factor
    f = n // _PATCH
    iy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    for j in range(_BLK):
        phi = ext_ref[i * _BLK + j, 0]
        pwi = ext_ref[i * _BLK + j, 1]
        My = mats_ref[pl.ds(phi * n, n), :]         # (n, PATCH)
        Mx = mats_ref[pl.ds(pwi * n, n), :]
        patch = patches_ref[j]                       # (PATCH, PATCH)
        # HIGHEST precision: fp32-exact MXU passes (cv2-bicubic parity)
        up = jnp.dot(
            jnp.dot(My, patch, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32),
            Mx.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)   # (n, n)

        valid = (iy < (phi + 3) * f) & (ix < (pwi + 3) * f)
        masked = jnp.where(valid, up, -jnp.inf)
        gmax = jnp.max(masked)
        big = n * n
        flat = jnp.min(jnp.where(masked >= gmax, iy * n + ix, big))
        my = flat // n
        mx = flat % n
        out_ref[j, 0] = my.astype(jnp.float32)
        out_ref[j, 1] = mx.astype(jnp.float32)
        # score = unmasked patch value at the argmax (XLA-path parity);
        # vector select instead of dynamic_slice (not lowerable on TPU)
        score = jnp.max(jnp.where((iy == my) & (ix == mx), up, -jnp.inf))
        out_ref[j, 2] = score
        out_ref[j, 3] = 0.0


try:  # pallas import kept lazy-safe for environments without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK


# ---------------------------------------------------------------------------
# Fused PAF line-integral sampling
# ---------------------------------------------------------------------------

_STEP_PAF = 10
_THRESH_VECTOR_SCORE = 0.05


def _make_paf_scores_kernel(factor: int):
    def kernel(pafcat_ref, geo_ref, cnt_ref, sum_ref):
        cnt, ssum = _paf_scores_pair(pafcat_ref[0], geo_ref[0], factor)
        cnt_ref[0] = cnt
        sum_ref[0] = ssum
    return kernel


def _make_paf_scores_fused_kernel(factor: int, n_pairs: int):
    def kernel(pafcat_ref, geo_ref, cnt_ref, sum_ref):
        # all pairs in ONE grid step: per-pair accumulation order is
        # unchanged (bit-parity with the per-pair kernel), but the grid
        # shrinks B*19 -> B so the per-step dispatch latency amortizes
        for p in range(n_pairs):
            cnt, ssum = _paf_scores_pair(pafcat_ref[p], geo_ref[p], factor)
            cnt_ref[p] = cnt
            sum_ref[p] = ssum
    return kernel


def _paf_scores_pair(pafcat, geo, factor):
    """Score all C candidates of one limb pair.

    pafcat: (2W, H) f32 — the pair's transposed x-PAF plane stacked on its
        y-plane (row index = grid column q, col index = grid row r).  Both
        components share the SAME one-hot rhs (they sample the same cell),
        and 2W = 92 rows still fit one 128-row MXU tile at rtpose sizes —
        stacking makes the y-component matmul free (round-4 measurement:
        the kernel is matmul-bound, not grid-step-bound).
    geo: (6, C) f32 rows [ax, ay, step_x, step_y, ux, uy]
    Returns (cnt, ssum), each (1, C) f32.

    Numerics: sc folds ux*px + uy*py into one weighted reduce over the 2W
    rows.  Only two addends are nonzero (the selected x-row and y-row) and
    fp32 addition of exact zeros is exact, so sc is bit-equal to the
    two-matmul form (up to +/-0.0, which compares equal everywhere).
    """
    w2, h = pafcat.shape
    w = w2 // 2
    c = geo.shape[1]
    ax = geo[0:1, :]          # (1, C)
    ay = geo[1:2, :]
    step_x = geo[2:3, :]
    step_y = geo[3:4, :]
    ux = geo[4:5, :]
    uy = geo[5:6, :]

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)
    iota_w2 = jax.lax.broadcasted_iota(jnp.int32, (w2, c), 0)
    # per-row weight: ux for the x-plane rows, uy for the y-plane rows
    uxy = jnp.where(iota_w2 < w, jnp.broadcast_to(ux, (w2, c)),
                    jnp.broadcast_to(uy, (w2, c)))          # (2W, C)
    cnt = jnp.zeros((1, c), jnp.float32)
    ssum = jnp.zeros((1, c), jnp.float32)
    for s in range(_STEP_PAF):
        # int(ax + s*(dx/10) + 0.5), C++ truncation (pafprocess.cpp:223-241)
        sf = jnp.float32(s)
        lx = (ax + sf * step_x + 0.5).astype(jnp.int32)
        ly = (ay + sf * step_y + 0.5).astype(jnp.int32)
        gx = jnp.clip(lx // factor, 0, w - 1)  # nearest-up == idx division
        gy = jnp.clip(ly // factor, 0, h - 1)
        yoh = (iota_h == gy).astype(jnp.float32)          # (H, C)
        # one-hot row selection as an fp32-exact MXU pass (0/1 weights);
        # one matmul covers both components
        rowcat = jnp.dot(pafcat, yoh, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # (2W, C)
        xoh2 = ((iota_w2 == gx) | (iota_w2 == gx + w)).astype(jnp.float32)
        sc = jnp.sum(rowcat * xoh2 * uxy, axis=0, keepdims=True)  # (1, C)
        cnt = cnt + (sc > _THRESH_VECTOR_SCORE).astype(jnp.float32)
        ssum = ssum + sc
    return cnt, ssum


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def paf_sample_scores(pafxt: jax.Array, pafyt: jax.Array, geo: jax.Array,
                      *, factor: int = 8, interpret: bool = None):
    """Fused 10-sample PAF scoring for one image.

    pafxt / pafyt: (P, W, H) f32 — per-pair transposed PAF planes.
    geo: (P, 6, C) f32 — per-candidate [ax, ay, step_x, step_y, ux, uy]
        in upsampled-frame coordinates (C = K*K flattened candidates).
    Returns (cnt, ssum): each (P, C) f32 — per-candidate count of samples
    above THRESH_VECTOR_SCORE and the sequential fp32 sample-score sum.
    `interpret=None` auto-selects interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, W, H = pafxt.shape
    C = geo.shape[2]
    pafcat = jnp.concatenate([pafxt, pafyt], axis=1)       # (P, 2W, H)
    grid_spec = pl.GridSpec(
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 2 * W, H), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, C), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    cnt, ssum = pl.pallas_call(
        _make_paf_scores_kernel(factor),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((P, 1, C), jnp.float32)],
        interpret=interpret,
    )(pafcat, geo)
    return cnt[:, 0], ssum[:, 0]


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def paf_sample_scores_fused(pafxt: jax.Array, pafyt: jax.Array,
                            geo: jax.Array, *, factor: int = 8,
                            interpret: bool = None):
    """`paf_sample_scores` with all P pairs in one grid step.

    Same inputs/outputs and bit-identical per-pair accumulation; only the
    grid shape differs: (1,) instead of (P,), so a vmapped batch runs B
    sequential grid steps instead of B*P.  Measured round 4 on the v5e the
    per-pair kernel is per-step-latency-bound (~22 us/step at B=64, tiny
    46-row matmuls); fusing the pair loop amortizes that dispatch latency.
    VMEM: all P planes + geo + outputs resident at once (~1.5 MB at K=32,
    ~3.4 MB at K=64, 46x46 planes) — comfortably under the 16 MB budget.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, W, H = pafxt.shape
    C = geo.shape[2]
    pafcat = jnp.concatenate([pafxt, pafyt], axis=1)       # (P, 2W, H)
    grid_spec = pl.GridSpec(
        grid=(1,),
        in_specs=[
            pl.BlockSpec((P, 2 * W, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 6, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    cnt, ssum = pl.pallas_call(
        _make_paf_scores_fused_kernel(factor, P),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((P, 1, C), jnp.float32)],
        interpret=interpret,
    )(pafcat, geo)
    return cnt[:, 0], ssum[:, 0]


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def bicubic_refine(patches: jax.Array, ph: jax.Array, pw: jax.Array, *,
                   factor: int = 8, interpret: bool = False):
    """Fused refine for a flat batch of peak patches.

    patches: (n, PATCH, PATCH) f32 — clipped windows, invalid rows/cols
        zero-filled (they receive zero interpolation weight).
    ph, pw: (n,) int32 patch extents in [3, 5].
    Returns (my, mx, score): int32, int32, f32 each (n,).
    """
    n_peaks = patches.shape[0]
    n_pad = -(-n_peaks // _BLK) * _BLK
    if n_pad != n_peaks:
        patches = jnp.pad(patches, ((0, n_pad - n_peaks), (0, 0), (0, 0)))
        ph = jnp.pad(ph, (0, n_pad - n_peaks), constant_values=3)
        pw = jnp.pad(pw, (0, n_pad - n_peaks), constant_values=3)
    mats = jnp.asarray(_interp_matrices(factor))       # (3, P*f, P)
    mats_flat = mats.reshape(3 * _PATCH * factor, _PATCH)
    ext = jnp.stack([ph - 3, pw - 3], axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK, _PATCH, _PATCH), lambda i, ext: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mats_flat.shape, lambda i, ext: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLK, 4), lambda i, ext: (i, 0),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        _refine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
    )(ext, patches, mats_flat)[:n_peaks]
    return (out[:, 0].astype(jnp.int32), out[:, 1].astype(jnp.int32),
            out[:, 2])
