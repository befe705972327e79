"""Pallas TPU kernels for the pose decode hot path.

`bicubic_refine` fuses the NMS sub-pixel refinement (see ops/peaks.py
_refine): for every peak patch it upsamples the clipped 5x5 window x8 with
the cv2-parity bicubic matrices and reduces straight to
(argmax_y, argmax_x, score) — the (peaks, 40, 40) intermediate never
touches HBM.  Patch extents arrive as scalar-prefetch operands
(PrefetchScalarGridSpec) so each grid step dynamically selects the right
interpolation matrix in VMEM.

Falls back to interpret mode off-TPU; tests/test_pallas_kernels.py checks
bit-parity against the XLA path.
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
