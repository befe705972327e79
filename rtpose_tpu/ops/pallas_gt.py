"""Pallas TPU kernel for ground-truth heatmap/PAF synthesis.

The XLA device path (data/gt.py _device_impl) is a lax.scan over a fixed
MAX_PEOPLE=32 persons whose (75, gy, gx) carry round-trips HBM every step
and which always pays for 32 persons even though COCO images average ~4.
This kernel keeps all accumulators in VMEM for the whole image and runs a
*dynamic* per-image person loop (scalar-prefetched counts), so a 3-person
image does 3 iterations — measured round 2 on the v5e: 52 ms -> ~6 ms per
72-image batch at 46x46 (see SCALING.md).

Per-person/per-limb scalars (unit vectors, bounding boxes, validity) are
precomputed with ordinary XLA ops on (B, 19, N) arrays — bit-identical
expressions to the scan path — and the kernel does only the heavy
(19, grid) broadcast work: gaussian accumulation (reference
lib/datasets/heatmap.py:20-36 semantics) and masked unit-vector
accumulation with overlap-count averaging (reference
lib/datasets/paf.py:18-68).  Parity with the numpy host oracle is covered
by tests/test_gt.py and on hardware by rtpose_tpu.selftest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..skeleton import LIMBS, NUM_LIMBS, NUM_PARTS

LN100 = 4.6052          # gaussian support cutoff (reference heatmap.py:30)
_PAD_COORD = -1e6       # pad-lane coordinate: fails every mask test

# Every per-row array in the kernel is 19 rows: 19 limbs for the PAF work
# and 18 parts + 1 pad/background row for the heat work (NUM_LIMBS ==
# NUM_PARTS + 1 == 19 in the COCO skeleton) — one uniform sublane extent.

_LIMB_A = np.array([l[0] for l in LIMBS])
_LIMB_B = np.array([l[1] for l in LIMBS])


def _gt_kernel(n_ref, parts_ref, limbs_ref, gxx_ref, gyy_ref,
               heat_out, pafx_out, pafy_out, *, sigma, stride, limb_width):
    """One image per grid step; accumulators live in VMEM registers.

    parts_ref: (1, 3, 19, N)  [x, y, visible] per part (row 18 all-zero pad)
    limbs_ref: (1, 9, 19, N)  [ax, ay, ux, uy, valid, mnx, mxx, mny, mxy]
    gxx/gyy_ref: (1, L) flattened grid coords (pad lanes = _PAD_COORD)
    outputs: (1, 19, L) heat (parts + background) and pafx/pafy (per limb,
    already averaged by overlap count).
    """
    i = pl.program_id(0)
    n = n_ref[i]
    L = gxx_ref.shape[-1]
    gxx = gxx_ref[:, :]                      # (1, L) grid-x
    gyy = gyy_ref[:, :]
    start = stride / 2.0 - 0.5
    xx = gxx * stride + start                # pixel coords (heatmap grid)
    yy = gyy * stride + start
    inv2s = 1.0 / (2.0 * sigma * sigma)
    zero = jnp.zeros((NUM_LIMBS, L), jnp.float32)

    N = parts_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (NUM_LIMBS, N), 1)

    def body(p, carry):
        heat, pafx, pafy, cnt = carry
        # Mosaic cannot lower a dynamic lane-dim slice (19, 1) — select the
        # person column with a one-hot multiply + lane reduce instead
        # (exact: single nonzero term), trivial at (19, N) size.
        psel = (lane == p).astype(jnp.float32)

        def col(ref_slice):
            return jnp.sum(ref_slice * psel, axis=1, keepdims=True)

        kx = col(parts_ref[0, 0])                # (19, 1)
        ky = col(parts_ref[0, 1])
        kv = col(parts_ref[0, 2])
        d2 = (xx - kx) ** 2 + (yy - ky) ** 2     # (19, L)
        expo = d2 * inv2s
        g = jnp.where((expo <= LN100) & (kv > 0.5), jnp.exp(-expo), 0.0)
        heat = heat + g

        ax = col(limbs_ref[0, 0])                # (19, 1) in grid units
        ay = col(limbs_ref[0, 1])
        ux = col(limbs_ref[0, 2])
        uy = col(limbs_ref[0, 3])
        lv = col(limbs_ref[0, 4])
        mnx = col(limbs_ref[0, 5])
        mxx = col(limbs_ref[0, 6])
        mny = col(limbs_ref[0, 7])
        mxy = col(limbs_ref[0, 8])
        perp = jnp.abs((gxx - ax) * uy - (gyy - ay) * ux)
        m = ((perp < limb_width) & (gxx >= mnx) & (gxx < mxx)
             & (gyy >= mny) & (gyy < mxy) & (lv > 0.5))
        pafx = pafx + jnp.where(m, ux, 0.0)
        pafy = pafy + jnp.where(m, uy, 0.0)
        cnt = cnt + m.astype(jnp.float32)
        return heat, pafx, pafy, cnt

    heat, pafx, pafy, cnt = jax.lax.fori_loop(
        0, n, body, (zero, zero, zero, zero))

    # background channel replaces the all-zero pad row 18
    # (reference datasets.py:304-307)
    rowmax = jnp.max(heat, axis=0, keepdims=True)        # parts are >= 0
    bg = jnp.maximum(1.0 - rowmax, 0.0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (NUM_LIMBS, L), 0)
    heat_out[0] = jnp.where(ridx == NUM_PARTS, bg, jnp.minimum(heat, 1.0))
    div = jnp.maximum(cnt, 1.0)
    pafx_out[0] = pafx / div
    pafy_out[0] = pafy / div


@functools.lru_cache(maxsize=None)
def _grid_coords(grid_y: int, grid_x: int):
    """Flattened (1, L) grid coords, lane-padded to a multiple of 128."""
    area = grid_y * grid_x
    L = -(-area // 128) * 128
    gxx = np.full((1, L), _PAD_COORD, np.float32)
    gyy = np.full((1, L), _PAD_COORD, np.float32)
    idx = np.arange(area)
    gxx[0, :area] = idx % grid_x
    gyy[0, :area] = idx // grid_x
    return gxx, gyy


def gt_maps_pallas(keypoints, *, grid_y: int, grid_x: int, stride: int,
                   sigma: float, limb_width: float = 1.0,
                   interpret: bool = False):
    """Batched GT synthesis: (B, N, 18, 3) -> ((B,gy,gx,19), (B,gy,gx,38)).

    Same contract and output values as data/gt.py ground_truth_maps_batch.
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    B, N = kp.shape[0], kp.shape[1]
    vis = (kp[..., 2] > 0.5).astype(jnp.float32)         # (B, N, 18)

    # dynamic person-loop bound: 1 + index of the last visible person
    # (robust to invalid rows in the middle of the padding)
    any_v = jnp.any(vis > 0.5, axis=-1)                  # (B, N)
    n = jnp.max(jnp.where(any_v, jnp.arange(1, N + 1), 0),
                axis=-1).astype(jnp.int32)               # (B,)

    # parts: (B, 3, 19, N); part row 18 is all-zero padding
    parts = jnp.stack([kp[..., 0], kp[..., 1], vis], axis=1)  # (B,3,N,18)
    parts = jnp.swapaxes(parts, -1, -2)                       # (B,3,18,N)
    parts = jnp.pad(parts, ((0, 0), (0, 0), (0, 1), (0, 0)))

    # limb scalars (grid units) — the exact expressions of the scan path
    # (data/gt.py _device_impl body)
    ax = kp[:, :, _LIMB_A, 0] / stride                   # (B, N, 19)
    ay = kp[:, :, _LIMB_A, 1] / stride
    bx = kp[:, :, _LIMB_B, 0] / stride
    by = kp[:, :, _LIMB_B, 1] / stride
    both = (vis[:, :, _LIMB_A] > 0.5) & (vis[:, :, _LIMB_B] > 0.5)
    vx = bx - ax
    vy = by - ay
    norm = jnp.sqrt(vx * vx + vy * vy)
    lv = (both & (norm > 0)).astype(jnp.float32)
    un = jnp.maximum(norm, 1e-12)
    ux = vx / un
    uy = vy / un
    mnx = jnp.round(jnp.minimum(ax, bx) - limb_width)
    mxx = jnp.round(jnp.maximum(ax, bx) + limb_width)
    mny = jnp.round(jnp.minimum(ay, by) - limb_width)
    mxy = jnp.round(jnp.maximum(ay, by) + limb_width)
    limbs = jnp.stack([ax, ay, ux, uy, lv, mnx, mxx, mny, mxy], axis=1)
    limbs = jnp.swapaxes(limbs, -1, -2)                  # (B, 9, 19, N)

    gxx, gyy = _grid_coords(grid_y, grid_x)
    L = gxx.shape[-1]
    area = grid_y * grid_x

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, NUM_LIMBS, N), lambda i, n_ref: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, NUM_LIMBS, N), lambda i, n_ref: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NUM_LIMBS, L), lambda i, n_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_LIMBS, L), lambda i, n_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_LIMBS, L), lambda i, n_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_gt_kernel, sigma=float(sigma),
                               stride=float(stride),
                               limb_width=float(limb_width))
    out_shape = [jax.ShapeDtypeStruct((B, NUM_LIMBS, L), jnp.float32)] * 3
    heat, pafx, pafy = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=B * N * NUM_LIMBS * L * 30,
            bytes_accessed=B * NUM_LIMBS * L * 4 * 3,
            transcendentals=B * N * NUM_LIMBS * L,
        ),
        interpret=interpret,
    )(n, parts, limbs, jnp.asarray(gxx), jnp.asarray(gyy))

    heat = heat[..., :area].reshape(B, NUM_LIMBS, grid_y, grid_x)
    heat = jnp.moveaxis(heat, 1, -1)                     # (B, gy, gx, 19)
    paf = jnp.stack([pafx[..., :area], pafy[..., :area]], axis=2)
    paf = paf.reshape(B, 2 * NUM_LIMBS, grid_y, grid_x)
    paf = jnp.moveaxis(paf, 1, -1)                       # (B, gy, gx, 38)
    return heat, paf
