"""Ground-truth heatmap / PAF synthesis.

Two implementations with identical outputs (tests/test_gt.py):

- numpy host version with the reference's exact sequential semantics
  (reference lib/datasets/heatmap.py:20-36, lib/datasets/paf.py:18-68,
  lib/datasets/datasets.py:259-308)
- a closed-form jax version, vmapped over persons/parts/limbs, for
  device-side GT synthesis (sequential clamp-at-1 accumulation equals
  min(sum, 1) for non-negative addends; the running PAF average equals
  masked-sum / count) — this keeps the input pipeline off the host CPU,
  which is the reference's throughput bottleneck (8 worker processes,
  SURVEY.md §3.1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from ..skeleton import LIMBS, NUM_HEATMAPS, NUM_LIMBS, NUM_PAF_CHANNELS, \
    NUM_PARTS

LN100 = 4.6052          # gaussian support cutoff (reference heatmap.py:30)
LIMB_WIDTH = 1.0        # PAF half width in grid units (reference paf.py:22)


# ---------------------------------------------------------------------------
# numpy host implementation (reference-exact)
# ---------------------------------------------------------------------------

def put_gaussian_map(center, accum: np.ndarray, sigma: float,
                     grid_y: int, grid_x: int, stride: int) -> np.ndarray:
    """Add one keypoint gaussian, clamping at 1 (reference heatmap.py:20-36).

    Grid sample i sits at pixel i*stride + stride/2 - 0.5.
    """
    start = stride / 2.0 - 0.5
    xx, yy = np.meshgrid(np.arange(grid_x), np.arange(grid_y))
    xx = xx * stride + start
    yy = yy * stride + start
    d2 = (xx - center[0]) ** 2 + (yy - center[1]) ** 2
    exponent = d2 / 2.0 / sigma / sigma
    g = np.where(exponent <= LN100, np.exp(-exponent), 0.0)
    out = accum + g
    return np.minimum(out, 1.0)


def put_vec_map(center_a, center_b, accum: np.ndarray, count: np.ndarray,
                grid_y: int, grid_x: int, stride: int,
                limb_width: float = LIMB_WIDTH
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Add one limb's unit-vector field with running average over overlaps
    (reference paf.py:18-68; limb_width 1.289 in the hourglass trainer,
    reference train/train_SH.py:77)."""
    a = np.asarray(center_a, float) / stride
    b = np.asarray(center_b, float) / stride
    vec = b - a
    norm = np.linalg.norm(vec)
    if norm == 0.0:
        return accum, count
    u = vec / norm

    min_x = max(int(round(min(a[0], b[0]) - limb_width)), 0)
    max_x = min(int(round(max(a[0], b[0]) + limb_width)), grid_x)
    min_y = max(int(round(min(a[1], b[1]) - limb_width)), 0)
    max_y = min(int(round(max(a[1], b[1]) + limb_width)), grid_y)
    if min_x >= max_x or min_y >= max_y:
        return accum, count

    xs = np.arange(min_x, max_x)
    ys = np.arange(min_y, max_y)
    xx, yy = np.meshgrid(xs, ys)
    ba_x = xx - a[0]
    ba_y = yy - a[1]
    dist = np.abs(ba_x * u[1] - ba_y * u[0])
    mask = dist < limb_width

    vec_map = np.zeros_like(accum)
    vec_map[yy[mask], xx[mask], 0] = u[0]
    vec_map[yy[mask], xx[mask], 1] = u[1]
    covered = (np.abs(vec_map[:, :, 0]) > 0) | (np.abs(vec_map[:, :, 1]) > 0)

    accum = accum * count[:, :, None]
    accum = accum + vec_map
    count = count + covered
    divisor = np.maximum(count, 1)
    accum = accum / divisor[:, :, None]
    return accum, count


def ground_truth_maps(keypoints: np.ndarray, *, input_y: int = 368,
                      input_x: int = 368, stride: int = 8,
                      sigma: float = 7.0, limb_width: float = LIMB_WIDTH
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(N, 18, 3) keypoints -> heatmaps (gy, gx, 19) + pafs (gy, gx, 38).

    Reference lib/datasets/datasets.py:259-308: parts with v > 0.5 get a
    gaussian; limbs with both ends v > 0.5 get a PAF; background channel is
    1 - max(parts).
    """
    gy, gx = input_y // stride, input_x // stride
    heat = np.zeros((gy, gx, NUM_HEATMAPS))
    paf = np.zeros((gy, gx, NUM_PAF_CHANNELS))
    keypoints = np.asarray(keypoints, float)

    for part in range(NUM_PARTS):
        for person in keypoints:
            if person[part, 2] > 0.5:
                heat[:, :, part] = put_gaussian_map(
                    person[part, :2], heat[:, :, part], sigma, gy, gx,
                    stride)
    for li, (a, b) in enumerate(LIMBS):
        count = np.zeros((gy, gx), dtype=np.uint32)
        for person in keypoints:
            if person[a, 2] > 0.5 and person[b, 2] > 0.5:
                paf[:, :, 2 * li:2 * li + 2], count = put_vec_map(
                    person[a, :2], person[b, :2],
                    paf[:, :, 2 * li:2 * li + 2], count, gy, gx, stride,
                    limb_width)
    heat[:, :, NUM_PARTS] = np.maximum(
        1.0 - heat[:, :, :NUM_PARTS].max(axis=2), 0.0)
    return heat, paf


# ---------------------------------------------------------------------------
# jax device implementation (closed form, batched)
# ---------------------------------------------------------------------------

def _device_impl():
    import jax
    import jax.numpy as jnp

    LIMB_A = np.array([l[0] for l in LIMBS])
    LIMB_B = np.array([l[1] for l in LIMBS])

    def gt_maps(keypoints, *, grid_y, grid_x, stride, sigma,
                limb_width=LIMB_WIDTH):
        """keypoints: (N, 18, 3) float32 (pad with v=0 rows).

        Returns (heat (gy,gx,19), paf (gy,gx,38)).

        A lax.scan over persons keeps live tensors at (parts, gy, gx) —
        materializing the (N, 19, gy, gx) broadcasts instead costs
        gigabytes of HBM traffic per 72-image batch (measured 216 ms ->
        ~5 ms after this rewrite).
        """
        start = stride / 2.0 - 0.5
        xs = jnp.arange(grid_x, dtype=jnp.float32) * stride + start
        ys = jnp.arange(grid_y, dtype=jnp.float32) * stride + start
        xx = xs[None, :]                   # (1, gx) pixel coords
        yy = ys[:, None]                   # (gy, 1)
        gxx = jnp.arange(grid_x, dtype=jnp.float32)[None, :]
        gyy = jnp.arange(grid_y, dtype=jnp.float32)[:, None]

        def body(carry, person):
            heat_acc, paf_x_acc, paf_y_acc, count = carry
            kx = person[:, 0]              # (18,)
            ky = person[:, 1]
            kv = person[:, 2] > 0.5

            # heatmaps: accumulate this person's gaussians
            d2 = ((xx[None] - kx[:, None, None]) ** 2
                  + (yy[None] - ky[:, None, None]) ** 2)   # (18, gy, gx)
            expo = d2 / (2.0 * sigma * sigma)
            g = jnp.where((expo <= LN100) & kv[:, None, None],
                          jnp.exp(-expo), 0.0)
            heat_acc = heat_acc + g

            # pafs: masked unit vectors for this person's limbs
            ax = kx[LIMB_A] / stride       # (19,)
            ay = ky[LIMB_A] / stride
            bx = kx[LIMB_B] / stride
            by = ky[LIMB_B] / stride
            lv = kv[LIMB_A] & kv[LIMB_B]
            vx = bx - ax
            vy = by - ay
            norm = jnp.sqrt(vx * vx + vy * vy)
            lv = lv & (norm > 0)
            un = jnp.maximum(norm, 1e-12)
            ux = vx / un
            uy = vy / un

            # rounded bounding box + perpendicular-distance test
            # (reference paf.py:35-46)
            min_x = jnp.round(jnp.minimum(ax, bx) - limb_width)
            max_x = jnp.round(jnp.maximum(ax, bx) + limb_width)
            min_y = jnp.round(jnp.minimum(ay, by) - limb_width)
            max_y = jnp.round(jnp.maximum(ay, by) + limb_width)

            bax = gxx[None] - ax[:, None, None]          # (19, gy, gx)
            bay = gyy[None] - ay[:, None, None]
            perp = jnp.abs(bax * uy[:, None, None]
                           - bay * ux[:, None, None])
            in_box = ((gxx[None] >= min_x[:, None, None])
                      & (gxx[None] < max_x[:, None, None])
                      & (gyy[None] >= min_y[:, None, None])
                      & (gyy[None] < max_y[:, None, None]))
            mask = (perp < limb_width) & in_box & lv[:, None, None]

            paf_x_acc = paf_x_acc + jnp.where(mask, ux[:, None, None], 0.0)
            paf_y_acc = paf_y_acc + jnp.where(mask, uy[:, None, None], 0.0)
            count = count + mask.astype(jnp.float32)
            return (heat_acc, paf_x_acc, paf_y_acc, count), None

        init = (jnp.zeros((NUM_PARTS, grid_y, grid_x)),
                jnp.zeros((NUM_LIMBS, grid_y, grid_x)),
                jnp.zeros((NUM_LIMBS, grid_y, grid_x)),
                jnp.zeros((NUM_LIMBS, grid_y, grid_x)))
        (heat_sum, paf_x, paf_y, count), _ = jax.lax.scan(
            body, init, keypoints)

        heat_parts = jnp.minimum(heat_sum, 1.0)          # (18, gy, gx)
        bg = jnp.maximum(1.0 - heat_parts.max(axis=0), 0.0)
        heat = jnp.concatenate([heat_parts, bg[None]], axis=0)

        div = jnp.maximum(count, 1.0)
        paf = jnp.stack([paf_x / div, paf_y / div], axis=1)
        paf = paf.reshape(2 * NUM_LIMBS, grid_y, grid_x)
        return (jnp.moveaxis(heat, 0, -1), jnp.moveaxis(paf, 0, -1))

    return gt_maps


@functools.lru_cache(maxsize=1)
def _get_device_fn():
    import jax
    fn = _device_impl()
    return jax.jit(fn, static_argnames=("grid_y", "grid_x", "stride",
                                        "sigma", "limb_width"))


def ground_truth_maps_device(keypoints, *, input_y: int = 368,
                             input_x: int = 368, stride: int = 8,
                             sigma: float = 7.0,
                             limb_width: float = LIMB_WIDTH):
    """Device-side GT synthesis for one sample (see module docstring)."""
    import jax.numpy as jnp
    fn = _get_device_fn()
    return fn(jnp.asarray(keypoints, jnp.float32),
              grid_y=input_y // stride, grid_x=input_x // stride,
              stride=stride, sigma=sigma, limb_width=limb_width)


@functools.lru_cache(maxsize=None)
def _get_batch_fn(grid_y, grid_x, stride, sigma, limb_width):
    import jax
    fn = _device_impl()
    return jax.jit(jax.vmap(functools.partial(
        fn, grid_y=grid_y, grid_x=grid_x, stride=stride, sigma=sigma,
        limb_width=limb_width)))


def ground_truth_maps_batch(keypoints_batch, *, input_y: int = 368,
                            input_x: int = 368, stride: int = 8,
                            sigma: float = 7.0,
                            limb_width: float = LIMB_WIDTH,
                            backend: str = "auto"):
    """Batched device GT synthesis: (B, N, 18, 3) -> (B, gy, gx, 19/38).

    backend: 'xla' (vmapped scan over persons), 'pallas' (fused VMEM kernel
    with a dynamic per-image person loop, ops/pallas_gt.py — measured
    bit-identical and ~4x faster on the v5e), or 'auto' (pallas on a
    single-device TPU process, xla otherwise — pallas_call has no GSPMD
    partitioning rule, so sharded multi-chip meshes keep the scan path).
    """
    import jax
    import jax.numpy as jnp
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and jax.device_count() == 1 else "xla")
    if backend == "pallas":
        from ..ops.pallas_gt import gt_maps_pallas
        return gt_maps_pallas(
            jnp.asarray(keypoints_batch, jnp.float32),
            grid_y=input_y // stride, grid_x=input_x // stride,
            stride=stride, sigma=sigma, limb_width=limb_width,
            interpret=jax.default_backend() != "tpu")
    bfn = _get_batch_fn(input_y // stride, input_x // stride, stride,
                        sigma, limb_width)
    return bfn(jnp.asarray(keypoints_batch, jnp.float32))
