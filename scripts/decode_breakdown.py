"""Hardware decode/GT component breakdown (batch-amortized readbacks).

Times each stage of the on-device decode path plus GT synthesis and the
pallas-vs-XLA refinement variants, to decide where the next kernel work
pays (VERDICT round-1 item 9).  Run on the TPU:

    python scripts/decode_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

BATCH = 64
ITERS = 10


def timed(fn, *args):
    r = fn(*args)
    import jax
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from rtpose_tpu.ops import grouping as G
    from rtpose_tpu.ops import peaks as P
    from rtpose_tpu.ops.decode import decode_poses
    from util_synth import synth_example

    heats, pafs = [], []
    for i in range(BATCH):
        _, h, p = synth_example(seed=i, n_people=1 + i % 6)
        heats.append(h)
        pafs.append(p)
    heat = jax.device_put(jnp.asarray(np.stack(heats)))
    paf = jax.device_put(jnp.asarray(np.stack(pafs)))

    def bat(fn):
        return jax.jit(jax.vmap(fn))

    nms_full = bat(lambda h: P.nms(h).score)
    nms_coarse = bat(lambda h: P.nms(h, refine=False).score)
    nms_pallas = bat(lambda h: P.nms(h, use_pallas=True).score)
    score_only = bat(lambda h, p: G.score_connections(
        P.nms(h), p)[0])
    score_pallas = bat(lambda h, p: G.score_connections(
        P.nms(h), p, sampling="pallas")[0])
    score_fused = bat(lambda h, p: G.score_connections(
        P.nms(h), p, sampling="pallas_fused")[0])
    full = bat(lambda h, p: decode_poses.__wrapped__(h, p).coords)
    full_pallas = bat(lambda h, p: decode_poses.__wrapped__(
        h, p, sampling="pallas").coords)
    full_fused = bat(lambda h, p: decode_poses.__wrapped__(
        h, p, sampling="pallas_fused").coords)
    full_k64 = bat(lambda h, p: decode_poses.__wrapped__(
        h, p, max_peaks=64).coords)
    full_k64_pallas = bat(lambda h, p: decode_poses.__wrapped__(
        h, p, max_peaks=64, sampling="pallas").coords)
    full_k64_fused = bat(lambda h, p: decode_poses.__wrapped__(
        h, p, max_peaks=64, sampling="pallas_fused").coords)

    ms = 1000.0 / BATCH
    t_coarse = timed(nms_coarse, heat)
    t_nms = timed(nms_full, heat)
    t_pallas = timed(nms_pallas, heat)
    t_score = timed(score_only, heat, paf)
    t_score_pl = timed(score_pallas, heat, paf)
    t_score_fu = timed(score_fused, heat, paf)
    t_full = timed(full, heat, paf)
    t_full_pl = timed(full_pallas, heat, paf)
    t_full_fu = timed(full_fused, heat, paf)
    t_full64 = timed(full_k64, heat, paf)
    t_full64_pl = timed(full_k64_pallas, heat, paf)
    t_full64_fu = timed(full_k64_fused, heat, paf)
    print(f"nms coarse (no refine):    {t_coarse*ms:7.3f} ms/img")
    print(f"nms + XLA refine:          {t_nms*ms:7.3f} ms/img "
          f"(refine = {(t_nms-t_coarse)*ms:.3f})")
    print(f"nms + pallas refine:       {t_pallas*ms:7.3f} ms/img "
          f"(refine = {(t_pallas-t_coarse)*ms:.3f})")
    print(f"nms + PAF scoring:         {t_score*ms:7.3f} ms/img "
          f"(scoring = {(t_score-t_nms)*ms:.3f})")
    print(f"nms + PAF scoring pallas:  {t_score_pl*ms:7.3f} ms/img "
          f"(scoring = {(t_score_pl-t_nms)*ms:.3f})")
    print(f"nms + PAF scoring fused:   {t_score_fu*ms:7.3f} ms/img "
          f"(scoring = {(t_score_fu-t_nms)*ms:.3f})")
    print(f"full decode:               {t_full*ms:7.3f} ms/img "
          f"(greedy+assembly = {(t_full-t_score)*ms:.3f})")
    print(f"full decode pallas:        {t_full_pl*ms:7.3f} ms/img")
    print(f"full decode pallas_fused:  {t_full_fu*ms:7.3f} ms/img")
    print(f"full decode K=64:          {t_full64*ms:7.3f} ms/img")
    print(f"full decode K=64 pallas:   {t_full64_pl*ms:7.3f} ms/img")
    print(f"full decode K=64 fused:    {t_full64_fu*ms:7.3f} ms/img")

    # GT synthesis (training path), batch 72
    from rtpose_tpu.data.gt import _device_impl
    gt_fn = _device_impl()
    kps = np.zeros((72, 32, 18, 3), np.float32)
    rng = np.random.RandomState(0)
    kps[:, :4, :, 0] = rng.uniform(10, 350, (72, 4, 18))
    kps[:, :4, :, 1] = rng.uniform(10, 350, (72, 4, 18))
    kps[:, :4, :, 2] = 2
    kps_d = jax.device_put(jnp.asarray(kps))
    gt_b = jax.jit(jax.vmap(functools.partial(
        gt_fn, grid_y=46, grid_x=46, stride=8, sigma=7.0, limb_width=1.0)))
    t_gt = timed(lambda k: gt_b(k)[0], kps_d)
    print(f"GT synthesis batch 72:     {t_gt*1000:7.2f} ms/batch "
          f"({t_gt*1000/72:.3f} ms/img)")


if __name__ == "__main__":
    main()
