"""On-device self-test: correctness + speed sanity in one command.

    python -m rtpose_tpu.selftest [--fps]

Runs on whatever accelerator jax sees (TPU in production, CPU otherwise):
1. device decode vs host oracle on synthetic scenes (exact parity)
2. GT synthesis device-vs-host equivalence
3. flip-TTA algebra round trip
4. optional: flagship-model serving FPS (--fps)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _synth(seed, n_people, h=46, w=46):
    # the test-suite generator lives in tests/ next to the package (not a
    # package at runtime); resolve it relative to this file so selftest
    # works from any cwd
    import os
    tests_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests")
    sys.path.insert(0, tests_dir)
    try:
        from util_synth import synth_example
        return synth_example(seed=seed, n_people=n_people, h=h, w=w)
    finally:
        sys.path.pop(0)


def _match_people(dev_people, host_people, w_up, h_up):
    """Optimal one-to-one device->host person matching by mean part
    distance (pixels). Returns host index per device person, or None if
    no injective matching with all-finite distances exists (a real
    parity break). Exact (exhaustive over assignments) — person counts
    here are <= ~8, and greedy nearest-first can both return a
    non-injective mapping (argmin over an all-inf masked row lands on a
    taken column) and miss valid matchings that exist."""
    nd, nh = len(dev_people), len(host_people)
    if nd != nh:
        return None
    dist = np.full((nd, nh), np.inf)
    for i, person in enumerate(dev_people):
        for j, hp in enumerate(host_people):
            ds = [np.hypot((xn - hp[part][0]) * w_up,
                           (yn - hp[part][1]) * h_up)
                  for part, (xn, yn, _) in person["parts"].items()
                  if hp[part][0] >= 0]
            if ds:
                dist[i, j] = float(np.mean(ds))

    # branch-and-bound over injective assignments: rows in order, prune
    # on running cost; exact minimum, fast for the small counts here
    best = {"cost": np.inf, "order": None}

    def assign(i, taken, cost):
        if cost >= best["cost"]:
            return
        if i == nd:
            best["cost"], best["order"] = cost, list(taken)
            return
        for j in np.argsort(dist[i]):
            j = int(j)
            if j in taken or not np.isfinite(dist[i, j]):
                continue
            taken.append(j)
            assign(i + 1, taken, cost + dist[i, j])
            taken.pop()

    assign(0, [], 0.0)
    return best["order"]


def check_decode_parity(n_scenes: int = 6) -> bool:
    import jax.numpy as jnp

    from .ops import grouping_ref as G
    from .ops.decode import decode_poses, people_to_numpy

    ok = True
    for seed in range(n_scenes):
        _, heat, paf = _synth(seed, 1 + seed % 5)
        w_up, h_up = heat.shape[1] * 8, heat.shape[0] * 8
        host_people, host_scores = G.paf_to_people(heat, paf)
        dev = decode_poses(jnp.asarray(heat), jnp.asarray(paf))
        dev_people = people_to_numpy(dev, w_up, h_up)
        if len(dev_people) != len(host_people):
            print(f"  scene {seed}: people count mismatch "
                  f"(host {len(host_people)} vs device {len(dev_people)})")
            ok = False
            continue
        # Person EMISSION order is tie-sensitive: one bit-equal candidate
        # score (lax.top_k ties order differently per backend; the
        # reference's std::sort is likewise unstable) can swap which
        # subset is created first without changing any person's content.
        # Match device->host people by nearest mean part distance, then
        # compare strictly within each matched pair.
        order = _match_people(dev_people, host_people, w_up, h_up)
        if order is None:
            print(f"  scene {seed}: no one-to-one person matching")
            ok = False
            continue
        # part-level comparison: the TPU matmul-precision regressions this
        # selftest exists for (bf16 MXU pass on the refine einsums) shift
        # sub-pixel coordinates without changing people counts
        for pi, person in enumerate(dev_people):
            hp = host_people[order[pi]]   # (18, 3): normalized x, y, score
            for part, (xn, yn, score) in person["parts"].items():
                hx, hy, hs = hp[part]
                if hx < 0:
                    print(f"  scene {seed} person {pi}: part {part} "
                          f"missing on host")
                    ok = False
                    continue
                if (abs((xn - hx) * w_up) > 0.05
                        or abs((yn - hy) * h_up) > 0.05
                        or abs(score - hs) > 1e-3):
                    print(f"  scene {seed} person {pi} part {part}: "
                          f"device ({xn * w_up:.3f},{yn * h_up:.3f},"
                          f"{score:.4f}) vs host ({hx * w_up:.3f},"
                          f"{hy * h_up:.3f},{hs:.4f})")
                    ok = False
    print(f"decode parity over {n_scenes} scenes: {'OK' if ok else 'FAIL'}")
    return ok


def check_gt_equivalence() -> bool:
    import jax

    from .data.gt import ground_truth_maps, ground_truth_maps_device
    from .ops.pallas_gt import gt_maps_pallas

    rng = np.random.RandomState(0)
    kps = np.zeros((3, 18, 3))
    kps[:, :, 0] = rng.uniform(10, 350, (3, 18))
    kps[:, :, 1] = rng.uniform(10, 350, (3, 18))
    kps[:, :, 2] = 2
    h1, p1 = ground_truth_maps(kps)
    h2, p2 = ground_truth_maps_device(kps)
    ok = (np.allclose(np.asarray(h2), h1, atol=2e-6)
          and np.allclose(np.asarray(p2), p1, atol=2e-6))
    print(f"GT synthesis host/device equivalence: {'OK' if ok else 'FAIL'}")

    h3, p3 = gt_maps_pallas(kps[None].astype(np.float32), grid_y=46,
                            grid_x=46, stride=8, sigma=7.0,
                            interpret=jax.default_backend() != "tpu")
    ok_pl = (np.allclose(np.asarray(h3)[0], h1, atol=2e-6)
             and np.allclose(np.asarray(p3)[0], p1, atol=2e-6))
    print(f"GT synthesis pallas kernel parity: {'OK' if ok_pl else 'FAIL'}")
    return ok and ok_pl


def check_flip_algebra() -> bool:
    import jax.numpy as jnp

    from .infer.pipeline import average_flip
    from .skeleton import FLIP_HEAT, FLIP_PAF, NUM_LIMBS

    rng = np.random.RandomState(0)
    heat = rng.rand(12, 16, 19).astype(np.float32)
    paf = rng.rand(12, 16, 38).astype(np.float32)
    neg = np.ones(2 * NUM_LIMBS, np.float32)
    neg[0::2] = -1
    heat_f = heat[:, ::-1, :][:, :, np.array(FLIP_HEAT)]
    paf_f = (paf * neg)[:, ::-1, :][:, :, np.array(FLIP_PAF)]
    h, p = average_flip(jnp.asarray(heat), jnp.asarray(heat_f),
                        jnp.asarray(paf), jnp.asarray(paf_f))
    ok = (np.allclose(np.asarray(h), heat, atol=1e-6)
          and np.allclose(np.asarray(p), paf, atol=1e-6))
    print(f"flip-TTA algebra: {'OK' if ok else 'FAIL'}")
    return ok


def measure_fps() -> None:
    import jax
    import jax.numpy as jnp

    from .models import get_model
    from .ops.decode import decode_poses

    model = get_model("vgg19", num_stages=6, dtype=jnp.bfloat16)
    # jitted init: eager init pays a per-op dispatch RTT on the tunnel
    # backend (minutes of startup) and bypasses the persistent cache
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 368, 368, 3)))

    @jax.jit
    def serve(params, image):
        out = model.apply(params, image[None])
        p = decode_poses.__wrapped__(out.heatmap[0], out.paf[0])
        return p.coords

    x = jnp.zeros((368, 368, 3))
    # block_until_ready resolves at ENQUEUE on the tunnel backend; a host
    # readback (np.asarray) is the only truthful drain (CLAUDE.md), and
    # batch-amortizing it cancels the per-call RTT
    np.asarray(serve(params, x))          # warmup + compile
    t0 = time.perf_counter()
    n = 20
    r = None
    for _ in range(n):
        r = serve(params, x)
    np.asarray(r)                          # one draining readback
    dt = time.perf_counter() - t0
    print(f"serving latency (single-frame chained, one readback): "
          f"{dt / n * 1000:.2f} ms/frame ({n / dt:.0f} FPS)")


def main():
    import jax

    from .utils.compile_cache import enable as _enable_compile_cache
    _enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fps", action="store_true",
                        help="also measure flagship serving latency")
    args = parser.parse_args()
    print(f"devices: {jax.devices()}")
    ok = all([check_decode_parity(), check_gt_equivalence(),
              check_flip_algebra()])
    if args.fps:
        measure_fps()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
