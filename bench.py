"""Headline benchmark: end-to-end FPS at 368x368 including grouping.

Runs the full serving path on the available accelerator: host->device
transfer, VGG19 rtpose forward (bf16), on-device NMS + PAF grouping, and
host readback of the decoded people arrays.  Baseline: the BASELINE.json
north star of 60 FPS/chip (the reference's GPU pipeline is CNN forward +
scipy NMS + C++ grouping per frame; it publishes no FPS number, so the
driver-provided 60 FPS target is the reference point).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.models import get_model
    from rtpose_tpu.ops.decode import decode_poses

    model = get_model("vgg19", num_stages=6, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 368, 368, 3), jnp.float32))

    @jax.jit
    def serve(params, image):
        out = model.apply(params, image[None])
        people = decode_poses.__wrapped__(out.heatmap[0], out.paf[0])
        return people.coords, people.part_score, people.score, people.valid

    rng = np.random.RandomState(0)
    frames = [rng.rand(368, 368, 3).astype(np.float32) for _ in range(8)]

    # warmup / compile
    r = serve(params, jnp.asarray(frames[0]))
    jax.block_until_ready(r)

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = serve(params, jnp.asarray(frames[i % len(frames)]))
        coords = np.asarray(out[0])   # host readback, like real serving
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "fps_368x368_e2e_incl_grouping",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
