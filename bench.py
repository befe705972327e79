"""Headline benchmark: end-to-end FPS at 368x368 including grouping.

Full serving path on the accelerator: uint8 frames host->device,
on-device normalization (rtpose mode), VGG19 rtpose forward (bf16, batch),
on-device NMS + PAF grouping, host readback of decoded people arrays.
Batched + double-buffered so transfer RTT overlaps compute — the realistic
production serving shape (the driver's TPU is tunnel-attached; per-call
RTT would otherwise dominate the sub-millisecond compute).

Baseline: the BASELINE.json north star of 60 FPS/chip at 368x368
(the reference publishes no FPS; its pipeline is a per-frame GPU forward +
scipy NMS + single-threaded C++ grouping).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BATCH = 64
DEPTH = 3      # in-flight batches
ITERS = 20     # timed batches


def main():
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.models import get_model
    from rtpose_tpu.ops.decode import decode_poses

    model = get_model("vgg19", num_stages=6, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 368, 368, 3), jnp.float32))

    decode = jax.vmap(lambda h, p: decode_poses.__wrapped__(h, p))

    @jax.jit
    def serve(params, frames_u8):
        imgs = frames_u8.astype(jnp.float32) / 256.0 - 0.5
        out = model.apply(params, imgs)
        people = decode(out.heatmap, out.paf)
        return (people.coords, people.part_score, people.score,
                people.valid)

    rng = np.random.RandomState(0)
    batches = [
        (rng.rand(BATCH, 368, 368, 3) * 255).astype(np.uint8)
        for _ in range(4)
    ]

    # warmup / compile
    r = serve(params, jnp.asarray(batches[0]))
    jax.block_until_ready(r)
    _ = [np.asarray(x) for x in r]

    inflight = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = serve(params, jnp.asarray(batches[i % len(batches)]))
        inflight.append(out)
        if len(inflight) >= DEPTH:
            done = inflight.pop(0)
            _ = np.asarray(done[0])   # host readback of people coords
    for done in inflight:
        _ = np.asarray(done[0])
    dt = time.perf_counter() - t0
    fps = ITERS * BATCH / dt

    print(json.dumps({
        "metric": "fps_368x368_e2e_incl_grouping",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
