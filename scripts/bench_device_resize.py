"""Measure the device-resize serving mode vs host resize on hardware.

Round-2 verdict item: `_prep` resizes/pads on host and ships the ENLARGED
frame (240x320 video -> 368x496 = ~2.4x the source bytes) even though
serving on the tunnel TPU is H2D-transfer-bound.  The device_resize
pipeline mode ships the raw uint8 frame and runs scale+pad in-graph
(cv2-INTER_LINEAR-parity bilinear).  This script measures bytes/frame and
video-style pipelined serving FPS for both modes on the same frames.

    python scripts/bench_device_resize.py [--frames 240 320] [--batch 32]
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(pipe, frames, batches, trials):
    """Depth-2 submit/collect pipelining over `batches` chunks."""
    fps_all = []
    for _ in range(trials):
        t0 = time.perf_counter()
        pending = None
        n = 0
        for _ in range(batches):
            ticket = pipe.run_batch_submit(frames)
            if pending is not None:
                people, _ = pipe.run_batch_collect(pending)
                n += len(people)
            pending = ticket
        people, _ = pipe.run_batch_collect(pending)
        n += len(people)
        dt = time.perf_counter() - t0
        fps_all.append(n / dt)
    return fps_all


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--stages", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rtpose_tpu.infer.pipeline import PosePipeline
    from rtpose_tpu.models import get_model

    from rtpose_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    h, w = args.frames
    model = get_model("vgg19", num_stages=args.stages, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 368, 368, 3), jnp.float32))
    rng = np.random.RandomState(0)
    frames = [(rng.rand(h, w, 3) * 255).astype(np.uint8)
              for _ in range(args.batch)]

    out = {"frame_hw": [h, w], "batch": args.batch}
    for name, dev_resize in (("host_resize", False), ("device_resize", True)):
        pipe = PosePipeline(model, params, input_size=368, flip=False,
                            preprocess_mode="rtpose",
                            device_resize=dev_resize)
        im, meta = pipe._prep(frames[0])
        bytes_per_frame = int(np.prod(im.shape))
        # warmup: compile + first-transfer path init
        _ = pipe.run_batch(frames)
        fps = run_mode(pipe, frames, args.batches, args.trials)
        out[name] = {
            "h2d_bytes_per_frame": bytes_per_frame,
            "padded_shape": list(meta["padded_shape"][:2]),
            "fps_best": round(max(fps), 1),
            "fps_median": round(statistics.median(fps), 1),
            "fps_trials": [round(f, 1) for f in fps],
        }
    r = out["device_resize"]["h2d_bytes_per_frame"]
    hb = out["host_resize"]["h2d_bytes_per_frame"]
    out["h2d_bytes_ratio"] = round(hb / r, 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
