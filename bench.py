"""Headline benchmark: end-to-end FPS at 368x368 including grouping.

Full serving path on the accelerator: uint8 frames host->device,
on-device normalization (rtpose mode), VGG19 rtpose forward (bf16, batch),
on-device NMS + PAF grouping, host readback of decoded people arrays.
Batched, with a producer thread staging host->device transfers and 3
batches in flight so transfer RTT overlaps compute — the realistic
production serving shape.

The driver's TPU is tunnel-attached and its throughput fluctuates heavily
between runs (measured 60 MB/s to 1.6 GB/s H2D on identical code;
block_until_ready resolves at enqueue so only readbacks time truthfully).
The e2e headline is the MEDIAN trial (vs the 60 FPS/chip BASELINE.json
north star) — robust to trial count — with best + full spread as extras; the
compute-bound metric (device-resident inputs, batch-amortized readback)
is the number that generalizes off the tunnel, reported with measured
MFU from the compiled program's XLA flop count.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", extras}.
"""

import json
import queue
import statistics
import threading
import time

import numpy as np

BATCH = 64
DEPTH = 3      # in-flight batches
ITERS = 14     # timed batches per trial
TRIALS = 8     # tunnel H2D throughput swings 10x between minutes; the
               # median across trials is the headline (round-3 verdict)
TRIAL_GAP_S = 50   # space trials across ~7 min of wall clock: back-to-back
                   # trials all land in ONE weather window (measured: the
                   # full 8-trial spread fits inside a single bad minute,
                   # median 48 FPS, while adjacent minutes ran 3x that), so
                   # the un-spaced median estimates one random minute, not
                   # typical tunnel service; gaps decorrelate the samples.
                   # 25 s gaps still fit inside one bad stretch (measured
                   # 2026-08-19: median 58 with best 82, vs median 147 in a
                   # fair window the day before); 50 s spans 2+ windows.
COMPUTE_ITERS = 12

# bf16 peak TFLOPS per chip by device kind (for MFU)
_PEAK_TFLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def h2d_probe_mbps(nbytes: int = 8 << 20) -> float:
    """One timed raw uint8 host->device transfer + 1-byte readback: the
    tunnel-weather covariate recorded per trial so cross-round headline
    swings are attributable to H2D bandwidth, not code (round-4 verdict
    item 4: median 147 -> 95 FPS across rounds with identical
    compute-bound FPS was pure tunnel weather, but nothing recorded it).
    """
    import jax

    buf = np.zeros(nbytes, np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    d.block_until_ready()
    # block_until_ready resolves at enqueue on the tunnel backend; a tiny
    # readback closes the round trip truthfully
    _ = np.asarray(d[:1])
    return nbytes / (time.perf_counter() - t0) / 1e6


def run_trial(serve, params, batches, device_put):
    q = queue.Queue(maxsize=DEPTH)

    def producer():
        for i in range(ITERS):
            q.put(device_put(batches[i % len(batches)]))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    t.start()
    inflight = []
    while True:
        b = q.get()
        if b is None:
            break
        inflight.append(serve(params, b))
        if len(inflight) >= DEPTH:
            done = inflight.pop(0)
            _ = np.asarray(done)     # host readback of people coords
    for done in inflight:
        _ = np.asarray(done)
    dt = time.perf_counter() - t0
    return ITERS * BATCH / dt


def compute_bound_fps(serve, params, dev_batch):
    """Device-resident input, batch-amortized readback: pure program
    throughput, no H2D in the timed window."""
    r = None
    t0 = time.perf_counter()
    for _ in range(COMPUTE_ITERS):
        r = serve(params, dev_batch)
    _ = np.asarray(r)                # drains the device queue truthfully
    dt = time.perf_counter() - t0
    return COMPUTE_ITERS * BATCH / dt


def program_flops(serve, params, dev_batch):
    """XLA's flop count for one serving batch (forward + decode)."""
    import jax
    try:
        compiled = jax.jit(serve.__wrapped__).lower(
            params, dev_batch).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])
    except Exception:
        return None


def train_metrics(peak):
    """Train-step throughput at the reference batch 72 (img/s, step ms,
    MFU from XLA's flop count) — the whole jitted update: device GT
    synthesis + 6-stage forward + backward + SGD."""
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.config import Config
    from rtpose_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.train.freeze_base_epochs = 0
    tr = Trainer(cfg)
    B = cfg.train.batch_size
    size = cfg.dataset.image_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, size, size, 3).astype(np.float32)
                         - 0.5)
    kps = np.zeros((B, 32, 18, 3), np.float32)
    kps[:, :3, :, 0] = rng.uniform(20, size - 20, (B, 3, 18))
    kps[:, :3, :, 1] = rng.uniform(20, size - 20, (B, 3, 18))
    kps[:, :3, :, 2] = 2
    kps = jnp.asarray(kps)

    flops = None
    try:
        ca = tr.train_step.lower(tr.state, images, kps,
                                 None).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca["flops"])
    except Exception:
        pass

    # warmup/compile
    tr.state, logs = tr.train_step(tr.state, images, kps, None)
    _ = np.asarray(logs["loss"])
    steps = 8
    t0 = time.perf_counter()
    for _ in range(steps):
        tr.state, logs = tr.train_step(tr.state, images, kps, None)
    _ = np.asarray(logs["loss"])     # truthful drain (host readback)
    dt = time.perf_counter() - t0
    step_ms = dt / steps * 1000.0
    img_s = steps * B / dt
    mfu = (flops * (img_s / B) / peak) if (flops and peak) else None
    return {
        "train_img_per_s": round(img_s, 1),
        "train_step_ms": round(step_ms, 1),
        "train_batch": B,
        "train_mfu": round(mfu, 4) if mfu else None,
    }


def tunnel_alive(timeout_s: float = 240.0) -> bool:
    """Bounded TPU data-plane probe.  The tunnel goes down for hours at a
    time and a dead tunnel BLOCKS transfers forever (enumeration may still
    answer, and the blocked transfer holds the GIL — measured 2026-08-20 —
    so an in-process daemon-thread timeout cannot fire either).  Probe in
    a subprocess and kill it on timeout.  240 s covers the one-time
    first-transfer path init."""
    import subprocess
    import sys as _sys

    code = ("import jax, numpy as np\n"
            "d = jax.device_put(np.ones(1 << 20, np.uint8))\n"
            "d.block_until_ready()\n"
            "print(np.asarray(d[:4])[0])\n")
    try:
        r = subprocess.run([_sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax
    import jax.numpy as jnp

    if not tunnel_alive():
        # one well-formed line either way: the driver records it and a
        # reader sees WHY there is no number, instead of a hung process
        print(json.dumps({
            "metric": "fps_368x368_e2e_incl_grouping",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": "tpu tunnel data plane unreachable (transfer probe "
                     "timed out after 240s); bench not run",
        }))
        raise SystemExit(2)

    # Persistent compile cache: the 6-stage fwd and fwd+bwd programs cost
    # minutes to compile; cached XLA binaries load in ms on the axon
    # backend (measured 0.74 s -> 0.02 s; full bench ~10 min -> 173 s),
    # so repeat bench runs spend their time measuring, not compiling.
    from rtpose_tpu.utils.compile_cache import enable
    enable()  # shared default dir — one cache across bench/demos/eval

    from rtpose_tpu.models import get_model
    from rtpose_tpu.ops.decode import decode_poses

    model = get_model("vgg19", num_stages=6, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 368, 368, 3), jnp.float32))

    def make_serve(max_peaks):
        decode = jax.vmap(lambda h, p: decode_poses.__wrapped__(
            h, p, max_peaks=max_peaks))

        @jax.jit
        def serve(params, frames_u8):
            imgs = frames_u8.astype(jnp.float32) / 256.0 - 0.5
            out = model.apply(params, imgs)
            people = decode(out.heatmap, out.paf)
            return people.coords
        return serve

    serve = make_serve(32)

    rng = np.random.RandomState(0)
    batches = [
        (rng.rand(BATCH, 368, 368, 3) * 255).astype(np.uint8)
        for _ in range(3)
    ]

    # warmup / compile (incl. first-transfer path init)
    dev_batch = jax.device_put(batches[0])
    r = serve(params, dev_batch)
    jax.block_until_ready(r)
    _ = np.asarray(r)

    pairs = []   # (fps, h2d_mbps) per trial, bandwidth probed just before
    for i in range(TRIALS):
        if i:
            time.sleep(TRIAL_GAP_S)
        bw = h2d_probe_mbps()
        pairs.append((run_trial(serve, params, batches, jax.device_put),
                      bw))
    pairs.sort()
    trials = [f for f, _ in pairs]
    # headline = MEDIAN across trials (round-3 verdict: a best-of-N
    # headline drifts upward with N); best + full list stay as extras
    fps_best = trials[-1]
    fps_median = statistics.median(trials)
    bw_median = statistics.median(bw for _, bw in pairs)

    c_fps = compute_bound_fps(serve, params, dev_batch)
    flops = program_flops(serve, params, dev_batch)
    kind = getattr(jax.devices()[0], "device_kind", "?")
    peak = _PEAK_TFLOPS.get(kind)
    mfu = (flops * (c_fps / BATCH) / peak) if (flops and peak) else None

    # decode cost at the default and doubled peak caps (crowded scenes);
    # k=32 IS the main serve program already measured — reuse, don't
    # re-compile and re-time the identical program
    extra_decode = {"compute_fps_maxpeaks32": round(c_fps, 1)}
    s_64 = make_serve(64)
    _ = np.asarray(s_64(params, dev_batch))    # compile + path warmup
    extra_decode["compute_fps_maxpeaks64"] = round(
        compute_bound_fps(s_64, params, dev_batch), 1)

    train = train_metrics(peak)

    print(json.dumps({
        "metric": "fps_368x368_e2e_incl_grouping",
        "value": round(fps_median, 2),
        "value_is": "median",
        "unit": "frames/s",
        "vs_baseline": round(fps_median / 60.0, 3),
        "e2e_fps_best": round(fps_best, 2),
        "e2e_fps_median": round(fps_median, 2),
        "e2e_fps_trials": [round(t, 1) for t in trials],
        "h2d_mbps_trials": [[round(f, 1), round(bw, 1)] for f, bw in pairs],
        "h2d_mbps_median": round(bw_median, 1),
        "trial_spacing_s": TRIAL_GAP_S,
        "compute_fps": round(c_fps, 2),
        "program_gflops_per_image": round(flops / BATCH / 1e9, 2)
        if flops else None,
        "mfu": round(mfu, 4) if mfu else None,
        "device": kind,
        **extra_decode,
        **train,
    }))


if __name__ == "__main__":
    main()
