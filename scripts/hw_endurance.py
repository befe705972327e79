"""Training endurance soak: hours of continuous flagship training on TPU.

Round-4 verdict item 5: the longest continuous run was ~30 min; unmeasured
over a multi-hour run were host RSS growth (threaded loader + imgpipe
buffers), compile-cache growth, step-time drift, checkpoint GC at realistic
retention, and mid-run crash-restore.  This script runs the flagship
(default Config: VGG19 6-stage, 368 px, batch 72) fed by the native C++
loader for a wall-clock budget, logging a JSONL line per window with step
time, loss, host RSS, live-checkpoint count, and a raw H2D bandwidth probe,
then writes a summary with step-time percentiles and RSS start/end/max.

Crash-restore is exercised by the OUTER orchestration: kill -9 this process
mid-run and relaunch with the same --out; it resumes from the latest
checkpoint (the log notes ``resumed_from``) and the summary covers the
continuation.  Mirrors the reference's multi-day training regime
(reference train/train_VGG19.py:315-351) which has no resume at all.

    nohup python scripts/hw_endurance.py --hours 3 --out /tmp/endurance \
        > /tmp/endurance.log 2>&1 &

Host-RSS note (round-5 finding, SCALING.md "Endurance"): the axon tunnel
PJRT client retains every H2D staging buffer (~1 byte RSS per byte
shipped; D2H is clean; the framework itself holds flat RSS over the same
loop on the CPU backend).  A multi-hour run's RSS therefore grows by
steps x batch-bytes regardless of framework code.  ``--max-rss-gb``
bounds it: at a window boundary past the limit the run checkpoints,
writes its summary (reason "rss_recycle"), and exits with code 75 so an
outer loop can relaunch losslessly:

    while :; do python scripts/hw_endurance.py --hours 3 \
        --max-rss-gb 80 --out /tmp/endurance; [ $? -ne 75 ] && break; done
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from hw_train_native_loader import write_train_set  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def h2d_probe_mbps(nbytes: int = 4 << 20) -> float:
    """One timed uint8 host->device transfer (tunnel-weather covariate)."""
    import jax

    buf = np.zeros(nbytes, np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    d.block_until_ready()
    # enqueue resolves early on the tunnel backend; a 1-byte readback
    # closes the round trip truthfully
    _ = np.asarray(d[:1])
    return nbytes / (time.perf_counter() - t0) / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=3.0)
    ap.add_argument("--out", default="/tmp/endurance")
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--batch", type=int, default=72)
    ap.add_argument("--stages", type=int, default=6)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--keep", type=int, default=3)
    ap.add_argument("--log-every", type=int, default=25,
                    help="steps per readback window (one loss sync each)")
    ap.add_argument("--max-rss-gb", type=float, default=0.0,
                    help="checkpoint + exit 75 when host RSS passes this "
                         "(tunnel-client H2D leak mitigation; 0 = off)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rtpose_tpu.config import Config
    from rtpose_tpu.data.dataset import CocoKeypoints
    from rtpose_tpu.data.native_loader import NativeLoader
    from rtpose_tpu.train.checkpoint import CheckpointManager
    from rtpose_tpu.train.trainer import Trainer

    os.makedirs(args.out, exist_ok=True)
    img_dir = os.path.join(args.out, "train")
    ann_file = os.path.join(args.out, "train.json")
    stamp_file = os.path.join(args.out, "train.stamp.json")
    stamp = {"images": args.images, "size": args.size}
    have = None
    if os.path.isfile(stamp_file):
        with open(stamp_file) as f:
            have = json.load(f)
    if (have == stamp and os.path.isfile(ann_file) and os.path.isdir(img_dir)
            and len(os.listdir(img_dir)) == args.images):
        print("reusing rendered JPEG training set", flush=True)
    else:
        print("rendering JPEG training set...", flush=True)
        img_dir, ann_file = write_train_set(args.out, 0, args.images,
                                            args.size, max_people=4)
        with open(stamp_file, "w") as f:
            json.dump(stamp, f)

    cfg = Config()
    cfg.model.num_stages = args.stages
    cfg.model.dtype = "bfloat16"
    cfg.model.init_scheme = "scratch"
    cfg.dataset.image_size = args.size
    cfg.train.batch_size = args.batch
    cfg.train.lr = 0.05
    cfg.train.clip_grad_norm = 1.0
    cfg.train.freeze_base_epochs = 0
    cfg.train.print_freq = 10 ** 9

    ds = CocoKeypoints(img_dir, ann_file, input_size=args.size)
    loader = NativeLoader(ds, batch_size=args.batch, shuffle=True,
                          threads=args.threads, seed=0, prefetch=4,
                          uint8_output=True)
    tr = Trainer(cfg)
    mgr = CheckpointManager(os.path.join(args.out, "ckpt"), keep=args.keep)

    global_step = 0
    resumed_from = None
    try:
        state, meta = mgr.restore_latest(tr.state)
        tr.state = state
        global_step = int(meta.get("step", int(np.asarray(state.step))))
        resumed_from = global_step
        print(f"resumed_from step {global_step}", flush=True)
    except Exception:
        print("fresh start (no checkpoint found)", flush=True)

    log_path = os.path.join(args.out, "soak.jsonl")
    log_f = open(log_path, "a")

    def images_arg(b):
        return {"u8": jnp.asarray(b["image"]),
                "window": jnp.asarray(b["valid_xywh"])}

    it = iter(loader)
    b = next(it)
    t_c = time.perf_counter()
    tr.state, logs = tr.train_step(tr.state, images_arg(b),
                                   jnp.asarray(b["keypoints"]),
                                   jnp.asarray(b["mask"]))
    _ = np.asarray(logs["loss"])
    print(f"compiled in {time.perf_counter() - t_c:.0f}s; soaking...",
          flush=True)

    rss_start = rss_mb()
    rss_max = rss_start
    window_step_s = []
    deadline = time.time() + args.hours * 3600
    t_run0 = time.perf_counter()
    steps_run = 0
    last_logs = logs
    stop_reason = "deadline"
    while time.time() < deadline:
        t_w = time.perf_counter()
        for _ in range(args.log_every):
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                b = next(it)
            tr.state, last_logs = tr.train_step(
                tr.state, images_arg(b), jnp.asarray(b["keypoints"]),
                jnp.asarray(b["mask"]))
            steps_run += 1
            global_step += 1
            if args.ckpt_every and global_step % args.ckpt_every == 0:
                loss_now = float(np.asarray(last_logs["loss"]))
                mgr.save(tr.state, step=global_step,
                         meta={"step": global_step, "loss": loss_now})
        loss = float(np.asarray(last_logs["loss"]))   # window sync point
        w = time.perf_counter() - t_w
        step_s = w / args.log_every
        window_step_s.append(step_s)
        rss = rss_mb()
        rss_max = max(rss_max, rss)
        n_ckpt = len([n for n in os.listdir(mgr.directory)
                      if n.endswith(".meta.json")])
        rec = {"t": round(time.perf_counter() - t_run0, 1),
               "step": global_step, "loss": round(loss, 5),
               "step_s": round(step_s, 4), "rss_mb": round(rss, 1),
               "ckpts": n_ckpt, "h2d_mbps": round(h2d_probe_mbps(), 1)}
        log_f.write(json.dumps(rec) + "\n")
        log_f.flush()
        print(json.dumps(rec), flush=True)
        if args.max_rss_gb and rss > args.max_rss_gb * 1024:
            stop_reason = "rss_recycle"
            break

    loss = float(np.asarray(last_logs["loss"]))
    mgr.save(tr.state, step=global_step,
             meta={"step": global_step, "loss": loss})
    wall = time.perf_counter() - t_run0
    ws = np.array(window_step_s)
    batch_bytes = (args.batch * args.size * args.size * 3           # uint8
                   + args.batch * (32 * 18 * 3 + 4) * 4             # kp+win
                   + args.batch * (args.size // 8) ** 2 * 4)        # mask
    summary = {
        "stop_reason": stop_reason,
        "h2d_gb_shipped": round(steps_run * batch_bytes / 1e9, 1),
        "resumed_from": resumed_from,
        "steps_this_run": steps_run,
        "global_step": global_step,
        "wall_s": round(wall, 1),
        "img_per_s": round(steps_run * args.batch / wall, 1),
        "final_loss": round(loss, 5),
        "step_s_p50": round(float(np.percentile(ws, 50)), 4),
        "step_s_p99": round(float(np.percentile(ws, 99)), 4),
        "step_s_last10_over_first10": round(
            float(ws[-10:].mean() / ws[:10].mean()), 4) if len(ws) >= 20
            else None,
        "rss_start_mb": round(rss_start, 1),
        "rss_end_mb": round(rss_mb(), 1),
        "rss_max_mb": round(rss_max, 1),
        "ckpt_every": args.ckpt_every, "keep": args.keep,
        "live_ckpts": sorted(int(n[5:-10]) for n in os.listdir(mgr.directory)
                             if n.endswith(".meta.json")),
    }
    with open(os.path.join(args.out, f"summary_{global_step}.json"),
              "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)
    if stop_reason == "rss_recycle":
        sys.exit(75)   # EX_TEMPFAIL: outer loop relaunches, resume is lossless


if __name__ == "__main__":
    main()
