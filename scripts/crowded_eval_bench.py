"""Crowded-heavy eval throughput: retry-on-overflow vs raised-caps-from-start.

The truncation retry re-decodes overflowing frames in one extra batched
dispatch per collect (infer/pipeline.py run_batch_collect).  On crowd-dense
data that extra dispatch fires on most collects; building the pipeline with
the raised caps from the start avoids it, but then EVERY frame pays the
bigger decode program (max_candidates 256->1024, max_total_conns 160->608).
This measures both configurations at three crowd densities on hardware so
eval on crowd-dense data can pick the right configuration (the reference
has no such trade-off: its C++ grouping uses unbounded dynamic lists,
pafprocess.cpp:24-43, at single-image host speed).

    python scripts/crowded_eval_bench.py --ckpt /tmp/train_eval_flagship

Writes per-(density, config) rows: img/s, retried/truncated counts, AP.
Results land in SCALING.md ("Crowded-heavy eval" table).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from hw_train_to_eval import write_coco_eval_set  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (hw_train_to_eval --out)")
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--size", type=int, default=184)
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/crowded_bench")
    args = ap.parse_args()

    from rtpose_tpu.evalx.harness import run_eval_batched
    from rtpose_tpu.infer.pipeline import RETRY_CAPS, load_pipeline

    # three densities on the same canvas: light (~no overflow), soak-like
    # (the soak's 1..8 uniform mix measured 21/100 crowded scenes past the
    # default caps), heavy (every frame crowd-dense)
    densities = {"light": 3, "soak-like": 8, "heavy": 14}
    sets = {}
    for si, (name, max_people) in enumerate(densities.items()):
        d = os.path.join(args.out, name)
        img_dir, ann = write_coco_eval_set(
            d, seed=1000 + si, n_images=args.n, size=args.size,
            max_people=max_people)
        sets[name] = (img_dir, ann)

    common = dict(checkpoint_dir=args.ckpt, num_stages=args.stages,
                  input_size=args.size, preprocess_mode="vgg", flip=True)
    configs = {
        "default+retry": dict(),                   # retries fire on overflow
        # every frame runs the big program; auto_retry off so a frame that
        # overflows even these caps can't fire an identical-caps re-decode
        # dispatch and bias the arm whose point is avoiding retry dispatches
        "raised-caps": dict(**RETRY_CAPS, auto_retry=False),
    }

    rows = []
    for cfg_name, caps in configs.items():
        pipe = load_pipeline(**common, **caps)
        for set_name, (img_dir, ann) in sets.items():
            # warm-up pass compiles the forward + decode (and, for the
            # retry config, the raised-caps decode) so the timed trials
            # measure steady-state throughput, not compile time; median of
            # 3 trials cancels tunnel weather (swings 10x between minutes)
            run_eval_batched(img_dir, ann, pipe, batch_size=args.batch,
                             limit=2 * args.batch)
            trials = []
            for _ in range(3):
                t0 = time.perf_counter()
                stats = run_eval_batched(img_dir, ann, pipe,
                                         batch_size=args.batch)
                trials.append(time.perf_counter() - t0)
            wall = sorted(trials)[len(trials) // 2]
            row = {"config": cfg_name, "set": set_name,
                   "images": args.n,
                   "pipeline_s": stats["pipeline_s"],
                   "img_per_s": round(args.n / wall, 2),
                   "wall_s": round(wall, 2),
                   "trials_s": [round(t, 2) for t in sorted(trials)],
                   "n_retried": stats["frames_retried"],
                   "n_truncated": stats["frames_truncated"],
                   "AP": round(stats["AP"], 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)
        del pipe

    out_json = os.path.join(args.out, "results.json")
    with open(out_json, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_json}")

    # the decision quantity: at each density, which config is faster?
    print("\nconfig comparison (img/s):")
    for set_name in densities:
        a = next(r for r in rows if r["set"] == set_name
                 and r["config"] == "default+retry")
        b = next(r for r in rows if r["set"] == set_name
                 and r["config"] == "raised-caps")
        frac = a["n_retried"] / a["images"]
        print(f"  {set_name:10s} retry-frac {frac:4.0%}  "
              f"default+retry {a['img_per_s']:6.2f}  "
              f"raised-caps {b['img_per_s']:6.2f}  "
              f"winner: {'default+retry' if a['img_per_s'] >= b['img_per_s'] else 'raised-caps'}")


if __name__ == "__main__":
    main()
