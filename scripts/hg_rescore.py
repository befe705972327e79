"""Re-evaluate a trained hourglass checkpoint with person-score ranking.

The 8-stack hourglass hardware row (SCALING.md) showed AR50 0.87 but
AP50 0.46: soft heatmaps pass the part-count filter with phantom partial
people and the reference's fixed detection score of 1.0 gives COCOeval no
ranking to suppress them.  This re-runs the SAME checkpoint's eval with
--score-mode person (one forward pass; parity score recomputed on the
same detections) to measure how much of the plateau was the ranking
artifact rather than the backbone.

    python scripts/hg_rescore.py --ckpt /tmp/hg_full8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/hg_full8")
    ap.add_argument("--stages", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from rtpose_tpu.data.coco_json import CocoJson
    from rtpose_tpu.evalx.harness import eval_results, run_eval_batched
    from rtpose_tpu.infer.pipeline import load_pipeline

    pipe = load_pipeline(args.ckpt, model_name="hourglass",
                         num_stages=args.stages, input_size=args.size,
                         preprocess_mode="vgg", flip=True, downsample=4,
                         pad_factor=64)
    img_dir = os.path.join(args.ckpt, "images")
    ann_file = os.path.join(args.ckpt, "annotations.json")
    results_path = os.path.join(args.ckpt, "results_person.json")
    stats = run_eval_batched(img_dir, ann_file, pipe, batch_size=16,
                             score_mode="person",
                             results_path=results_path)
    with open(results_path) as f:
        results = json.load(f)
    coco = CocoJson(ann_file)
    parity = eval_results([{**r, "score": 1.0} for r in results], coco,
                          coco.img_ids(coco.cat_ids("person")))
    out = {"AP_person": round(float(stats["AP"]), 4),
           "AP50_person": round(float(stats["AP50"]), 4),
           "AP75_person": round(float(stats["AP75"]), 4),
           "AR_person": round(float(stats["AR"]), 4),
           "AP_parity": round(float(parity["AP"]), 4),
           "AP50_parity": round(float(parity["AP50"]), 4)}
    print("SUMMARY", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
