"""End-to-end results-JSON differential against the reference pipeline.

Round-5 verdict item 1(d): take a checkpoint TRAINED BY THIS FRAMEWORK,
export it to the reference layout (models/import_torch.py
export_rtpose_state_dict), load it into the reference's own
``get_model('vgg19')``, and run BOTH full eval pipelines on the same
images:

- reference side: its ``crop_with_factor`` + ``vgg_preprocess`` + torch
  forward (the reference's get_outputs minus the hard-coded ``.cuda()``,
  evaluate/coco_eval.py:80-115) -> its NMS + compiled SWIG C++ grouping
  (``paf_to_pose_cpp``) -> its own ``append_result``
- our side: ``rtpose_tpu.evalx`` harness (per-image path, flip off,
  parity score mode) on the same checkpoint

then diff the two results JSONs detection by detection and score both
with our OKS evaluator.

    python scripts/ref_e2e_diff.py --ckpt /tmp/endurance/ckpt \
        [--images 32 --size 368]

Exits nonzero if the pipelines disagree beyond per-detection coordinate
noise (the forwards run in different frameworks; identical detections
require the decode to see the same peaks, so we allow a small fraction
of boundary-threshold detections to differ and report the counts).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir from this framework")
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--max-people", type=int, default=4)
    ap.add_argument("--out", default="/tmp/ref_e2e_diff")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import ref_oracle as R
    from hw_train_to_eval import write_coco_eval_set
    from rtpose_tpu.evalx.harness import run_eval, eval_results
    from rtpose_tpu.infer.pipeline import PosePipeline
    from rtpose_tpu.models import get_model
    from rtpose_tpu.models.import_torch import export_rtpose_state_dict
    from rtpose_tpu.train.checkpoint import CheckpointManager

    os.makedirs(args.out, exist_ok=True)
    img_dir, ann_file = write_coco_eval_set(
        args.out, seed=4242, n_images=args.images, size=args.size,
        max_people=args.max_people)

    # ---- our side: restore params, run evalx per-image ------------------
    model = get_model("vgg19", num_stages=6, dtype=jnp.float32)
    ckpt_params, model_state, _meta = CheckpointManager(
        args.ckpt).restore_params()
    params = {"params": ckpt_params}
    params.update(model_state)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    pipe = PosePipeline(model, params, input_size=args.size,
                        preprocess_mode="vgg", flip=False)
    ours_path = os.path.join(args.out, "ours.json")
    stats_ours = run_eval(img_dir, ann_file, pipe, score_mode="parity",
                          results_path=ours_path)
    print("ours:", json.dumps({k: stats_ours[k]
                               for k in ("AP", "AP50", "AR")}))

    # ---- reference side: export -> torch model -> its pipeline ----------
    import torch
    ce = R.coco_eval_mod()
    p2p = R.paf_to_pose_mod()
    imt = R.im_transform_mod()
    prep = R.preprocessing_mod()
    from lib.config import cfg as ref_cfg

    sd = export_rtpose_state_dict(params)
    ref_model = R.rtpose_vgg().get_model("vgg19").eval()
    ref_model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)

    from rtpose_tpu.data.coco_json import CocoJson
    coco = CocoJson(ann_file)
    img_ids = coco.img_ids(coco.cat_ids("person"))
    ref_rows = []
    import cv2
    with torch.no_grad():
        for img_id in img_ids:
            fp = os.path.join(img_dir, coco.image_info(img_id)["file_name"])
            ori = cv2.imread(fp)
            # reference get_outputs body (coco_eval.py:80-115) minus .cuda()
            im_croped, im_scale, real_shape = imt.crop_with_factor(
                ori, ref_cfg.DATASET.IMAGE_SIZE,
                factor=ref_cfg.MODEL.DOWNSAMPLE, is_ceil=True)
            im_data = prep.vgg_preprocess(im_croped)
            batch = torch.from_numpy(
                np.expand_dims(im_data, 0)).float()
            predicted, _ = ref_model(batch)
            paf = predicted[0].numpy().transpose(0, 2, 3, 1)[0]
            heatmap = predicted[1].numpy().transpose(0, 2, 3, 1)[0]
            humans = p2p.paf_to_pose_cpp(heatmap, paf, ref_cfg)
            upk = (heatmap.shape[0] * ref_cfg.MODEL.DOWNSAMPLE / im_scale,
                   heatmap.shape[1] * ref_cfg.MODEL.DOWNSAMPLE / im_scale)
            ce.append_result(img_id, humans, upk, ref_rows)
    ref_path = os.path.join(args.out, "reference.json")
    with open(ref_path, "w") as f:
        json.dump(ref_rows, f)
    stats_ref = eval_results(ref_rows, coco, img_ids)
    print("reference:", json.dumps({k: stats_ref[k]
                                    for k in ("AP", "AP50", "AR")}))

    # ---- detection-level diff -------------------------------------------
    with open(ours_path) as f:
        our_rows = json.load(f)
    by_img_ref, by_img_ours = {}, {}
    for r in ref_rows:
        by_img_ref.setdefault(r["image_id"], []).append(r["keypoints"])
    for r in our_rows:
        by_img_ours.setdefault(r["image_id"], []).append(r["keypoints"])

    n_match = n_close = n_only_ref = n_only_ours = 0
    for img_id in img_ids:
        a = [np.array(k).reshape(17, 3) for k in by_img_ref.get(img_id, [])]
        b = [np.array(k).reshape(17, 3)
             for k in by_img_ours.get(img_id, [])]
        used = set()
        for ka in a:
            best, bi = None, None
            for j, kb in enumerate(b):
                if j in used:
                    continue
                vis = (ka[:, 2] > 0) & (kb[:, 2] > 0)
                if not vis.any():
                    continue
                d = np.abs(ka[vis, :2] - kb[vis, :2]).max()
                if best is None or d < best:
                    best, bi = d, j
            if bi is None:
                n_only_ref += 1
            else:
                used.add(bi)
                same_vis = ((ka[:, 2] > 0) == (b[bi][:, 2] > 0)).all()
                if best <= 1.0 and same_vis:
                    n_match += 1
                elif best <= 8.0:
                    n_close += 1
                else:
                    n_only_ref += 1
                    used.discard(bi)
        n_only_ours += sum(1 for j in range(len(b)) if j not in used)

    total_ref = sum(len(v) for v in by_img_ref.values())
    summary = {
        "images": len(img_ids),
        "ref_detections": total_ref,
        "our_detections": sum(len(v) for v in by_img_ours.values()),
        "exact_or_1px": n_match,
        "close_le_8px": n_close,
        "unmatched_ref": n_only_ref,
        "unmatched_ours": n_only_ours,
        "AP_ref": stats_ref["AP"], "AP_ours": stats_ours["AP"],
    }
    print("DIFF", json.dumps(summary))
    with open(os.path.join(args.out, "diff_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    ok = (total_ref > 0
          and n_match + n_close >= 0.9 * total_ref
          and n_only_ref <= 0.1 * max(total_ref, 1)
          and abs(stats_ref["AP"] - stats_ours["AP"]) < 0.02)
    print("RESULT:", "OK" if ok else "DIVERGED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
