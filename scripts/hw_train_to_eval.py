"""Close the full train->eval chain on hardware (no COCO in the image).

Trains the real Trainer on synthetic learnable skeleton scenes (same
renderer as hw_train_synth.py), then evaluates the TRAINED MODEL'S OWN
PREDICTIONS — not oracle GT maps — through the production serving
pipeline + COCO eval harness (evalx/harness.run_eval_batched) on a
held-out set rendered from the same distribution, and reports OKS mAP.

This is the whole reference workflow (train_VGG19.py -> evaluation.py ->
coco_eval.run_eval -> COCOeval) running end-to-end on TPU: data -> GT
synthesis -> sharded train step -> checkpoint -> restore -> batched
bucketed eval -> decode -> OKS.  With real COCO data the only change is
the annotation file / image dir (and the learned weights).

    python scripts/hw_train_to_eval.py --size 184 --stages 2 \
        --steps 1200 --out /tmp/train_eval
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

from hw_train_synth import render_scene  # noqa: E402


def write_coco_eval_set(out_dir, seed, n_images, size, max_people, *,
                        img_subdir="images", ann_name="annotations.json",
                        ext="png", jpeg_quality=92):
    """Render a synthetic scene set: images + COCO-format keypoint json
    (17-kp person annotations derived from the rendered 18-part poses via
    ORDER_COCO — the inverse of evalx.harness.person_to_coco_keypoints).
    Defaults give the lossless held-out eval set; ext="jpg" gives an
    on-disk JPEG training set (the contract CocoKeypoints consumes for
    real COCO)."""
    import cv2

    from hw_train_synth import person_to_coco_annotation

    img_dir = os.path.join(out_dir, img_subdir)
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        img, kps = render_scene(rng, size, n_people=1 + rng.randint(max_people))
        fname = f"synth_{img_id:04d}.{ext}"
        cv2.imwrite(os.path.join(img_dir, fname), img,
                    [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality]
                    if ext == "jpg" else [])
        images.append({"id": img_id, "file_name": fname,
                       "height": size, "width": size})
        for person in kps:
            ann = person_to_coco_annotation(person, img_id, ann_id)
            if ann is None:
                continue
            annotations.append(ann)
            ann_id += 1
    ann_file = os.path.join(out_dir, ann_name)
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return img_dir, ann_file


def make_pool(seed, n_batches, batch, size, max_people):
    """Device-shaped training batches with the SAME normalization the
    serving pipeline applies (preprocess mode 'vgg'), so train-time and
    eval-time pixel statistics match exactly."""
    from rtpose_tpu.infer.preprocess import vgg_preprocess

    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        imgs = np.zeros((batch, size, size, 3), np.float32)
        kps = np.zeros((batch, 32, 18, 3), np.float32)
        for i in range(batch):
            img, kp = render_scene(rng, size,
                                   n_people=1 + rng.randint(max_people))
            imgs[i] = vgg_preprocess(img)
            kps[i] = kp
        out.append({"image": imgs, "keypoints": kps})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vgg19",
                    help="vgg19 | hourglass | shufflenet_v2 | mobilenet | "
                         "openpose_v2 | atrous_resnet50 | atrous_cpm | "
                         "atrous_cpm_shared "
                         "(hourglass switches to the train_SH "
                         "recipe: stride 4, sigma 4.416, limb width 1.289, "
                         "masked loss, BatchNorm state; shufflenet_v2 uses "
                         "the train_ShuffleNetV2 recipe: stride 8, sigma 7, "
                         "unmasked MSE, BN; mobilenet/openpose_v2 use the "
                         "stride-8 defaults — the reference never wired a "
                         "trainer for either)")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--size", type=int, default=184)
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--pool-batches", type=int, default=16)
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--max-people", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--lr-drop-at", type=float, default=0.5,
                    help="fraction of steps after which lr is cut 10x "
                         "(simple two-phase schedule for the overfit run)")
    ap.add_argument("--thresh-heatmap", type=float, default=0.1)
    ap.add_argument("--out", default="/tmp/train_eval")
    args = ap.parse_args()

    import jax

    from rtpose_tpu.config import Config
    from rtpose_tpu.evalx.harness import run_eval_batched
    from rtpose_tpu.infer.pipeline import PosePipeline
    from rtpose_tpu.parallel import mesh as pmesh
    from rtpose_tpu.train.checkpoint import CheckpointManager
    from rtpose_tpu.train.trainer import Trainer

    os.makedirs(args.out, exist_ok=True)

    cfg = Config()
    cfg.model.name = args.model
    cfg.model.num_stages = args.stages
    cfg.model.dtype = "bfloat16"
    cfg.dataset.image_size = args.size
    if args.model == "hourglass":
        # the reference's second trainer recipe (train_SH.py:76-77,267):
        # output stride 4, sigma 4.416, limb width 1.289, crowd-masked loss
        if args.size % 64:
            raise SystemExit(
                f"--model hourglass needs --size divisible by 64 "
                f"(stride-4 stem x depth-4 exact pool/upsample halvings); "
                f"got {args.size} — use e.g. 256 (train_SH.py's size)")
        cfg.model.downsample = 4
        cfg.dataset.sigma = 4.416
        cfg.dataset.limb_width = 1.289
        cfg.train.masked_loss = True
    elif args.model == "shufflenet_v2":
        # the reference's third trainer recipe
        # (train_ShuffleNetV2.py:262-267,289): 368 px input at stride 8,
        # sigma 7, plain (unmasked) MSE, BatchNorm running stats — all of
        # which are the Config defaults; the single-stage net ignores
        # --stages.  Sizes just need stride-8 divisibility.
        if args.size % 8:
            raise SystemExit(
                f"--model shufflenet_v2 needs --size divisible by 8 "
                f"(stem+pool+stage2 strides); got {args.size}")
    elif args.model in ("atrous_resnet50", "atrous_cpm",
                        "atrous_cpm_shared"):
        # Legacy families the reference shipped but whose trainers died
        # with the `tnn`/`slim` deps (atrouspose.py:73-98 ResNet50+ASPP
        # with lateral upsample fusion; atrous_model.py:78-143 dilated
        # CPM): stride-8 output, sigma 7, unmasked MSE — Config defaults.
        # atrous_resnet50 is single-stage by construction and threads
        # BatchNorm running stats; atrous_cpm takes --stages.
        if args.size % 8:
            raise SystemExit(
                f"--model {args.model} needs --size divisible by 8 "
                f"(stride-8 trunk); got {args.size}")
    elif args.model in ("mobilenet", "openpose_v2"):
        # Families the reference assembled but never wired a trainer for
        # (rtpose_mobilenetV2.py / openpose.py): stride-8 output, sigma 7,
        # unmasked MSE — the Config defaults.  mobilenet threads BatchNorm
        # running stats like shufflenet; openpose_v2 is stage-structured
        # like vgg19 (num_paf_stages=4 + num_heat_stages=2 internally,
        # --stages is accepted for the call contract and ignored).
        if args.size % 8:
            raise SystemExit(
                f"--model {args.model} needs --size divisible by 8 "
                f"(stride-8 trunk); got {args.size}")
    cfg.train.lr = args.lr
    cfg.train.clip_grad_norm = args.clip
    cfg.model.init_scheme = "scratch"  # no pretrained trunk in the image
    cfg.train.freeze_base_epochs = 0   # random init: nothing to protect
    cfg.train.checkpoint_every_steps = 0
    cfg.train.print_freq = 100
    cfg.train.checkpoint_dir = args.out

    print("rendering train pool + eval set...", flush=True)
    pool = make_pool(0, args.pool_batches, args.batch, args.size,
                     args.max_people)
    img_dir, ann_file = write_coco_eval_set(
        args.out, seed=999, n_images=args.eval_images, size=args.size,
        max_people=args.max_people)

    tr = Trainer(cfg)
    sh = pmesh.batch_sharding(tr.mesh)
    pool = [{k: jax.device_put(v, sh) for k, v in b.items()} for b in pool]

    if args.steps < 1:
        raise SystemExit("--steps must be >= 1")
    t0 = time.time()
    loss = float("nan")
    drop_step = int(args.steps * args.lr_drop_at)
    import jax.numpy as jnp
    for step in range(args.steps):
        if step == drop_step:
            tr.state = tr.state.replace(
                lr=jnp.asarray(args.lr * 0.1, jnp.float32))
        batch = pool[step % len(pool)]
        tr.state, logs = tr.train_step(tr.state, batch["image"],
                                       batch["keypoints"], None)
        if step % 100 == 0 or step == args.steps - 1:
            loss = float(np.asarray(logs["loss"]))
            print(f"step {step}: loss {loss:.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    mgr = CheckpointManager(args.out, keep=1)
    mgr.save(tr.state, step=args.steps, is_best=True,
             meta={"epoch": 1, "val_loss": loss})

    # Serving pipeline straight from the trained state — the same model
    # instance + variables layout load_pipeline() builds from a checkpoint.
    variables = {"params": tr.state.params}
    variables.update(tr.state.model_state or {})
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    pipe = PosePipeline(tr.model, variables, input_size=args.size,
                        preprocess_mode="vgg", flip=True,
                        thresh_heatmap=args.thresh_heatmap,
                        downsample=cfg.model.downsample,
                        pad_factor=64 if args.model == "hourglass" else 0)

    print("running the COCO eval harness on the held-out set...", flush=True)
    stats = run_eval_batched(
        img_dir, ann_file, pipe, batch_size=16, score_mode="person",
        results_path=os.path.join(args.out, "results.json"))

    # Re-score the SAME detections with the reference's fixed score=1.0
    # (no second forward) to quantify what person-score ranking buys.
    from rtpose_tpu.data.coco_json import CocoJson
    from rtpose_tpu.evalx.harness import eval_results
    with open(os.path.join(args.out, "results.json")) as f:
        results = json.load(f)
    coco = CocoJson(ann_file)
    parity = eval_results([{**r, "score": 1.0} for r in results], coco,
                          coco.img_ids(coco.cat_ids("person")))
    print(f"AP person-score {stats['AP']:.4f} vs parity-score "
          f"{parity['AP']:.4f}", flush=True)

    summary = {"steps": args.steps, "final_train_loss": loss,
               "eval_images": args.eval_images,
               "wall_s": round(time.time() - t0, 1),
               "AP_parity_score": round(float(parity["AP"]), 4),
               **{k: round(float(v), 4) for k, v in stats.items()}}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
