"""Hardware training run on synthetic learnable scenes (no COCO in image).

Renders people as colored skeletons on textured backgrounds at 368x368 so
the image->heatmap/PAF mapping is learnable, then exercises the FULL
training schedule on the real TPU: freeze phase -> backbone release,
ReduceLROnPlateau, mid-epoch elastic checkpoints, and a kill/restore in
the middle of the run (a brand-new Trainer restoring from disk and
continuing the trajectory).

Writes a JSONL loss log + a summary for SCALING.md.

    python scripts/hw_train_synth.py --steps-per-epoch 100 --epochs 6 \
        --out /tmp/hw_train
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


def render_scene(rng, size=368, n_people=3, height=None, width=None):
    """Colored-skeleton scene + padded keypoints (learnable mapping).

    height/width override ``size`` for non-square scenes (the COCO-val
    dress-rehearsal set samples real val2017 resolutions)."""
    import cv2

    from rtpose_tpu.skeleton import LIMBS, NUM_PARTS
    from util_synth import random_people

    h = height or size
    w = width or size
    img = (rng.rand(max(1, h // 8), max(1, w // 8), 3) * 80
           + 60).astype(np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    people = random_people(rng, n_people, h, w,
                           scale_range=(0.25, 0.6))
    part_colors = [(int(37 * p % 255), int(91 * p % 255), 255 - 13 * p % 255)
                   for p in range(NUM_PARTS)]
    for person in people:
        for a, b in LIMBS:
            pa = tuple(int(v) for v in person[a])
            pb = tuple(int(v) for v in person[b])
            cv2.line(img, pa, pb, (230, 230, 230), 3)
        for part in range(NUM_PARTS):
            px, py = (int(v) for v in person[part])
            cv2.circle(img, (px, py), 5, part_colors[part], -1)
    kps = np.zeros((32, 18, 3), np.float32)
    n = min(len(people), 32)
    kps[:n, :, :2] = people[:n]
    kps[:n, :, 2] = 2
    return img, kps


def person_to_coco_annotation(person, img_id, ann_id):
    """Rendered 18-part pose -> COCO 17-kp person annotation dict (the
    inverse of evalx.harness.person_to_coco_keypoints' part order), or
    None when the pose has no visible parts.  Shared by the held-out
    eval-set writer (hw_train_to_eval.py) and the val2017-scale
    rehearsal writer (cocoval_rehearsal.py) so visibility/bbox semantics
    cannot diverge between the two synthetic sets."""
    from rtpose_tpu.skeleton import ORDER_COCO

    if not person[:, 2].any():
        return None
    coco_kp = np.zeros((17, 3))
    for slot, part in enumerate(ORDER_COCO):
        coco_kp[slot] = (person[part, 0], person[part, 1], 2)
    xs, ys = coco_kp[:, 0], coco_kp[:, 1]
    return {
        "id": ann_id, "image_id": img_id, "category_id": 1,
        "keypoints": [float(v) for v in coco_kp.reshape(-1)],
        "num_keypoints": 17, "iscrowd": 0,
        "area": float((xs.max() - xs.min()) * (ys.max() - ys.min())),
        "bbox": [float(xs.min()), float(ys.min()),
                 float(xs.max() - xs.min()),
                 float(ys.max() - ys.min())],
    }


def make_batches(seed, n_batches, batch, size):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        imgs = np.zeros((batch, size, size, 3), np.float32)
        kps = np.zeros((batch, 32, 18, 3), np.float32)
        for i in range(batch):
            img, kp = render_scene(rng, size, n_people=1 + rng.randint(4))
            imgs[i] = img.astype(np.float32) / 255.0 - 0.5
            kps[i] = kp
        out.append({"image": imgs, "keypoints": kps})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=72)
    ap.add_argument("--size", type=int, default=368)
    ap.add_argument("--stages", type=int, default=6)
    ap.add_argument("--steps-per-epoch", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--pool-batches", type=int, default=24)
    ap.add_argument("--restore-at-epoch", type=int, default=3,
                    help="simulate a crash: fresh Trainer restores from "
                         "the latest mid-epoch checkpoint here")
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--out", default="/tmp/hw_train")
    args = ap.parse_args()

    import jax

    from rtpose_tpu.config import Config
    from rtpose_tpu.train.checkpoint import CheckpointManager
    from rtpose_tpu.train.trainer import Trainer

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "loss_log.jsonl")
    log_f = open(log_path, "a")

    def cfg():
        c = Config()
        c.model.num_stages = args.stages
        c.model.dtype = "bfloat16"
        c.dataset.image_size = args.size
        c.train.lr = args.lr
        c.train.freeze_base_epochs = 1
        c.train.lr_patience = 1
        c.train.lr_cooldown = 0
        c.train.lr_factor = 0.7
        c.train.checkpoint_every_steps = 40
        c.train.print_freq = 20
        c.train.checkpoint_dir = args.out
        return c

    print("rendering synthetic pool...", flush=True)
    pool = make_batches(0, args.pool_batches, args.batch, args.size)
    val = make_batches(999, 2, args.batch, args.size)

    tr = Trainer(cfg())
    mgr = CheckpointManager(args.out, keep=3)

    # Stage the whole pool in HBM once (~2.8 GB at 24x72x368x368 fp32):
    # the tunnel moves ~60 MB/s, so per-step H2D of 117 MB images would
    # dominate the 0.4 s step. Real pipelines prefetch; here the dataset
    # is small enough to be resident.
    from rtpose_tpu.parallel import mesh as pmesh
    sh = pmesh.batch_sharding(tr.mesh)
    print("staging pool on device...", flush=True)
    pool = [{k: jax.device_put(v, sh) for k, v in b.items()} for b in pool]
    val = [{k: jax.device_put(v, sh) for k, v in b.items()} for b in val]
    t_start = time.time()
    restored_marker = None

    for epoch in range(args.epochs):
        if epoch == args.restore_at_epoch:
            # ---- simulated crash + elastic restore -------------------------
            print(f"=== simulating crash at epoch {epoch}: new Trainer, "
                  f"restore latest checkpoint ===", flush=True)
            tr = Trainer(cfg())
            restored = mgr.restore_latest(tr.state)
            assert restored is not None, "no checkpoint to restore"
            tr.state, meta = restored
            tr.epoch = meta.get("epoch", epoch)
            tr.best_val = meta.get("best_val", float("inf"))
            tr.plateau.load_state_dict(meta.get("plateau",
                                                tr.plateau.state_dict()))
            restored_marker = {"epoch": epoch,
                               "restored_step": int(np.asarray(tr.state.step)),
                               "meta_epoch": meta.get("epoch")}
            print(f"restored at step {restored_marker['restored_step']}",
                  flush=True)

        tr.maybe_release_backbone()
        # train "epoch" over the pool
        steps = args.steps_per_epoch
        batches = [pool[i % len(pool)] for i in range(steps)]
        logs = tr.run_epoch(batches, train=True, ckpt=mgr)
        val_logs = tr.run_epoch(val, train=False)
        lr = tr.plateau.step(val_logs["loss"])
        import jax.numpy as jnp
        tr.state = tr.state.replace(lr=jnp.asarray(lr, jnp.float32))
        is_best = val_logs["loss"] < tr.best_val
        tr.best_val = min(tr.best_val, val_logs["loss"])
        tr.epoch += 1
        mgr.save(tr.state, step=int(np.asarray(tr.state.step)),
                 is_best=is_best,
                 meta={"epoch": tr.epoch, "best_val": tr.best_val,
                       "plateau": tr.plateau.state_dict(),
                       "val_loss": val_logs["loss"]})
        rec = {"epoch": tr.epoch, "step": int(np.asarray(tr.state.step)),
               "train_loss": logs["loss"], "val_loss": val_logs["loss"],
               "lr": lr, "wall_s": round(time.time() - t_start, 1),
               "frozen": tr.epoch <= 1}
        if restored_marker and restored_marker["epoch"] == epoch:
            rec["restored"] = restored_marker
        log_f.write(json.dumps(rec) + "\n")
        log_f.flush()
        print("EPOCH", json.dumps(rec), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
