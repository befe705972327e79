"""Decompose the batched-eval per-batch cost on hardware.

The COCO-val-scale rehearsal (scripts/cocoval_rehearsal.py) measured a
steady-state ~0.45 s/img at batch 16 where bench.py's pipelined serving
path does ~7 ms/img — this script times each stage of one eval bucket in
isolation to find the gap: imread, host prep (resize+pad), H2D, jitted
forward+decode dispatch, the blocking People readback, and host result
conversion.

    python scripts/eval_breakdown.py --image-dir /tmp/cocoval_synth/images \
        --ann /tmp/cocoval_synth/annotations.json --weight /tmp/train_eval \
        --stages 2 --batches 6
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--weight", required=True)
    ap.add_argument("--stages", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, default=6)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.data.coco_json import CocoJson
    from rtpose_tpu.evalx.harness import append_result
    from rtpose_tpu.infer.pipeline import load_pipeline, people_to_numpy
    from rtpose_tpu.infer.preprocess import scale_pad_geometry

    pipe = load_pipeline(args.weight, model_name="vgg19",
                         num_stages=args.stages,
                         preprocess_mode="vgg", flip=True)

    coco = CocoJson(args.ann)
    ids = coco.img_ids(coco.cat_ids("person"))
    # pick the most common padded shape so every batch hits one program
    from collections import defaultdict
    buckets = defaultdict(list)
    for img_id in ids:
        info = coco.image_info(img_id)
        _, _, _, ph, pw = scale_pad_geometry(
            info["height"], info["width"], pipe.input_size, pipe.pad_factor)
        buckets[(ph, pw)].append(img_id)
    shape, bucket_ids = max(buckets.items(), key=lambda kv: len(kv[1]))
    need = args.batch * (args.batches + 1)
    bucket_ids = bucket_ids[:need]
    print(f"bucket {shape}: timing {args.batches} batches of {args.batch}")

    t = defaultdict(float)

    def batches():
        for i in range(0, len(bucket_ids), args.batch):
            chunk = bucket_ids[i:i + args.batch]
            if len(chunk) < args.batch:
                return
            yield chunk

    first = True
    n_batches = 0
    t_all0 = time.perf_counter()
    for chunk in batches():
        t0 = time.perf_counter()
        frames = [cv2.imread(os.path.join(
            args.image_dir, coco.image_info(i)["file_name"])) for i in chunk]
        t1 = time.perf_counter()
        ims, metas = zip(*(pipe._prep(im) for im in frames))
        stacked = np.stack(ims)
        t2 = time.perf_counter()
        batch = jnp.asarray(stacked)
        jax.block_until_ready(batch)          # enqueue-resolving on axon,
        np.asarray(batch[0, 0, 0, 0])         # force a sync point for H2D
        t3 = time.perf_counter()
        if first:
            tc0 = time.perf_counter()
            ticket = pipe._submit_stacked(list(ims), list(metas))
            jax.device_get(ticket[1].score)   # force compile + run
            print(f"compile+first run: {time.perf_counter() - tc0:.1f}s")
            first = False
            continue
        ticket = pipe._submit_stacked(list(ims), list(metas))
        t4 = time.perf_counter()
        people_host = jax.device_get(ticket[1])
        t5 = time.perf_counter()
        h_up = ticket[2].shape[1] * pipe.downsample
        w_up = ticket[2].shape[2] * pipe.downsample
        outputs = []
        for k, img_id in enumerate(chunk):
            from rtpose_tpu.ops.decode import People
            sub = People(coords=people_host.coords[k],
                         part_score=people_host.part_score[k],
                         score=people_host.score[k],
                         valid=people_host.valid[k],
                         truncated=people_host.truncated[k])
            people = people_to_numpy(sub, w_up, h_up)
            append_result(img_id, people, (w_up, h_up), outputs,
                          score_mode="person")
        t6 = time.perf_counter()
        t["imread"] += t1 - t0
        t["host_prep"] += t2 - t1
        t["h2d_sync"] += t3 - t2
        t["dispatch"] += t4 - t3
        t["collect_wait"] += t5 - t4
        t["host_convert"] += t6 - t5
        n_batches += 1
    wall = time.perf_counter() - t_all0

    per_img = {k: round(v / n_batches / args.batch * 1000, 2)
               for k, v in t.items()}
    print(json.dumps({
        "shape": list(shape), "batch": args.batch, "batches": n_batches,
        "ms_per_image": per_img,
        "serial_ms_per_image": round(sum(per_img.values()), 2),
        "wall_s": round(wall, 2)}, indent=1))


if __name__ == "__main__":
    main()
