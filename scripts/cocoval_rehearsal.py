"""COCO-val2017-scale eval dress rehearsal (no COCO data in the image).

Generates a ~5,000-image synthetic set matching val2017's REAL shape
profile — the reference's headline eval runs 5,000 images across dozens
of padded-shape buckets (reference evaluate/coco_eval.py:245-283) and our
batched eval had never been exercised past ~100 images — then the
rehearsal itself is the exact COCO_RUNBOOK.md command:

    python scripts/cocoval_rehearsal.py --out /tmp/cocoval_synth --n 5000
    python -m rtpose_tpu.evalx --image-dir /tmp/cocoval_synth/images \
        --ann /tmp/cocoval_synth/annotations.json --preprocess vgg \
        --batch 16 --results /tmp/cocoval_results.json

Measured quantities land in the eval stats (pipeline_s / evaluator_s /
n_buckets / images_in_sub_batch_buckets, evalx/harness.py) and are
recorded in SCALING.md.
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

# val2017's shape profile: dominated by max-side-640 landscape frames
# (4:3 and 3:2), a portrait minority, a handful of squares/odd sizes.
# (w, h, weight) — weights approximate the real histogram closely enough
# to reproduce its bucket structure after scale_pad_geometry.
VAL2017_SHAPES = [
    (640, 480, 0.26), (640, 427, 0.18), (640, 426, 0.05), (640, 425, 0.03),
    (480, 640, 0.08), (427, 640, 0.09), (426, 640, 0.02), (425, 640, 0.01),
    (640, 428, 0.02), (428, 640, 0.01), (640, 424, 0.01), (424, 640, 0.01),
    (500, 375, 0.035), (375, 500, 0.015), (500, 333, 0.02), (333, 500, 0.01),
    (640, 360, 0.02), (360, 640, 0.01), (640, 512, 0.02), (512, 640, 0.01),
    (612, 612, 0.015), (640, 640, 0.01), (500, 500, 0.005),
    (640, 478, 0.01), (478, 640, 0.005), (640, 457, 0.01), (457, 640, 0.005),
    (577, 640, 0.005), (640, 577, 0.01), (320, 240, 0.005), (240, 320, 0.005),
    # long tail of one-off resolutions (val2017 has ~100 unique shapes)
    ("odd", "odd", 0.05),
]

# people-per-image profile: val2017 person images average ~2.7 annotated
# people with a crowded tail (up to dozens); capped at the renderer's 32
PEOPLE_COUNTS = [1, 2, 3, 4, 5, 6, 8, 10, 13, 16, 20]
PEOPLE_WEIGHTS = [.32, .24, .14, .09, .06, .05, .04, .03, .015, .01, .005]


def sample_shape(rng):
    weights = np.array([w for _, _, w in VAL2017_SHAPES])
    idx = rng.choice(len(VAL2017_SHAPES), p=weights / weights.sum())
    w, h, _ = VAL2017_SHAPES[idx]
    if w == "odd":
        w = int(rng.randint(200, 641))
        h = int(rng.randint(150, 641))
    return int(w), int(h)


def write_set(out_dir, n_images, seed=0, jpeg_quality=95):
    import cv2

    from hw_train_synth import person_to_coco_annotation

    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    t0 = time.perf_counter()
    for img_id in range(1, n_images + 1):
        w, h = sample_shape(rng)
        n_people = int(rng.choice(PEOPLE_COUNTS,
                                  p=np.array(PEOPLE_WEIGHTS)
                                  / sum(PEOPLE_WEIGHTS)))
        img, kps = render_scene(rng, n_people=n_people, height=h, width=w)
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), img,
                    [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})
        for person in kps:
            ann = person_to_coco_annotation(person, img_id, ann_id)
            if ann is None:
                continue
            annotations.append(ann)
            ann_id += 1
        if img_id % 500 == 0:
            print(f"rendered {img_id}/{n_images} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    ann_file = os.path.join(out_dir, "annotations.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    print(f"wrote {n_images} images / {len(annotations)} annotations "
          f"to {out_dir} in {time.perf_counter() - t0:.0f}s")
    return img_dir, ann_file


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/cocoval_synth")
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    write_set(args.out, args.n, seed=args.seed)


if __name__ == "__main__":
    main()
