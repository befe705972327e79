"""COCO evaluation CLI (reference evaluate/evaluation.py).

    python -m rtpose_tpu.evalx --image-dir /data/coco/val2017 \
        --ann /data/coco/annotations/person_keypoints_val2017.json \
        --weight ckpt.pth --preprocess vgg --flip
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image-dir", required=True)
    parser.add_argument("--ann", required=True)
    parser.add_argument("--weight", default=None)
    parser.add_argument("--model", default="vgg19")
    parser.add_argument("--preprocess", default="vgg")
    parser.add_argument("--input-size", type=int, default=368)
    parser.add_argument("--stages", type=int, default=6,
                        help="refinement stages / stacks")
    parser.add_argument("--downsample", type=int, default=0,
                        help="model output stride (0 = by model family: "
                             "4 for hourglass, 8 otherwise)")
    parser.add_argument("--batch", type=int, default=0,
                        help=">0: batched bucketed eval "
                             "(harness.run_eval_batched)")
    parser.add_argument("--pad-to", type=int, default=0, metavar="N",
                        help="quantize padded eval shapes up to multiples "
                             "of N px (e.g. 64): collapses the long tail "
                             "of per-resolution shape buckets into a "
                             "handful, so a val2017-scale first run pays "
                             "~10 program compiles instead of ~50. The "
                             "extra zero border perturbs edge activations "
                             "slightly (AP shifted 4e-4 on the 5000-image "
                             "rehearsal); keep the default 0 = exact "
                             "stride-8 pads for strict reference parity")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard eval batches over all local devices "
                             "(PosePipeline mesh serving); implies --batch")
    parser.add_argument("--gaussian-filt", action="store_true",
                        help="sigma=3 NMS refine smoothing (reference "
                             "bool_gaussian_filt, default off)")
    parser.add_argument("--multiscale", default=None, metavar="S1,S2,...",
                        help="comma-separated TTA scale factors (e.g. "
                             "0.5,1.0,1.5,2.0): fused multi-scale eval. "
                             "Composes with --batch (bucketed batched "
                             "multi-scale programs) and --data-parallel "
                             "(stacked chunks shard over the mesh "
                             "data axis)")
    parser.add_argument("--flip", action="store_true", default=True)
    parser.add_argument("--no-flip", dest="flip", action="store_false")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--score-mode", choices=("parity", "person"),
                        default="parity",
                        help="'parity': fixed detection score 1.0 like the "
                             "reference (coco_eval.py:151); 'person': rank "
                             "detections by assembled person score "
                             "(strictly better mAP, breaks results-JSON "
                             "parity)")
    parser.add_argument("--vis-dir", default=None)
    parser.add_argument("--results", default=None,
                        help="write results json here")
    parser.add_argument("--fp32", action="store_true")
    args = parser.parse_args()

    scales = None
    if args.multiscale:
        try:
            scales = tuple(float(s) for s in args.multiscale.split(","))
        except ValueError:
            raise SystemExit(f"--multiscale: could not parse "
                             f"{args.multiscale!r} as comma-separated "
                             f"floats")
        if not scales or any(s <= 0 for s in scales):
            raise SystemExit("--multiscale needs positive scale factors")

    mesh = None
    if args.data_parallel:
        from ..parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        args.batch = args.batch or 4 * mesh.shape["data"]

    from ..demo.picture_demo import build_pipeline
    pipe = build_pipeline(args, mesh=mesh)

    if args.batch:
        from .harness import run_eval_batched
        stats = run_eval_batched(args.image_dir, args.ann, pipe,
                                 batch_size=args.batch, limit=args.limit,
                                 vis_dir=args.vis_dir,
                                 score_mode=args.score_mode,
                                 results_path=args.results,
                                 scales=scales)
    else:
        from .harness import run_eval
        stats = run_eval(args.image_dir, args.ann, pipe,
                         vis_dir=args.vis_dir, limit=args.limit,
                         score_mode=args.score_mode,
                         results_path=args.results, scales=scales)
    print(json.dumps(stats, indent=2))
    print(f"mAP (OKS .50:.95) = {stats['AP']:.4f}")


if __name__ == "__main__":
    main()
