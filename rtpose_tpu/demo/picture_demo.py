"""Single-image demo (reference demo/picture_demo.py).

    python -m rtpose_tpu.demo.picture_demo --image ski.jpg \
        --weight pose_model.pth --preprocess rtpose --output result.png
"""

from __future__ import annotations

import argparse


def build_pipeline(args, mesh=None):
    import os

    import jax.numpy as jnp

    from ..utils.compile_cache import enable as _enable_compile_cache
    _enable_compile_cache()

    from ..infer.pipeline import load_pipeline

    # --weight accepts BOTH the reference's torch .pth/.ckpt files and an
    # orbax checkpoint DIRECTORY written by this framework's Trainer
    # (params-only restore, best step) — train here, eval/demo here
    is_ckpt_dir = bool(args.weight) and os.path.isdir(args.weight)
    downsample = getattr(args, "downsample", 0) or \
        (4 if args.model == "hourglass" else 8)
    # hourglass: stride-4 stem + depth-4 pooling needs the padded input
    # divisible by 64 for its skip-add shapes to line up (reference
    # train_SH.py uses a fixed 256 square for the same reason)
    pad_factor = (64 if args.model == "hourglass"
                  else getattr(args, "pad_to", 0))
    pipe = load_pipeline(
        checkpoint_dir=args.weight if is_ckpt_dir else None,
        torch_weights=None if is_ckpt_dir else args.weight,
        model_name=args.model, num_stages=args.stages,
        input_size=args.input_size, preprocess_mode=args.preprocess,
        flip=args.flip,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        mesh=mesh, downsample=downsample, pad_factor=pad_factor,
        gaussian_filt=getattr(args, "gaussian_filt", False),
        device_resize=(
            "auto" if getattr(args, "device_resize", False) else False))
    if args.weight:
        print(f"loaded weights from {args.weight}")
    return pipe


def add_common_args(parser):
    parser.add_argument("--model", default="vgg19")
    parser.add_argument("--weight", default=None,
                        help="reference .pth/.ckpt to import")
    parser.add_argument("--preprocess", default="rtpose",
                        choices=["rtpose", "vgg", "inception", "ssd"])
    parser.add_argument("--input-size", type=int, default=368)
    parser.add_argument("--stages", type=int, default=6,
                        help="refinement stages / stacks")
    parser.add_argument("--flip", action="store_true",
                        help="left/right flip TTA")
    parser.add_argument("--gaussian-filt", action="store_true",
                        help="sigma=3 smoothing of the NMS refine patch "
                             "(reference bool_gaussian_filt, default off)")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--device-resize", action="store_true",
                        help="ship raw uint8 frames; scale+pad in-graph "
                             "(fewer H2D bytes when frames are smaller "
                             "than --input-size)")
    parser.add_argument("--downsample", type=int, default=0,
                        help="model output stride (0 = by model family: "
                             "4 for hourglass, 8 otherwise)")


def main():
    import cv2

    from ..utils.draw import draw_people
    from ..utils.human import humans_from_people

    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--image", required=True)
    parser.add_argument("--output", default="result.png")
    args = parser.parse_args()

    pipe = build_pipeline(args)
    img = cv2.imread(args.image)
    if img is None:
        raise FileNotFoundError(args.image)
    people, heat, paf, meta = pipe.run(img)
    humans = humans_from_people(people)
    print(f"found {len(humans)} people")
    for h in humans:
        print(f"  score={h.score:.2f} parts={sorted(h.body_parts)}")
    out = draw_people(img, people, meta)
    cv2.imwrite(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
