"""Training CLI (reference train/train_VGG19.py entry).

    python -m rtpose_tpu.train --config experiments/vgg19_368x368_sgd.yaml \
        --set dataset.train_image_dir=/data/coco/train2017 ...
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None,
                        help="yaml/json experiment overlay")
    parser.add_argument("--set", nargs="*", default=[],
                        help="dot.path=value overrides")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--vgg-weights", default=None,
                        help="torchvision vgg19 .pth for backbone init "
                             "(reference use_vgg)")
    args = parser.parse_args()

    from ..config import apply_dotlist, load_config
    from ..utils.compile_cache import enable as _enable_compile_cache
    _enable_compile_cache()
    cfg = load_config(args.config)
    apply_dotlist(cfg, args.set)
    if cfg.train.data_loader not in ("pil", "native"):
        raise SystemExit(
            f"unknown train.data_loader={cfg.train.data_loader!r} "
            f"(expected 'pil' or 'native')")
    if cfg.train.data_loader == "native" and cfg.dataset.rotate_degrees:
        raise SystemExit(
            "train.data_loader=native does not support "
            "dataset.rotate_degrees — use the pil loader")

    from ..data.dataset import CocoKeypoints, ConcatKeypoints, Loader
    from ..data import transforms as T
    from .trainer import Trainer

    if not cfg.dataset.train_annotations:
        raise SystemExit("dataset.train_annotations is empty — need at "
                         "least one annotation file")
    # the reference trains on a ConcatDataset over ALL annotation files
    # (reference train/train_VGG19.py:50-60); one CocoKeypoints per file,
    # concatenated into a single map-style dataset
    train_parts = [
        CocoKeypoints(
            image_dir=cfg.dataset.train_image_dir,
            ann_file=ann,
            preprocess=T.train_pipeline(
                cfg.dataset.image_size,
                (cfg.dataset.scale_min, cfg.dataset.scale_max),
                cfg.dataset.hflip_prob, cfg.dataset.rotate_degrees),
            input_size=cfg.dataset.image_size,
            stride=cfg.model.downsample, sigma=cfg.dataset.sigma)
        for ann in cfg.dataset.train_annotations]
    train_ds = (train_parts[0] if len(train_parts) == 1
                else ConcatKeypoints(train_parts))
    val_ds = CocoKeypoints(
        image_dir=cfg.dataset.val_image_dir,
        ann_file=cfg.dataset.val_annotations,
        preprocess=T.Compose([T.RescaleRelative(1.0),
                              T.Crop(cfg.dataset.image_size),
                              T.CenterPad(cfg.dataset.image_size)]),
        input_size=cfg.dataset.image_size,
        stride=cfg.model.downsample, sigma=cfg.dataset.sigma)

    if cfg.train.data_loader == "native":
        # C++ imgpipe pool + uint8 wire format (SCALING.md 'Input
        # pipeline'). Only the default reference augmentation family is
        # supported natively (rotation rejected above).
        from ..data.native_loader import NativeLoader
        train_loader = NativeLoader(
            train_ds, cfg.train.batch_size, shuffle=True,
            threads=cfg.train.data_workers, seed=cfg.train.seed,
            uint8_output=True,
            aug_kwargs=dict(
                square_edge=cfg.dataset.image_size,
                scale_range=(cfg.dataset.scale_min, cfg.dataset.scale_max),
                hflip_prob=cfg.dataset.hflip_prob))
        # val: photometrics/flip/scale sampling disabled; crop offsets for
        # oversized images still sample, so deterministic=True pins them to
        # the same values every epoch (comparable val losses) and
        # drop_last=False keeps sets smaller than a batch evaluable
        val_loader = NativeLoader(
            val_ds, cfg.train.batch_size, shuffle=False,
            threads=cfg.train.data_workers, uint8_output=True,
            deterministic=True, drop_last=False,
            aug_kwargs=dict(
                square_edge=cfg.dataset.image_size,
                scale_range=1.0, hflip_prob=0.0, color_jitter=0.0,
                jpeg_prob=0.0, grayscale_prob=0.0))
    else:
        train_loader = Loader(train_ds, cfg.train.batch_size,
                              num_workers=cfg.train.data_workers,
                              seed=cfg.train.seed)
        # deterministic: same crops/jitter every epoch so the plateau/best
        # tracking follows the model, not per-epoch aug noise; no drop_last
        # so val sets smaller than a batch still evaluate
        val_loader = Loader(val_ds, cfg.train.batch_size, shuffle=False,
                            num_workers=cfg.train.data_workers,
                            deterministic=True, drop_last=False)

    trainer = Trainer(cfg)
    if args.vgg_weights:
        import jax
        import jax.numpy as jnp
        from ..models.import_torch import (import_vgg19_imagenet,
                                           load_torch_checkpoint)
        sd = load_torch_checkpoint(args.vgg_weights)
        host = jax.tree_util.tree_map(lambda x: x, trainer.state.params)
        imported = import_vgg19_imagenet(sd, host)
        from ..parallel import mesh as pmesh
        trainer.state = trainer.state.replace(
            params=pmesh.replicate(
                trainer.mesh,
                jax.tree_util.tree_map(jnp.asarray, imported)))
        print("initialized backbone from ImageNet vgg19 weights")

    trainer.fit(train_loader, val_loader, epochs=args.epochs)


if __name__ == "__main__":
    main()
