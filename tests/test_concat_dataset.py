"""Multi-annotation-file training (reference ConcatDataset parity).

The reference's train_factory concatenates ALL of ``args.train_annotations``
into one torch ConcatDataset (reference train/train_VGG19.py:50-60); the
round-3 verdict found our CLI silently trained on only the first file.
These tests pin: global indexing across files, both loaders seeing samples
from every file in one epoch, the CLI building the union, and loud errors
for empty/incompatible inputs.
"""

import json
import sys

import numpy as np
import PIL.Image
import pytest

from rtpose_tpu.data import transforms as T
from rtpose_tpu.data.dataset import CocoKeypoints, ConcatKeypoints, Loader


def _write_coco(tmp_path, img_dir, name, img_ids, w=96, h=80):
    rng = np.random.RandomState(img_ids[0])
    images, annotations = [], []
    ann_id = img_ids[0] * 100
    for img_id in img_ids:
        fname = f"{img_id:012d}.jpg"
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(img_dir / fname)
        images.append({"id": img_id, "file_name": fname,
                       "width": w, "height": h})
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(8, w - 8)),
                    float(rng.uniform(8, h - 8)), 2]
        annotations.append({
            "id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": kps, "num_keypoints": 17, "area": 900.0,
            "iscrowd": 0, "bbox": [8.0, 8.0, 30.0, 30.0],
            "segmentation": []})
        ann_id += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "person",
                           "keypoints": [], "skeleton": []}]}
    path = tmp_path / name
    path.write_text(json.dumps(ann))
    return str(path)


@pytest.fixture
def two_ann_dir(tmp_path):
    """One image dir, TWO annotation files with disjoint image ids."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    ann_a = _write_coco(tmp_path, img_dir, "ann_a.json", [1, 2, 3])
    ann_b = _write_coco(tmp_path, img_dir, "ann_b.json", [11, 12, 13, 14])
    return str(img_dir), ann_a, ann_b


def _ds(img_dir, ann, **kw):
    kw.setdefault("input_size", 64)
    kw.setdefault("preprocess", T.train_pipeline(64, (1.0, 1.0), 0.0, 0.0))
    return CocoKeypoints(image_dir=img_dir, ann_file=ann, **kw)


def test_concat_indexing_spans_all_files(two_ann_dir):
    img_dir, ann_a, ann_b = two_ann_dir
    ds = ConcatKeypoints([_ds(img_dir, ann_a), _ds(img_dir, ann_b)])
    assert len(ds) == 7
    rng = np.random.Generator(np.random.Philox(0))
    ids = {ds.get(i, rng)["image_id"] for i in range(len(ds))}
    assert ids == {1, 2, 3, 11, 12, 13, 14}
    # raw_sample routes through the same global->local mapping
    assert ds.raw_sample(0)[0] == 1
    assert ds.raw_sample(3)[0] == 11
    assert ds.raw_sample(6)[0] == 14
    with pytest.raises(IndexError):
        ds.raw_sample(7)
    # shared geometry is exposed for the loaders
    assert ds.input_size == 64 and ds.stride == 8


def test_loader_epoch_covers_both_files(two_ann_dir):
    img_dir, ann_a, ann_b = two_ann_dir
    ds = ConcatKeypoints([_ds(img_dir, ann_a), _ds(img_dir, ann_b)])
    loader = Loader(ds, batch_size=2, num_workers=2, seed=0,
                    drop_last=False)
    seen = set()
    for batch in loader:
        seen.update(int(i) for i in batch["image_id"])
    assert {1, 2, 3} & seen and {11, 12, 13, 14} & seen
    assert seen == {1, 2, 3, 11, 12, 13, 14}


def test_native_loader_epoch_covers_both_files(two_ann_dir):
    from rtpose_tpu.data.native_loader import NativeLoader

    img_dir, ann_a, ann_b = two_ann_dir
    ds = ConcatKeypoints([_ds(img_dir, ann_a), _ds(img_dir, ann_b)])
    loader = NativeLoader(ds, batch_size=2, shuffle=True, threads=2,
                          seed=0, drop_last=False,
                          aug_kwargs=dict(square_edge=64,
                                          scale_range=(1.0, 1.0),
                                          hflip_prob=0.0))
    seen = set()
    for batch in loader:
        seen.update(int(i) for i in batch["image_id"])
    assert seen == {1, 2, 3, 11, 12, 13, 14}


def test_concat_rejects_empty_and_mismatched(two_ann_dir):
    img_dir, ann_a, ann_b = two_ann_dir
    with pytest.raises(ValueError, match="at least one"):
        ConcatKeypoints([])
    with pytest.raises(ValueError, match="stride"):
        ConcatKeypoints([_ds(img_dir, ann_a, stride=8),
                         _ds(img_dir, ann_b, stride=4)])


def test_train_cli_unions_all_annotation_files(two_ann_dir, tmp_path,
                                               monkeypatch):
    """python -m rtpose_tpu.train with a 2-file train_annotations config
    must feed samples from BOTH files in one epoch (the round-3 gap:
    train_annotations[1:] were silently dropped)."""
    import rtpose_tpu.train.trainer as trainer_mod
    from rtpose_tpu.train.__main__ import main

    img_dir, ann_a, ann_b = two_ann_dir
    captured = {}

    class _CaptureTrainer:
        def __init__(self, cfg):
            self.cfg = cfg

        def fit(self, train_loader, val_loader, epochs=None):
            captured["train"] = train_loader

    monkeypatch.setattr(trainer_mod, "Trainer", _CaptureTrainer)
    monkeypatch.setattr(sys, "argv", [
        "train", "--epochs", "1", "--set",
        f'dataset.train_image_dir="{img_dir}"',
        f'dataset.train_annotations=["{ann_a}", "{ann_b}"]',
        f'dataset.val_image_dir="{img_dir}"',
        f'dataset.val_annotations="{ann_a}"',
        "dataset.image_size=64",
        "train.batch_size=2",
        "train.data_workers=2",
        f'train.checkpoint_dir="{tmp_path}/ckpt"',
    ])
    main()
    seen = set()
    for batch in captured["train"]:
        seen.update(int(i) for i in batch["image_id"])
    assert {1, 2, 3} & seen and {11, 12, 13, 14} & seen


def test_train_cli_rejects_empty_annotations(two_ann_dir, monkeypatch):
    img_dir, _, _ = two_ann_dir
    from rtpose_tpu.train.__main__ import main

    monkeypatch.setattr(sys, "argv", [
        "train", "--epochs", "1", "--set",
        f'dataset.train_image_dir="{img_dir}"',
        "dataset.train_annotations=[]",
    ])
    with pytest.raises(SystemExit, match="empty"):
        main()
