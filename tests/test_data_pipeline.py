"""Data pipeline: COCO reader, dataset, transforms, loader — on a
synthetic COCO fixture written to tmp_path."""

import json
import os

import numpy as np
import PIL.Image
import pytest

from rtpose_tpu.data.coco_json import CocoJson
from rtpose_tpu.data.dataset import (CocoKeypoints, Loader, add_neck,
                                     remove_illegal_joints)
from rtpose_tpu.data import transforms as T


@pytest.fixture
def coco_dir(tmp_path):
    """3 images with 1-2 annotated persons each."""
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 1
    for img_id in (1, 2, 3):
        w, h = 120, 100
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"{img_id:012d}.jpg"
        PIL.Image.fromarray(arr).save(img_dir / name)
        images.append({"id": img_id, "file_name": name,
                       "width": w, "height": h})
        for _ in range(1 + img_id % 2):
            kps = []
            for _k in range(17):
                kps += [float(rng.uniform(10, w - 10)),
                        float(rng.uniform(10, h - 10)), 2]
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17,
                "area": 2500.0, "iscrowd": 0,
                "bbox": [10.0, 10.0, 50.0, 50.0],
                "segmentation": [],
            })
            ann_id += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person",
                        "keypoints": [], "skeleton": []}],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


def test_coco_json_reader(coco_dir):
    img_dir, ann_file = coco_dir
    coco = CocoJson(ann_file)
    assert coco.cat_ids("person") == [1]
    assert coco.img_ids([1]) == [1, 2, 3]
    assert coco.ids_with_keypoints([1]) == [1, 2, 3]
    assert len(coco.annotations(2, [1])) == 1
    assert len(coco.annotations(1, [1])) == 2


def test_add_neck_matches_reference_order():
    kp17 = np.zeros((17, 3))
    kp17[5] = (10, 20, 2)    # left shoulder
    kp17[6] = (30, 40, 2)    # right shoulder
    kp18 = add_neck(kp17)
    assert kp18.shape == (18, 3)
    # neck at index 1 = rounded midpoint, visible
    np.testing.assert_array_equal(kp18[1], (20, 30, 2))
    # right shoulder at our index 2
    np.testing.assert_array_equal(kp18[2], (30, 40, 2))
    # one shoulder unlabeled -> neck invisible
    kp17[5, 2] = 0
    assert add_neck(kp17)[1, 2] == 0


def test_remove_illegal_joints():
    kps = np.zeros((1, 18, 3))
    kps[0, 0] = (370, 50, 2)
    kps[0, 1] = (50, -1, 2)
    kps[0, 2] = (50, 50, 2)
    out = remove_illegal_joints(kps, 368, 368)
    np.testing.assert_array_equal(out[0, 0], (-1, -1, 0))
    np.testing.assert_array_equal(out[0, 1], (-1, -1, 0))
    np.testing.assert_array_equal(out[0, 2], (50, 50, 2))


def test_dataset_sample_shapes(coco_dir):
    img_dir, ann_file = coco_dir
    ds = CocoKeypoints(image_dir=img_dir, ann_file=ann_file,
                       input_size=64, host_gt=True)
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["image"].shape == (64, 64, 3)
    assert s["keypoints"].shape == (32, 18, 3)
    assert s["heatmaps"].shape == (8, 8, 19)
    assert s["pafs"].shape == (8, 8, 38)


def test_loader_batches_deterministic(coco_dir):
    img_dir, ann_file = coco_dir
    ds = CocoKeypoints(image_dir=img_dir, ann_file=ann_file, input_size=64)
    loader = Loader(ds, batch_size=2, num_workers=2, seed=1,
                    drop_last=False)
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == len(ds)
    assert batches[0]["image"].shape[1:] == (64, 64, 3)


def test_loader_propagates_worker_errors(coco_dir):
    """A corrupt/missing sample must raise in the main thread, not hang the
    iterator forever (round-1 advisor finding: a dead worker never posted
    its sentinel)."""
    img_dir, ann_file = coco_dir
    ds = CocoKeypoints(image_dir=img_dir, ann_file=ann_file, input_size=64)
    real_get = ds.get

    def bad_get(index, rng):
        if index == 1:
            raise OSError("corrupt image")
        return real_get(index, rng)

    ds.get = bad_get
    loader = Loader(ds, batch_size=2, num_workers=2, seed=1,
                    drop_last=False)
    with pytest.raises(OSError, match="corrupt image"):
        for _ in loader:
            pass


def test_hflip_swaps_keypoints():
    img = PIL.Image.new("RGB", (100, 80))
    kp = np.zeros((1, 17, 3))
    kp[0, 5] = (10, 20, 2)   # left_shoulder
    kp[0, 6] = (90, 20, 2)   # right_shoulder
    s = T.Sample.new(img, kp)
    out = T.HFlip()(s, np.random.default_rng(0))
    # after flip: left_shoulder holds the mirrored old right shoulder
    np.testing.assert_allclose(out.keypoints[0, 5, 0], -90 - 1 + 100)
    np.testing.assert_allclose(out.keypoints[0, 6, 0], -10 - 1 + 100)
    assert out.meta["hflip"] is True


def test_rescale_keypoint_convention():
    img = PIL.Image.new("RGB", (100, 100))
    kp = np.zeros((1, 17, 3))
    kp[0, 0] = (40, 60, 2)
    s = T.Sample.new(img, kp)
    out = T.RescaleRelative(0.5)(s, np.random.default_rng(0))
    assert out.image.size == (50, 50)
    np.testing.assert_allclose(out.keypoints[0, 0, 0],
                               (40 + 0.5) * 0.5 - 0.5)


def test_crop_and_pad_round_trip():
    img = PIL.Image.new("RGB", (100, 80), (1, 2, 3))
    kp = np.zeros((1, 17, 3))
    kp[0, 0] = (50, 40, 2)
    s = T.Sample.new(img, kp)
    rng = np.random.default_rng(0)
    s = T.Crop(64)(s, rng)
    s = T.CenterPad(64)(s, rng)
    assert s.image.size == (64, 64)
    x, y = s.keypoints[0, 0, :2]
    assert 0 <= x < 64 and 0 <= y < 64


def test_train_pipeline_runs():
    img = PIL.Image.fromarray(
        (np.random.RandomState(0).rand(90, 110, 3) * 255).astype(np.uint8))
    kp = np.zeros((2, 17, 3))
    kp[:, :, 0] = 30
    kp[:, :, 1] = 40
    kp[:, :, 2] = 2
    s = T.Sample.new(img, kp)
    pipe = T.train_pipeline(64, rotate_degrees=40.0)
    out = pipe(s, np.random.default_rng(1))
    assert out.image.size == (64, 64)
    assert out.keypoints.shape == (2, 17, 3)


def test_blur_transform():
    img = PIL.Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8))
    s = T.Sample.new(img, np.zeros((1, 17, 3)))
    out = T.Blur(max_sigma=3.0)(s, np.random.default_rng(1))
    a = np.asarray(s.image, float)
    b = np.asarray(out.image, float)
    assert a.shape == b.shape
    # blur reduces high-frequency energy
    assert np.abs(np.diff(b, axis=0)).mean() <= np.abs(
        np.diff(a, axis=0)).mean()
