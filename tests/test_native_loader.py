"""Native C++ image pipeline vs the PIL path: bit-parity + loader contract.

The native pool (rtpose_tpu/native/imgpipe.cpp) re-implements every pixel
op of the default training augmentation; these tests pin each op to PIL
bit-exactly and the composed loader to the Python Loader on a deterministic
pipeline.
"""

import io
import json
import os

import numpy as np
import PIL.Image
import pytest

from rtpose_tpu.data import transforms as T
from rtpose_tpu.data.dataset import CocoKeypoints, Loader
from rtpose_tpu.data.native_loader import (NativeLoader, apply_geometry,
                                           sample_aug)
from rtpose_tpu.native import imgpipe

pytestmark = pytest.mark.skipif(not imgpipe.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def pipe():
    return imgpipe.ImgPipe(4)


@pytest.fixture(scope="module")
def jpg():
    rng = np.random.default_rng(0)
    arr = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, "jpeg", quality=92)
    return buf.getvalue()


def _run(pipe, jpg, ow, oh, **kw):
    out = np.zeros((oh, ow, 3), np.float32)
    u8 = np.zeros((oh, ow, 3), np.uint8)
    kw.setdefault("content_xywh", (0, 0, ow, oh))
    pipe.submit(jpg, out=out, out_u8=u8, **kw)
    pipe.wait()
    return out, u8


def test_decode_matches_pil(pipe, jpg):
    ref = np.asarray(PIL.Image.open(io.BytesIO(jpg)).convert("RGB"))
    _, u8 = _run(pipe, jpg, 160, 120)
    np.testing.assert_array_equal(u8, ref)
    assert imgpipe.jpeg_size(jpg) == (160, 120)


def test_photometric_ops_match_pil(pipe, jpg):
    from PIL import ImageEnhance
    pil = PIL.Image.open(io.BytesIO(jpg)).convert("RGB")
    cases = [
        (dict(brightness=1.08), ImageEnhance.Brightness(pil).enhance(1.08)),
        (dict(brightness=0.92), ImageEnhance.Brightness(pil).enhance(0.92)),
        (dict(contrast=1.07), ImageEnhance.Contrast(pil).enhance(1.07)),
        (dict(saturation=0.91), ImageEnhance.Color(pil).enhance(0.91)),
        (dict(grayscale=True), pil.convert("L").convert("RGB")),
    ]
    for hf in (0.1, -0.08, 0.03):
        cases.append((dict(hue_shift=int(hf * 255) % 256),
                      T.adjust_hue(pil, hf)))
    for kw, ref in cases:
        _, u8 = _run(pipe, jpg, 160, 120, **kw)
        np.testing.assert_array_equal(u8, np.asarray(ref), err_msg=str(kw))


def test_resize_matches_pil_bicubic(pipe, jpg):
    pil = PIL.Image.open(io.BytesIO(jpg)).convert("RGB")
    for tw, th in [(80, 60), (117, 93), (123, 45), (320, 240), (161, 121)]:
        _, u8 = _run(pipe, jpg, tw, th, resize_wh=(tw, th))
        ref = np.asarray(pil.resize((tw, th), PIL.Image.BICUBIC))
        np.testing.assert_array_equal(u8, ref, err_msg=f"{tw}x{th}")


def test_jpeg_recompress_matches_pil(pipe, jpg):
    pil = PIL.Image.open(io.BytesIO(jpg)).convert("RGB")
    buf = io.BytesIO()
    pil.save(buf, "jpeg", quality=50)
    ref = np.asarray(PIL.Image.open(buf).convert("RGB"))
    _, u8 = _run(pipe, jpg, 160, 120, jpeg_quality=50)
    np.testing.assert_array_equal(u8, ref)


def test_full_chain_matches_pil(pipe, jpg):
    """photometric -> flip -> resize -> crop/pad, all in one job."""
    from PIL import ImageEnhance
    pil = PIL.Image.open(io.BytesIO(jpg)).convert("RGB")
    img = ImageEnhance.Brightness(pil).enhance(1.05)
    img = ImageEnhance.Contrast(img).enhance(0.95)
    img = ImageEnhance.Color(img).enhance(1.02)
    img = T.adjust_hue(img, 0.04)
    img = img.transpose(PIL.Image.FLIP_LEFT_RIGHT)
    img = img.resize((120, 90), PIL.Image.BICUBIC)
    ref = np.zeros((100, 100, 3), np.uint8)
    crop = np.asarray(img)[5:90, 10:110]      # 85 x 100
    ref[2:87, 0:100] = crop
    _, u8 = _run(pipe, jpg, 100, 100,
                 brightness=1.05, contrast=0.95, saturation=1.02,
                 hue_shift=int(0.04 * 255) % 256, hflip=True,
                 resize_wh=(120, 90), crop_xy=(10, 5),
                 content_xywh=(0, 2, 100, 85))
    np.testing.assert_array_equal(u8, ref)
    # float32 output: ImageNet-normalized inside the window, 0 outside
    out, _ = _run(pipe, jpg, 100, 100,
                  brightness=1.05, contrast=0.95, saturation=1.02,
                  hue_shift=int(0.04 * 255) % 256, hflip=True,
                  resize_wh=(120, 90), crop_xy=(10, 5),
                  content_xywh=(0, 2, 100, 85))
    want = (ref.astype(np.float32) / 255.0 - T.IMAGENET_MEAN) \
        / T.IMAGENET_STD
    want[:2] = 0
    want[87:] = 0
    np.testing.assert_allclose(out, want.astype(np.float32), atol=1e-6)


# ---------------------------------------------------------------------------
# Composed loader vs the PIL Loader
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    """Synthetic COCO-shaped dataset: JPEGs + keypoint annotations."""
    tmp = tmp_path_factory.mktemp("coco")
    img_dir = tmp / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    images, anns = [], []
    aid = 1
    for i in range(8):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        name = f"{i:06d}.jpg"
        PIL.Image.fromarray(arr).save(img_dir / name, quality=90)
        images.append({"id": i, "file_name": name, "height": h, "width": w})
        for _ in range(int(rng.integers(1, 4))):
            kp = []
            for _ in range(17):
                kp += [float(rng.uniform(0, w)), float(rng.uniform(0, h)), 2]
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "iscrowd": 0, "keypoints": kp, "num_keypoints": 17,
                         "bbox": [0, 0, w, h], "area": w * h})
            aid += 1
        # one unlabeled region per image for mask coverage
        anns.append({"id": aid, "image_id": i, "category_id": 1,
                     "iscrowd": 1, "keypoints": [0] * 51,
                     "num_keypoints": 0,
                     "bbox": [10, 10, 50, 40], "area": 2000})
        aid += 1
    ann = tmp / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "person", "keypoints": [],
                        "skeleton": []}]}))
    return str(img_dir), str(ann)


def test_native_loader_matches_pil_loader_deterministic(coco_dir):
    """With photometrics off, fixed scale, and images small enough that no
    random crop fires, both loaders must produce identical batches."""
    img_dir, ann = coco_dir
    pipeline = T.Compose([T.RescaleRelative(0.75),
                          T.Crop(368), T.CenterPad(368)])
    ds_pil = CocoKeypoints(img_dir, ann, preprocess=pipeline)
    ds_nat = CocoKeypoints(img_dir, ann)
    pil_loader = Loader(ds_pil, batch_size=4, shuffle=False, num_workers=1)
    nat_loader = NativeLoader(
        ds_nat, batch_size=4, shuffle=False, threads=4,
        aug_kwargs=dict(scale_range=0.75, hflip_prob=0.0, color_jitter=0.0,
                        jpeg_prob=0.0, grayscale_prob=0.0))
    for bp, bn in zip(pil_loader, nat_loader):
        np.testing.assert_array_equal(bp["image_id"], bn["image_id"])
        np.testing.assert_allclose(bn["image"], bp["image"], atol=2e-6)
        np.testing.assert_allclose(bn["keypoints"], bp["keypoints"],
                                   atol=1e-9)
        np.testing.assert_array_equal(bn["mask"], bp["mask"])


def test_uint8_output_matches_float_path(coco_dir):
    """uint8_output ships raw pixels; normalizing them on the host must
    reproduce the float path's fused-normalize canvases exactly (same
    seed -> same sampled augmentation)."""
    from rtpose_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    img_dir, ann = coco_dir
    ds = CocoKeypoints(img_dir, ann)
    kw = dict(batch_size=4, shuffle=True, threads=4, seed=11)
    f32 = NativeLoader(ds, **kw)
    u8 = NativeLoader(ds, uint8_output=True, **kw)
    for bf, bu in zip(f32, u8):
        assert bu["image"].dtype == np.uint8
        norm = (bu["image"].astype(np.float32) / 255.0
                - IMAGENET_MEAN) / IMAGENET_STD
        # zero outside each content window (the float canvas's memset)
        for i, (x0, y0, w, h) in enumerate(bu["valid_xywh"]):
            m = np.zeros(norm.shape[1:3], bool)
            m[y0:y0 + h, x0:x0 + w] = True
            norm[i][~m] = 0.0
        np.testing.assert_allclose(norm, bf["image"], atol=2e-6)
        np.testing.assert_array_equal(bu["keypoints"], bf["keypoints"])
        np.testing.assert_array_equal(bu["mask"], bf["mask"])


def test_train_step_accepts_uint8_batch(coco_dir):
    """The jitted train step normalizes uint8 batches in-graph: one step
    from the same init on uint8 vs pre-normalized float input must give
    the same loss."""
    import jax.numpy as jnp

    from rtpose_tpu.config import Config
    from rtpose_tpu.train.trainer import Trainer

    img_dir, ann = coco_dir
    cfg = Config()
    cfg.model.num_stages = 1
    cfg.model.dtype = "float32"
    cfg.dataset.image_size = 64
    cfg.train.freeze_base_epochs = 0
    ds = CocoKeypoints(img_dir, ann, input_size=64)
    loader = NativeLoader(ds, batch_size=8, shuffle=False, threads=2,
                          uint8_output=True,
                          aug_kwargs=dict(scale_range=0.3, hflip_prob=0.0,
                                          color_jitter=0.0, jpeg_prob=0.0,
                                          grayscale_prob=0.0))
    batch = next(iter(loader))
    from rtpose_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    imgf = (batch["image"].astype(np.float32) / 255.0
            - IMAGENET_MEAN) / IMAGENET_STD
    for i, (x0, y0, w, h) in enumerate(batch["valid_xywh"]):
        m = np.zeros(imgf.shape[1:3], bool)
        m[y0:y0 + h, x0:x0 + w] = True
        imgf[i][~m] = 0.0

    tr = Trainer(cfg)
    _, logs_u8 = tr.train_step(
        tr.state,
        {"u8": jnp.asarray(batch["image"]),
         "window": jnp.asarray(batch["valid_xywh"])},
        jnp.asarray(batch["keypoints"]),
        jnp.asarray(batch["mask"]))
    tr2 = Trainer(cfg)
    _, logs_f32 = tr2.train_step(tr2.state, jnp.asarray(imgf),
                                 jnp.asarray(batch["keypoints"]),
                                 jnp.asarray(batch["mask"]))
    np.testing.assert_allclose(float(logs_u8["loss"]),
                               float(logs_f32["loss"]), rtol=1e-5)


def test_native_loader_augmented_contract(coco_dir):
    """Full augmentation on: shapes, dtype, keypoint legality, zero padding
    outside the valid area."""
    img_dir, ann = coco_dir
    ds = CocoKeypoints(img_dir, ann)
    loader = NativeLoader(ds, batch_size=4, shuffle=True, threads=4, seed=3)
    n = 0
    for batch in loader:
        assert batch["image"].shape == (4, 368, 368, 3)
        assert batch["image"].dtype == np.float32
        assert batch["keypoints"].shape == (4, 32, 18, 3)
        kp = batch["keypoints"]
        vis = kp[..., 2] > 0
        assert (kp[..., 0][vis] >= 0).all() and (kp[..., 0][vis] < 368).all()
        assert (kp[..., 1][vis] >= 0).all() and (kp[..., 1][vis] < 368).all()
        assert batch["mask"].shape == (4, 46, 46, 1)
        n += 1
    assert n == len(loader) == 2


def test_geometry_maps_pixels_and_keypoints_together(pipe):
    """Render dots at known positions, push pixels through the native chain
    and coordinates through apply_geometry: dots must land within 1.5 px."""
    rng = np.random.default_rng(5)
    h, w = 300, 420
    arr = np.zeros((h, w, 3), np.uint8)
    pts = np.stack([rng.uniform(30, w - 30, 6),
                    rng.uniform(30, h - 30, 6)], axis=1)
    for x, y in pts:
        arr[int(y) - 2:int(y) + 3, int(x) - 2:int(x) + 3] = 255
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, "jpeg", quality=98)
    jpg = buf.getvalue()

    kp = np.zeros((1, 17, 3))
    kp[0, :6, :2] = pts
    kp[0, :6, 2] = 2
    for seed in range(4):
        p = sample_aug(np.random.Generator(np.random.Philox(seed)), w, h,
                       color_jitter=0.0, jpeg_prob=0.0, grayscale_prob=0.0)
        kp_t, geom = apply_geometry(kp, w, h, p, 368)
        out = np.zeros((368, 368, 3), np.float32)
        u8 = np.zeros((368, 368, 3), np.uint8)
        pipe.submit(jpg, out=out, out_u8=u8, hflip=p.hflip, **geom)
        pipe.wait()
        # hflip swaps left/right part slots; undo for comparison
        kpc = kp_t[0][T._SWAP17] if p.hflip else kp_t[0]
        n_checked = 0
        for j in range(6):
            x, y = kpc[j, :2]
            if not (2 <= x < 366 and 2 <= y < 366):
                continue
            win = u8[int(y) - 2:int(y) + 3, int(x) - 2:int(x) + 3, 0]
            assert win.max() > 100, (seed, j, x, y)
            n_checked += 1
        # vacuous-pass guard: a geometry regression that maps every point
        # off-canvas must fail, not skip all assertions
        assert n_checked >= 2, (seed, kpc[:6, :2])


def test_native_loader_throughput_report(coco_dir):
    """Not an assertion — prints native vs PIL steady-state throughput."""
    import time
    img_dir, ann = coco_dir
    ds = CocoKeypoints(img_dir, ann)
    nat = NativeLoader(ds, batch_size=8, shuffle=False, threads=8)
    t0 = time.perf_counter()
    n = sum(b["image"].shape[0] for _ in range(3) for b in nat)
    dt = time.perf_counter() - t0
    print(f"\nnative loader: {n / dt:.1f} img/s")


def test_hue_zero_shift_still_round_trips(pipe, jpg):
    """ColorJitter applies the lossy HSV round trip even when the sampled
    shift is 0; hue_shift=0 must match that, and -1 must be a no-op."""
    pil = PIL.Image.open(io.BytesIO(jpg)).convert("RGB")
    _, u8 = _run(pipe, jpg, 160, 120, hue_shift=0)
    np.testing.assert_array_equal(u8, np.asarray(T.adjust_hue(pil, 0.0)))
    _, u8 = _run(pipe, jpg, 160, 120, hue_shift=-1)
    np.testing.assert_array_equal(u8, np.asarray(pil))


def test_wait_failed_reports_submit_indices(pipe, jpg):
    """A corrupt JPEG fails its own job only, and wait_failed names the
    submit-order index so callers can identify the offending file
    (advisor round-2: the pool previously dropped job identity)."""
    good = np.zeros((120, 160, 3), np.float32)
    bad = np.zeros((120, 160, 3), np.float32)
    good2 = np.zeros((120, 160, 3), np.float32)
    pipe.submit(jpg, out=good, content_xywh=(0, 0, 160, 120))
    pipe.submit(b"not a jpeg at all", out=bad,
                content_xywh=(0, 0, 160, 120))
    pipe.submit(jpg, out=good2, content_xywh=(0, 0, 160, 120))
    assert pipe.wait_failed() == [1]
    assert np.any(good != 0) and np.any(good2 != 0)
    assert not np.any(bad)
    # counter resets per wait; a clean round reports nothing
    pipe.submit(jpg, out=good, content_xywh=(0, 0, 160, 120))
    assert pipe.wait_failed() == []
    # wait() raises with the indices in the message
    pipe.submit(b"corrupt", out=bad, content_xywh=(0, 0, 160, 120))
    with pytest.raises(RuntimeError, match=r"\[0\]"):
        pipe.wait()


def test_train_cli_native_loader(coco_dir, tmp_path, monkeypatch):
    """The production CLI (python -m rtpose_tpu.train) trains through the
    native uint8 loader when train.data_loader=native: Trainer.run_epoch
    must build the {"u8", "window"} wire format from the loader batches
    for both the train and the deterministic-val epochs."""
    import sys

    from rtpose_tpu.train.__main__ import main

    img_dir, ann = coco_dir
    monkeypatch.setattr(sys, "argv", [
        "train", "--epochs", "1", "--set",
        f'dataset.train_image_dir="{img_dir}"',
        f'dataset.train_annotations=["{ann}"]',
        f'dataset.val_image_dir="{img_dir}"',
        f'dataset.val_annotations="{ann}"',
        "dataset.image_size=64",
        "parallel.num_data=1",
        "train.data_loader=native",
        "train.batch_size=4",
        "train.data_workers=2",
        "train.freeze_base_epochs=0",
        "train.print_freq=100",
        'model.dtype="float32"',
        "model.num_stages=1",
        f'train.checkpoint_dir="{tmp_path}/ckpt"',
    ])
    main()
    import os
    assert os.path.isdir(f"{tmp_path}/ckpt")


def test_train_cli_native_loader_rejects_rotation(coco_dir, tmp_path,
                                                  monkeypatch):
    import sys

    from rtpose_tpu.train.__main__ import main

    img_dir, ann = coco_dir
    monkeypatch.setattr(sys, "argv", [
        "train", "--epochs", "1", "--set",
        f'dataset.train_image_dir="{img_dir}"',
        f'dataset.train_annotations=["{ann}"]',
        "dataset.rotate_degrees=40.0",
        "train.data_loader=native",
    ])
    with pytest.raises(SystemExit, match="rotate"):
        main()


def test_train_cli_rejects_unknown_loader(coco_dir, monkeypatch):
    """A typo'd train.data_loader must fail fast with a clear message, not
    fall through to some arbitrary branch."""
    import sys

    from rtpose_tpu.train.__main__ import main

    img_dir, ann = coco_dir
    monkeypatch.setattr(sys, "argv", [
        "train", "--epochs", "1", "--set",
        f'dataset.train_image_dir="{img_dir}"',
        f'dataset.train_annotations=["{ann}"]',
        'train.data_loader="natve"',
    ])
    with pytest.raises(SystemExit, match="unknown train.data_loader"):
        main()


def test_uint8_wire_format_on_sharded_mesh():
    """The uint8 {"u8", "window"} wire format must shard over a DP mesh
    exactly like the float canvas: run_epoch on the virtual 8-device mesh
    gives the same eval loss either way."""
    import jax
    import jax.numpy as jnp

    from rtpose_tpu.config import Config
    from rtpose_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from rtpose_tpu.parallel import mesh as pmesh
    from rtpose_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.num_stages = 1
    cfg.model.dtype = "float32"
    cfg.dataset.image_size = 64
    cfg.train.freeze_base_epochs = 0
    mesh = pmesh.make_mesh(8, 1)
    tr = Trainer(cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    u8 = (rng.random((8, 64, 64, 3)) * 255).astype(np.uint8)
    win = np.tile(np.array([4, 2, 56, 60], np.int32), (8, 1))
    kps = np.zeros((8, 32, 18, 3), np.float32)
    kps[:, 0, :, 0] = rng.uniform(5, 59, (8, 18))
    kps[:, 0, :, 1] = rng.uniform(5, 59, (8, 18))
    kps[:, 0, :, 2] = 2
    imgf = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    m = np.zeros((64, 64), bool)
    m[2:62, 4:60] = True
    imgf[:, ~m] = 0.0

    batch_u8 = {"image": u8, "keypoints": kps, "valid_xywh": win}
    batch_f32 = {"image": imgf, "keypoints": kps}
    logs_u8 = tr.run_epoch([batch_u8], train=False, log_every=100)
    logs_f32 = tr.run_epoch([batch_f32], train=False, log_every=100)
    np.testing.assert_allclose(logs_u8["loss"], logs_f32["loss"], rtol=1e-6)


def test_sample_aug_hue_zero_keeps_sentinel():
    """Regression: hue=0 with color_jitter>0 must keep the -1 'no HSV
    round trip' sentinel — a zero-shift round trip is lossy under uint8
    HSV quantization, diverging from the PIL path which skips adjust_hue
    entirely when hue is 0."""
    from rtpose_tpu.data.native_loader import sample_aug

    rng = np.random.Generator(np.random.Philox(7))
    p = sample_aug(rng, 200, 150, color_jitter=0.1, hue=0.0)
    assert p.hue_shift == -1
    rng = np.random.Generator(np.random.Philox(7))
    p = sample_aug(rng, 200, 150, color_jitter=0.1, hue=0.1)
    assert p.hue_shift != -1


def test_native_loader_deterministic_val(coco_dir):
    """deterministic=True: every __iter__ yields identical batches (crop
    offsets for oversized images included), so val losses are comparable
    across epochs."""
    from rtpose_tpu.data.dataset import CocoKeypoints
    from rtpose_tpu.data.native_loader import NativeLoader

    img_dir, ann = coco_dir
    ds = CocoKeypoints(img_dir, ann, input_size=48, stride=8)
    loader = NativeLoader(ds, 2, shuffle=False, threads=2,
                          deterministic=True, drop_last=False,
                          aug_kwargs=dict(square_edge=48, scale_range=1.0,
                                          hflip_prob=0.0, color_jitter=0.0,
                                          jpeg_prob=0.0, grayscale_prob=0.0))
    e1 = [b["image"].copy() for b in loader]
    e2 = [b["image"].copy() for b in loader]
    assert len(e1) == len(e2) and len(e1) > 0
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(a, b)


def test_out_of_canvas_window_fails_job(pipe, jpg):
    """Regression: a destination window exceeding the canvas must FAIL the
    job (like every other error path) — not scribble past the caller's
    buffer from a worker thread."""
    out = np.zeros((50, 50, 3), np.float32)
    pipe.submit(jpg, out=out, content_xywh=(30, 30, 40, 40))
    with pytest.raises(RuntimeError, match="failed"):
        pipe.wait()


def test_submit_retains_buffers_until_wait(coco_dir):
    """The pipe itself keeps jpeg bytes alive until wait(): submitting a
    temporary (no caller-held reference) must be safe."""
    import gc

    img_dir, _ann = coco_dir
    name = sorted(os.listdir(img_dir))[0]
    p = imgpipe.ImgPipe(2)
    outs = []
    for _ in range(8):
        with open(os.path.join(img_dir, name), "rb") as f:
            blob = f.read()
        u8 = np.zeros((64, 64, 3), np.uint8)
        outs.append(u8)
        p.submit(bytes(blob), out_u8=u8, resize_wh=(64, 64),
                 content_xywh=(0, 0, 64, 64))
        del blob
        gc.collect()
    p.wait()
    for u8 in outs:
        assert u8.any()
    p.close()
