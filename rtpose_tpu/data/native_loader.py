"""Training data loader backed by the native C++ image pipeline.

The PIL loader (:class:`rtpose_tpu.data.dataset.Loader`) costs ~33 ms of
interpreter-bound work per image (~30 img/s/core) and its threads cannot
scale past the GIL — a single v5e chip consumes ~170 img/s (SCALING.md
'Input pipeline').  This loader keeps all *pixel* work in the C++ worker
pool (native/imgpipe.cpp: libjpeg decode, PIL-exact photometrics, PIL-exact
separable bicubic resample, fused crop/pad/normalize; measured 1.56x per
core and scales across cores GIL-free) and does only the cheap parts in
Python: augmentation parameter sampling, keypoint/mask geometry (a few
dozen floats per image), and batch assembly.

Augmentation family = the default reference training stack
(reference train/train_VGG19.py:124-130 order):
ColorJitter -> JpegCompression(p) -> Grayscale(p) -> HFlip(p) ->
RescaleRelative -> Crop -> CenterPad.  Every pixel op is differential-tested
bit-exact against the PIL path (tests/test_native_loader.py); the composed
geometric keypoint math reproduces data/transforms.py formula-for-formula.
RandomRotate/Blur augmentation is not supported here — use the PIL Loader
for non-default pipelines.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterator

import numpy as np

from ..native.imgpipe import ImgPipe, jpeg_size
from .dataset import MAX_PEOPLE_PER_IMAGE, CocoKeypoints
from .transforms import _SWAP17


@dataclasses.dataclass
class AugParams:
    """One image's sampled augmentation, in pipeline order."""
    brightness: float = 1.0
    contrast: float = 1.0
    saturation: float = 1.0
    hue_shift: int = -1      # -1 = no HSV round trip (jitter disabled)
    jpeg_quality: int = 0      # 0 = off
    grayscale: bool = False
    hflip: bool = False
    scale: float = 1.0
    crop_x: int = 0            # sampled only when the scaled image > edge
    crop_y: int = 0


def sample_aug(rng: np.random.Generator, w: int, h: int, *,
               square_edge: int = 368, scale_range=(0.5, 1.0),
               hflip_prob: float = 0.5, color_jitter: float = 0.1,
               hue: float = 0.1, jpeg_prob: float = 0.1,
               jpeg_quality: int = 50,
               grayscale_prob: float = 0.01) -> AugParams:
    """Draws in the exact order of transforms.train_pipeline so the
    augmentation *distribution* matches the PIL path."""
    p = AugParams()
    if color_jitter:
        p.brightness = 1.0 + (rng.random() * 2 - 1) * color_jitter
        p.contrast = 1.0 + (rng.random() * 2 - 1) * color_jitter
        p.saturation = 1.0 + (rng.random() * 2 - 1) * color_jitter
        if hue:
            # hue=0 must keep the -1 sentinel (skip the HSV round trip),
            # matching ColorJitter's `if self.hue:` — a zero-shift round
            # trip is NOT identity under uint8 HSV quantization.  Skipping
            # the draw also keeps the rng stream aligned with the PIL path.
            p.hue_shift = int((rng.random() * 2 - 1) * hue * 255) % 256
    if jpeg_prob and rng.random() <= jpeg_prob:
        p.jpeg_quality = jpeg_quality
    if grayscale_prob and rng.random() <= grayscale_prob:
        p.grayscale = True
    if hflip_prob and rng.random() <= hflip_prob:
        p.hflip = True
    if isinstance(scale_range, tuple):
        lo, hi = scale_range
        p.scale = lo + rng.random() * (hi - lo)
    else:
        p.scale = scale_range
    # Crop offsets (transforms.Crop): need the scaled size
    tw, th = int(w * p.scale), int(h * p.scale)
    pad = int(square_edge / 2.0)
    if tw > square_edge:
        p.crop_x = int(np.clip(rng.integers(-pad, tw - square_edge + pad),
                               0, tw - square_edge))
    if th > square_edge:
        p.crop_y = int(np.clip(rng.integers(-pad, th - square_edge + pad),
                               0, th - square_edge))
    return p


def apply_geometry(kp: np.ndarray, w: int, h: int, p: AugParams,
                   square_edge: int = 368):
    """Map (N, 17, 3) keypoints through the composed geometric pipeline
    using the exact formulas of data/transforms.py (HFlip/_rescale/Crop/
    CenterPad).  Returns (kp', job geometry dict)."""
    kp = np.array(kp, float)
    if p.hflip:
        kp[:, :, 0] = -kp[:, :, 0] - 1.0 + w
        if len(kp):
            kp = kp[:, _SWAP17, :]
    tw, th = int(w * p.scale), int(h * p.scale)
    x_scale, y_scale = tw / w, th / h
    kp[:, :, 0] = (kp[:, :, 0] + 0.5) * x_scale - 0.5
    kp[:, :, 1] = (kp[:, :, 1] + 0.5) * y_scale - 0.5
    new_w = min(square_edge, tw - p.crop_x)
    new_h = min(square_edge, th - p.crop_y)
    kp[:, :, 0] -= p.crop_x
    kp[:, :, 1] -= p.crop_y
    left = max(0, int((square_edge - new_w) / 2.0))
    top = max(0, int((square_edge - new_h) / 2.0))
    kp[:, :, 0] += left
    kp[:, :, 1] += top
    geom = dict(resize_wh=(tw, th), crop_xy=(p.crop_x, p.crop_y),
                content_xywh=(left, top, new_w, new_h))
    return kp, geom


class NativeLoader:
    """Drop-in replacement for :class:`dataset.Loader` (same batch dict
    contract) with pixel work in the C++ pool.  Only supports the default
    training augmentation family (see module docstring)."""

    def __init__(self, dataset: CocoKeypoints, batch_size: int,
                 shuffle: bool = True, threads: int = 8, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 4,
                 uint8_output: bool = False, deterministic: bool = False,
                 aug_kwargs: Dict = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # deterministic=True: every __iter__ yields identical batches
        # (epoch not folded into the rng) — val losses stay comparable
        # across epochs instead of moving with crop/jitter noise
        self.deterministic = deterministic
        # uint8_output: emit raw (un-normalized) uint8 canvases — 4x fewer
        # bytes to ship host->device; the jitted train step normalizes
        # in-graph when it sees a uint8 batch (train/trainer.py loss_fn)
        self.uint8_output = uint8_output
        self.aug_kwargs = dict(aug_kwargs or {})
        self.aug_kwargs.setdefault("square_edge", dataset.input_size)
        self.pipe = ImgPipe(threads)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, indices, rng) -> Dict[str, np.ndarray]:
        edge = self.dataset.input_size
        B = len(indices)
        images = np.zeros((B, edge, edge, 3),
                          np.uint8 if self.uint8_output else np.float32)
        windows = np.zeros((B, 4), np.int32)   # content x, y, w, h
        all_kps = np.zeros((B, MAX_PEOPLE_PER_IMAGE, 18, 3), np.float32)
        masks = np.zeros((B, edge // self.dataset.stride,
                          edge // self.dataset.stride, 1), np.float32)
        img_ids = np.zeros((B,), np.int64)
        blobs = []          # keep jpeg bytes alive until wait()
        finalize = []
        paths = []          # submit-order, to name any failing file
        for bi, index in enumerate(indices):
            img_id, path, kp17, corners = self.dataset.raw_sample(int(index))
            paths.append(path)
            with open(path, "rb") as f:
                blob = f.read()
            blobs.append(blob)
            w, h = jpeg_size(blob)
            p = sample_aug(rng, w, h, **self.aug_kwargs)
            n_people = len(kp17)
            all17 = np.concatenate([kp17, corners], axis=0) \
                if (len(kp17) or len(corners)) else np.zeros((0, 17, 3))
            kp_t, geom = apply_geometry(all17, w, h, p, edge)
            self.pipe.submit(
                blob,
                out=None if self.uint8_output else images[bi],
                out_u8=images[bi] if self.uint8_output else None,
                brightness=p.brightness, contrast=p.contrast,
                saturation=p.saturation, hue_shift=p.hue_shift,
                jpeg_quality=p.jpeg_quality, grayscale=p.grayscale,
                hflip=p.hflip, **geom)
            finalize.append((bi, kp_t, n_people))
            windows[bi] = geom["content_xywh"]
            img_ids[bi] = img_id
        for bi, kp_t, n_people in finalize:
            padded, mask, _ = self.dataset.finalize_keypoints(kp_t, n_people)
            all_kps[bi] = padded
            masks[bi] = mask
        failed = self.pipe.wait_failed()
        if failed:
            names = [paths[i] for i in failed if i < len(paths)]
            raise RuntimeError(
                f"native loader: {len(failed)} image(s) failed to "
                f"decode/augment: {names[:8]}"
                f"{'...' if len(names) > 8 else ''}")
        batch = {"image": images, "keypoints": all_kps,
                 "image_id": img_ids, "mask": masks}
        if self.uint8_output:
            # the train step needs the content window to reproduce the
            # float path's zero pad after in-graph normalization: pass
            # {"u8": batch["image"], "window": batch["valid_xywh"]} as
            # the images argument (train/trainer.py loss_fn)
            batch["valid_xywh"] = windows
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        epoch = 0 if self.deterministic else self.epoch
        rng = np.random.Generator(np.random.Philox(self.seed + epoch))
        if self.shuffle:
            rng.shuffle(order)
        self.epoch += 1
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        # one coordinator thread keeps `prefetch` batches staged; the C++
        # pool inside _make_batch does the heavy lifting with the GIL
        # released
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(self._make_batch(b, rng))
            except BaseException as e:  # noqa: BLE001 - re-raised below
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
