"""COCO keypoint dataset + batched prefetching loader.

The TPU-native analogue of reference lib/datasets/datasets.py:95-311
(CocoKeypoints): decode + augment on host workers, but synthesize the GT
heatmaps/PAFs **on device** from padded keypoint arrays
(data/gt.py ground_truth_maps_batch) — the reference burns 8 CPU worker
processes on numpy GT synthesis per sample (SURVEY.md §3.1); we ship only
(B, MAX_PEOPLE, 18, 3) keypoints to the chip and let the closed-form jax
kernel do the rest.  Host-side synthesis remains available for parity
(`host_gt=True`).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import PIL.Image

from ..skeleton import COCO_TO_OURS, NUM_PARTS
from . import transforms as T
from .coco_json import CocoJson
from .gt import ground_truth_maps

MAX_PEOPLE_PER_IMAGE = 32


def add_neck(kp17: np.ndarray) -> np.ndarray:
    """(17, 3) COCO keypoints -> (18, 3) in our part order.

    Neck synthesized as the shoulder midpoint; visible only if both
    shoulders are labeled (reference lib/datasets/datasets.py:227-257,
    including the round() of the synthesized row).
    """
    l_sho, r_sho = kp17[5], kp17[6]
    neck = (l_sho + r_sho) / 2.0
    if l_sho[2] == 2 and r_sho[2] == 2:
        neck[2] = 2
    else:
        neck[2] = l_sho[2] * r_sho[2]
    neck = np.round(neck)
    ext = np.vstack([kp17, neck[None]])
    return ext[list(COCO_TO_OURS), :]


def remove_illegal_joints(kps: np.ndarray, input_x: int,
                          input_y: int) -> np.ndarray:
    """Zero out keypoints outside the crop
    (reference datasets.py:216-225)."""
    kps = kps.copy()
    bad = ((kps[:, :, 0] >= input_x) | (kps[:, :, 0] < 0)
           | (kps[:, :, 1] >= input_y) | (kps[:, :, 1] < 0))
    kps[bad] = (-1.0, -1.0, 0.0)
    return kps


@dataclasses.dataclass
class CocoKeypoints:
    """Map-style dataset yielding dict samples.

    keys: image (H, W, 3) float32 normalized; keypoints
    (MAX_PEOPLE, 18, 3) float32 padded with v=0; optionally heatmaps/pafs
    when host_gt.
    """
    image_dir: str
    ann_file: str
    preprocess: Optional[T.Transform] = None
    input_size: int = 368
    stride: int = 8
    sigma: float = 7.0
    host_gt: bool = False
    all_images: bool = False
    n_images: Optional[int] = None

    def __post_init__(self):
        self.coco = CocoJson(self.ann_file)
        self.person_cats = self.coco.cat_ids("person")
        if self.all_images:
            self.ids = self.coco.img_ids()
        else:
            self.ids = self.coco.ids_with_keypoints(self.person_cats)
        if self.n_images:
            self.ids = self.ids[:self.n_images]
        if self.preprocess is None:
            self.preprocess = T.train_pipeline(self.input_size)

    def __len__(self) -> int:
        return len(self.ids)

    def raw_sample(self, index: int):
        """Annotation prep without pixel work: (img_id, path, kp17
        (P, 17, 3), corner_sets (U, 17, 3) fake keypoint sets carrying
        crowd/unlabeled bbox corners for the loss mask).

        Shared by the PIL path (:meth:`get`) and the native C++ loader
        (data/native_loader.py)."""
        img_id = self.ids[index]
        info = self.coco.image_info(img_id)
        path = os.path.join(self.image_dir, info["file_name"])
        anns = self.coco.annotations(img_id, self.person_cats)
        # classify by index: dict-value membership is O(n^2) and misgroups
        # duplicate annotations
        is_labeled = [
            not a.get("iscrowd", 0)
            and any(v > 0 for v in (a.get("keypoints") or [])[2::3])
            for a in anns]
        labeled = [a for a, lab in zip(anns, is_labeled) if lab]
        unlabeled = [a for a, lab in zip(anns, is_labeled) if not lab]
        kp17 = np.array([np.asarray(a["keypoints"], float).reshape(17, 3)
                         for a in labeled]) if labeled \
            else np.zeros((0, 17, 3))

        # Carry crowd/unlabeled-region bbox corners through the geometric
        # transforms as fake keypoint sets so the loss mask follows the
        # augmentation (the reference's mask_miss analogue; its masked
        # trainers depend on a loader missing from the repo,
        # SURVEY.md C28).
        corner_sets = []
        for a in unlabeled:
            x, y, w, h = a.get("bbox", (0, 0, 0, 0))
            c = np.zeros((17, 3))
            c[0] = (x, y, 2)
            c[1] = (x + w, y, 2)
            c[2] = (x, y + h, 2)
            c[3] = (x + w, y + h, 2)
            corner_sets.append(c)
        corners = (np.stack(corner_sets) if corner_sets
                   else np.zeros((0, 17, 3)))
        return img_id, path, kp17, corners

    def finalize_keypoints(self, keypoints: np.ndarray, n_people: int):
        """Post-geometric keypoint finalization shared with the native
        loader: neck synthesis, illegal-joint removal, fixed-shape padding,
        and the crowd/unlabeled-region loss mask from the transformed
        corner sets.  Returns (padded (MAX, 18, 3), mask (gy, gx, 1),
        kps18)."""
        people_kp = keypoints[:n_people]
        region_kp = keypoints[n_people:]
        if len(people_kp):
            kps18 = np.stack([add_neck(k) for k in people_kp])
        else:
            kps18 = np.zeros((0, NUM_PARTS, 3))
        kps18 = remove_illegal_joints(kps18, self.input_size,
                                      self.input_size)

        padded = np.zeros((MAX_PEOPLE_PER_IMAGE, NUM_PARTS, 3), np.float32)
        n = min(len(kps18), MAX_PEOPLE_PER_IMAGE)
        padded[:n] = kps18[:n]

        gy = gx = self.input_size // self.stride
        mask = np.ones((gy, gx, 1), np.float32)
        for region in region_kp:
            pts = region[region[:, 2] > 0, :2]
            if not len(pts):
                continue
            x0 = int(np.clip(np.floor(pts[:, 0].min() / self.stride),
                             0, gx))
            x1 = int(np.clip(np.ceil(pts[:, 0].max() / self.stride),
                             0, gx))
            y0 = int(np.clip(np.floor(pts[:, 1].min() / self.stride),
                             0, gy))
            y1 = int(np.clip(np.ceil(pts[:, 1].max() / self.stride),
                             0, gy))
            mask[y0:y1, x0:x1, :] = 0.0
        return padded, mask, kps18

    def get(self, index: int, rng: np.random.Generator) -> Dict:
        img_id, path, kp17, corners = self.raw_sample(index)
        with open(path, "rb") as f:
            image = PIL.Image.open(f).convert("RGB")
        n_people = len(kp17)
        all_kp = np.concatenate([kp17, corners], axis=0) \
            if (len(kp17) or len(corners)) else np.zeros((0, 17, 3))

        sample = T.Sample.new(image, all_kp)
        sample = self.preprocess(sample, rng)

        arr = T.image_to_tensor(sample.image)
        arr = T.mask_valid_area(arr, sample.meta["valid_area"])

        padded, mask, kps18 = self.finalize_keypoints(sample.keypoints,
                                                      n_people)
        out = {"image": arr.astype(np.float32), "keypoints": padded,
               "image_id": img_id, "mask": mask}
        if self.host_gt:
            heat, paf = ground_truth_maps(
                kps18, input_y=self.input_size, input_x=self.input_size,
                stride=self.stride, sigma=self.sigma)
            out["heatmaps"] = heat.astype(np.float32)
            out["pafs"] = paf.astype(np.float32)
        return out


class ConcatKeypoints:
    """Concatenation of map-style keypoint datasets.

    The reference trains on a ``torch.utils.data.ConcatDataset`` over ALL
    of ``args.train_annotations`` (reference train/train_VGG19.py:50-60);
    this is the loader-agnostic analogue: it exposes the exact surface
    both :class:`Loader` (``get``) and the native C++ loader
    (``raw_sample``/``finalize_keypoints``/``input_size``/``stride``)
    consume, with global indices mapped to (dataset, local index).
    """

    _SHARED = ("input_size", "stride", "sigma", "host_gt")

    def __init__(self, datasets):
        datasets = list(datasets)
        if not datasets:
            raise ValueError("ConcatKeypoints needs at least one dataset")
        for attr in self._SHARED:
            vals = {getattr(d, attr) for d in datasets}
            if len(vals) != 1:
                raise ValueError(
                    f"ConcatKeypoints datasets disagree on {attr}: {vals}")
            setattr(self, attr, next(iter(vals)))
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _locate(self, index: int):
        if not 0 <= index < len(self):
            raise IndexError(index)
        di = int(np.searchsorted(self._offsets, index, side="right")) - 1
        return self.datasets[di], index - int(self._offsets[di])

    def get(self, index: int, rng: np.random.Generator) -> Dict:
        ds, i = self._locate(index)
        return ds.get(i, rng)

    def raw_sample(self, index: int):
        ds, i = self._locate(index)
        return ds.raw_sample(i)

    def finalize_keypoints(self, keypoints: np.ndarray, n_people: int):
        # pure function of the shared (input_size, stride) geometry
        return self.datasets[0].finalize_keypoints(keypoints, n_people)


class ImageList:
    """Plain image-path dataset for batch inference
    (reference lib/datasets/datasets.py:314-334)."""

    def __init__(self, image_paths, transform=None):
        self.image_paths = list(image_paths)
        self.transform = transform

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, index):
        path = self.image_paths[index]
        with open(path, "rb") as f:
            image = PIL.Image.open(f).convert("RGB")
        original = np.asarray(image, np.float32) / 255.0
        arr = (self.transform(image) if self.transform
               else T.image_to_tensor(image))
        return path, original, arr


class PilImageList:
    """In-memory PIL image dataset (reference datasets.py:337-350)."""

    def __init__(self, images, transform=None):
        self.images = list(images)
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        image = self.images[index].copy().convert("RGB")
        original = np.asarray(image, np.float32) / 255.0
        arr = (self.transform(image) if self.transform
               else T.image_to_tensor(image))
        return index, original, arr


class Loader:
    """Threaded shuffling prefetch loader producing numpy batches.

    The analogue of torch DataLoader workers (reference
    train/train_VGG19.py:62-64) without the torch dependency; each worker
    owns a seeded Generator so runs are reproducible.
    """

    def __init__(self, dataset: CocoKeypoints, batch_size: int,
                 shuffle: bool = True, num_workers: int = 4,
                 seed: int = 0, drop_last: bool = True,
                 prefetch: int = 4, deterministic: bool = False):
        # deterministic=True: every __iter__ yields identical batches
        # (epoch is not folded into the rng), so a val loss is comparable
        # across epochs instead of moving with per-epoch crop/jitter noise
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.deterministic = deterministic
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        epoch = 0 if self.deterministic else self.epoch
        rng = np.random.Generator(
            np.random.Philox(self.seed + epoch))
        if self.shuffle:
            rng.shuffle(order)
        self.epoch += 1

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def worker(worker_id: int):
            # any failure must reach the main thread: a dead worker that
            # never posts its sentinel would block the iterator forever
            try:
                wrng = np.random.Generator(
                    np.random.Philox([self.seed, epoch, worker_id]))
                for bi in range(worker_id, len(batches), self.num_workers):
                    if stop.is_set():
                        return
                    samples = [self.dataset.get(int(i), wrng)
                               for i in batches[bi]]
                    batch = {k: np.stack([s[k] for s in samples])
                             for k in samples[0]}
                    if not _put((bi, batch)):
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised in main
                _put(("error", e))
            finally:
                _put((None, None))

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        finished = 0
        pending: Dict[int, Dict] = {}
        next_bi = 0
        try:
            while finished < self.num_workers or pending:
                if next_bi in pending:
                    yield pending.pop(next_bi)
                    next_bi += 1
                    continue
                bi, batch = q.get()
                if bi is None:
                    finished += 1
                    continue
                if bi == "error":
                    raise batch
                pending[bi] = batch
        finally:
            stop.set()
