"""End-to-end on-device pose decoding: heatmaps + PAFs -> people.

Chains ops.peaks.nms and ops.grouping.group_peaks_device into one jittable,
batchable function — the whole image->skeletons path stays on device
(the reference round-trips through scipy/cv2/C++ per image,
lib/utils/paf_to_pose.py:372-406).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax


from .grouping import People, group_peaks_device
from .peaks import nms


@functools.partial(jax.jit, static_argnames=(
    "factor", "thresh_heatmap", "max_peaks", "max_people", "refine",
    "max_candidates", "max_total_conns", "sampling", "gaussian_filt"))
def decode_poses(heatmaps: jax.Array, pafs: jax.Array, *, factor: int = 8,
                 thresh_heatmap: float = 0.1, max_peaks: int = 32,
                 max_people: int = 64, refine: bool = True,
                 max_candidates: int = 256,
                 max_total_conns: int = 160,
                 sampling: str = "auto",
                 gaussian_filt: bool = False) -> People:
    """Decode one image's low-res maps into fixed-shape people.

    heatmaps: (H, W, 19), pafs: (H, W, 38), both float32.  All fixed-shape
    caps are per-call-site configurable; `People.truncated` reports when a
    scene overflowed any of them (raise the cap and re-run).
    """
    peaks = nms(heatmaps, factor=factor, thresh=thresh_heatmap,
                max_peaks=max_peaks, refine=refine,
                gaussian_filt=gaussian_filt)
    return group_peaks_device(peaks, pafs, factor=factor,
                              max_people=max_people,
                              max_candidates=max_candidates,
                              max_total_conns=max_total_conns,
                              sampling=sampling)


@functools.partial(jax.jit, static_argnames=(
    "factor", "thresh_heatmap", "max_peaks", "max_people", "refine",
    "max_candidates", "max_total_conns", "sampling", "gaussian_filt"))
def decode_poses_batch(heatmaps: jax.Array, pafs: jax.Array, *,
                       factor: int = 8, thresh_heatmap: float = 0.1,
                       max_peaks: int = 32, max_people: int = 64,
                       refine: bool = True, max_candidates: int = 256,
                       max_total_conns: int = 160,
                       sampling: str = "auto",
                       gaussian_filt: bool = False) -> People:
    """Batched decode: (B, H, W, 19) + (B, H, W, 38) -> People with leading
    batch axis on every field."""
    fn = functools.partial(decode_poses.__wrapped__, factor=factor,
                           thresh_heatmap=thresh_heatmap,
                           max_peaks=max_peaks, max_people=max_people,
                           refine=refine, max_candidates=max_candidates,
                           max_total_conns=max_total_conns,
                           sampling=sampling,
                           gaussian_filt=gaussian_filt)
    return jax.vmap(fn)(heatmaps, pafs)


def people_to_numpy(people: People, width_up: int, height_up: int):
    """Convert device People to the host list-of-dicts form used by eval.

    Returns a list of {'parts': {part: (x_norm, y_norm, score)},
    'score': float} — coordinates normalized by the upsampled map size like
    the reference Human/BodyPart contract (paf_to_pose.py:390-404).
    """
    import numpy as np
    # one bundled readback: per-field np.asarray on a device pytree would
    # pay a full tunnel RTT per field (CLAUDE.md readback discipline)
    coords, pscore, score, valid = jax.device_get(
        (people.coords, people.part_score, people.score, people.valid))
    coords, pscore = np.asarray(coords), np.asarray(pscore)
    score, valid = np.asarray(score), np.asarray(valid)
    out = []
    for i in range(coords.shape[0]):
        if not valid[i]:
            continue
        parts = {}
        for part in range(coords.shape[1]):
            x, y = coords[i, part]
            if x < 0:
                continue
            parts[part] = (x / width_up, y / height_up,
                           float(pscore[i, part]))
        if parts:
            out.append({"parts": parts, "score": float(score[i])})
    return out
