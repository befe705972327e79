"""Skeleton rendering (reference lib/utils/common.py:227-251 draw_humans)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..skeleton import PART_COLORS, RENDER_PAIRS


def draw_people(image_bgr: np.ndarray, people: List[Dict[str, Any]],
                meta: Optional[dict] = None, *, radius: int = 3,
                thickness: int = 3) -> np.ndarray:
    """Draw circles at parts + limb lines on a copy of the image.

    `people` uses normalized coordinates over the padded upsampled frame;
    `meta['scale']`/`meta['upsampled']` (from PosePipeline.run) map them to
    original-image pixels; without meta, coordinates are scaled by the image
    size directly.
    """
    import cv2

    img = image_bgr.copy()
    h, w = img.shape[:2]
    if meta is not None:
        h_up, w_up = meta["upsampled"]
        scale = meta["scale"]
        sx = w_up / scale
        sy = h_up / scale
    else:
        sx, sy = w, h

    for person in people:
        centers = {}
        for part, (xn, yn, _score) in person["parts"].items():
            center = (int(xn * sx + 0.5), int(yn * sy + 0.5))
            centers[part] = center
            cv2.circle(img, center, radius, PART_COLORS[part % 18],
                       thickness=thickness, lineType=8)
        for pi, (a, b) in enumerate(RENDER_PAIRS):
            if a not in centers or b not in centers:
                continue
            cv2.line(img, centers[a], centers[b], PART_COLORS[pi % 18],
                     thickness)
    return img
