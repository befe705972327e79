"""The image->skeletons inference pipeline.

One jitted call covers: normalization -> CNN forward (optionally both
orientations for flip TTA, fused as a batch of 2) -> flip-swap averaging ->
on-device NMS + grouping.  The host only resizes/pads the input image and
reads back the fixed-shape people arrays.

Flip TTA follows reference evaluate/coco_eval.py:197-242 (swap tables
derived in rtpose_tpu.skeleton); the committed reference never wires it into
eval, but its README attributes mAP 0.653 vs 0.577 to exactly this
averaging, so here it is a first-class pipeline flag.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import ModelOutput
from ..ops.decode import decode_poses, people_to_numpy
from ..ops.grouping import People
from ..skeleton import FLIP_HEAT, FLIP_PAF, NUM_LIMBS
from .preprocess import crop_with_factor, preprocess

_FLIP_PAF_ARR = np.array(FLIP_PAF)
_FLIP_HEAT_ARR = np.array(FLIP_HEAT)
# x-channels (even index into each limb's (x,y) pair) get negated on flip
_PAF_X_NEG = np.ones(2 * NUM_LIMBS, dtype=np.float32)
_PAF_X_NEG[0::2] = -1.0


def average_flip(heat: jax.Array, heat_flipped: jax.Array,
                 paf: jax.Array, paf_flipped: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """Average normal and mirrored predictions (HWC maps).

    Channel reordering by the derived swap tables and x-component negation
    (reference coco_eval.py:228-240).
    """
    hf = heat_flipped[:, ::-1, :][:, :, _FLIP_HEAT_ARR]
    pf = paf_flipped[:, ::-1, :]
    pf = pf[:, :, _FLIP_PAF_ARR] * _PAF_X_NEG
    return (heat + hf) / 2.0, (paf + pf) / 2.0


def make_infer_fn(model, *, thresh_heatmap: float = 0.1,
                  max_peaks: int = 32, max_people: int = 64,
                  downsample: int = 8, flip: bool = True):
    """Build the jitted image->People function.

    Returned fn: (params, image_hwc_float32) -> (People, heat, paf); the
    maps are returned for eval/visualization.  jit-compiled per input shape
    (use bucketing upstream to bound recompiles).
    """

    @functools.partial(jax.jit, static_argnames=())
    def infer(params, image):
        if flip:
            batch = jnp.stack([image, image[:, ::-1, :]])
        else:
            batch = image[None]
        out: ModelOutput = model.apply(params, batch)
        heat = out.heatmap
        paf = out.paf
        if flip:
            heat_avg, paf_avg = average_flip(heat[0], heat[1],
                                             paf[0], paf[1])
        else:
            heat_avg, paf_avg = heat[0], paf[0]
        people = decode_poses.__wrapped__(
            heat_avg, paf_avg, factor=downsample,
            thresh_heatmap=thresh_heatmap, max_peaks=max_peaks,
            max_people=max_people)
        return people, heat_avg, paf_avg

    return infer


class PosePipeline:
    """High-level API: BGR uint8 numpy image in, list of people out.

    The TPU-native analogue of reference evaluate/coco_eval.py:80-114
    (get_outputs) + lib/utils/paf_to_pose.py:372-406 (paf_to_pose_cpp),
    with flip TTA fused into the same jitted call.
    """

    def __init__(self, model, params, *, input_size: int = 368,
                 downsample: int = 8, preprocess_mode: str = "vgg",
                 flip: bool = True, thresh_heatmap: float = 0.1,
                 max_peaks: int = 32, max_people: int = 64):
        self.model = model
        self.params = params
        self.input_size = input_size
        self.downsample = downsample
        self.preprocess_mode = preprocess_mode
        self._infer = make_infer_fn(
            model, thresh_heatmap=thresh_heatmap, max_peaks=max_peaks,
            max_people=max_people, downsample=downsample, flip=flip)

    def __call__(self, image_bgr: np.ndarray) -> List[Dict[str, Any]]:
        people, _, _, meta = self.run(image_bgr)
        return people

    def run(self, image_bgr: np.ndarray):
        """Returns (people list, heat, paf, meta).

        people entries: {'parts': {part: (x_norm, y_norm, score)},
        'score': float}; coordinates normalized by the padded upsampled
        frame, meta carries scale for mapping back to original pixels.
        """
        im, scale, real_shape = crop_with_factor(
            image_bgr, self.input_size, factor=self.downsample, is_ceil=True)
        inp = preprocess(im, self.preprocess_mode)
        people_dev, heat, paf = self._infer(self.params, jnp.asarray(inp))
        h_up = heat.shape[0] * self.downsample
        w_up = heat.shape[1] * self.downsample
        people = people_to_numpy(people_dev, w_up, h_up)
        meta = {"scale": scale, "real_shape": real_shape,
                "padded_shape": im.shape, "upsampled": (h_up, w_up)}
        return people, np.asarray(heat), np.asarray(paf), meta

    def keypoints_pixels(self, people, meta):
        """Map normalized part coords back to original-image pixels.

        x_pix = x_norm * (W_up / scale) + 0.5 — the reference's
        append_result convention (coco_eval.py:136-148, upsample_keypoints
        :279)."""
        h_up, w_up = meta["upsampled"]
        scale = meta["scale"]
        out = []
        for person in people:
            parts = {}
            for part, (xn, yn, s) in person["parts"].items():
                parts[part] = (xn * w_up / scale + 0.5,
                               yn * h_up / scale + 0.5, s)
            out.append({"parts": parts, "score": person["score"]})
        return out
