"""Canonical skeleton constants for the rtpose (OpenPose CVPR'17) body model.

This is the SINGLE source of truth for the 18-part body model, the 19 limb
connections, PAF channel layout, left/right flip-swap tables and the
COCO-17 interchange order.  The reference implementation scatters these
tables across five files (reference: lib/utils/common.py:280,
lib/pafprocess/pafprocess.h:16-24, lib/network/post.py:16-28,
evaluate/coco_eval.py:52,207,228, lib/datasets/datasets.py:13-61); here they
are defined once and everything else is *derived* (and cross-checked in
tests/test_skeleton.py).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Part model: 18 keypoints (+1 background heatmap channel).
# Order follows reference lib/datasets/datasets.py:37-61 (get_keypoints).
# ---------------------------------------------------------------------------
PART_NAMES = (
    "nose",            # 0
    "neck",            # 1
    "right_shoulder",  # 2
    "right_elbow",     # 3
    "right_wrist",     # 4
    "left_shoulder",   # 5
    "left_elbow",      # 6
    "left_wrist",      # 7
    "right_hip",       # 8
    "right_knee",      # 9
    "right_ankle",     # 10
    "left_hip",        # 11
    "left_knee",       # 12
    "left_ankle",      # 13
    "right_eye",       # 14
    "left_eye",        # 15
    "right_ear",       # 16
    "left_ear",        # 17
)
NUM_PARTS = len(PART_NAMES)          # 18
NUM_HEATMAPS = NUM_PARTS + 1         # +1 background channel
BACKGROUND_CHANNEL = NUM_PARTS       # index 18

_IDX = {name: i for i, name in enumerate(PART_NAMES)}

# Enum view for API familiarity (reference lib/utils/common.py:5-24)
import enum as _enum  # noqa: E402

CocoPart = _enum.IntEnum(
    "CocoPart", {**{n: i for i, n in enumerate(PART_NAMES)},
                 "background": len(PART_NAMES)})


def _mirror_name(name: str) -> str:
    if name.startswith("left_"):
        return "right_" + name[len("left_"):]
    if name.startswith("right_"):
        return "left_" + name[len("right_"):]
    return name


# part index -> mirrored part index (identity for nose/neck)
FLIP_PART = tuple(_IDX[_mirror_name(n)] for n in PART_NAMES)

# ---------------------------------------------------------------------------
# Limbs in *training / PAF-channel* order.
# Order follows reference lib/datasets/datasets.py:13-35 (kp_connections);
# limb i occupies PAF channels (2i, 2i+1) = (x, y).
# NOTE the reference quirk kept for parity: limbs 9 and 13 connect
# shoulder->eye (not shoulder->ear) in the training ground truth, while the
# grouping stage pairs shoulder->ear (GROUP_PAIRS below) and reads these same
# PAF channels.  See reference lib/datasets/datasets.py:24,28 vs
# lib/pafprocess/pafprocess.h:21-24.
# ---------------------------------------------------------------------------
LIMBS = (
    (_IDX["neck"], _IDX["right_hip"]),             # 0  -> paf ch 0,1
    (_IDX["right_hip"], _IDX["right_knee"]),       # 1  -> 2,3
    (_IDX["right_knee"], _IDX["right_ankle"]),     # 2  -> 4,5
    (_IDX["neck"], _IDX["left_hip"]),              # 3  -> 6,7
    (_IDX["left_hip"], _IDX["left_knee"]),         # 4  -> 8,9
    (_IDX["left_knee"], _IDX["left_ankle"]),       # 5  -> 10,11
    (_IDX["neck"], _IDX["right_shoulder"]),        # 6  -> 12,13
    (_IDX["right_shoulder"], _IDX["right_elbow"]), # 7  -> 14,15
    (_IDX["right_elbow"], _IDX["right_wrist"]),    # 8  -> 16,17
    (_IDX["right_shoulder"], _IDX["right_eye"]),   # 9  -> 18,19
    (_IDX["neck"], _IDX["left_shoulder"]),         # 10 -> 20,21
    (_IDX["left_shoulder"], _IDX["left_elbow"]),   # 11 -> 22,23
    (_IDX["left_elbow"], _IDX["left_wrist"]),      # 12 -> 24,25
    (_IDX["left_shoulder"], _IDX["left_eye"]),     # 13 -> 26,27
    (_IDX["neck"], _IDX["nose"]),                  # 14 -> 28,29
    (_IDX["nose"], _IDX["right_eye"]),             # 15 -> 30,31
    (_IDX["nose"], _IDX["left_eye"]),              # 16 -> 32,33
    (_IDX["right_eye"], _IDX["right_ear"]),        # 17 -> 34,35
    (_IDX["left_eye"], _IDX["left_ear"]),          # 18 -> 36,37
)
NUM_LIMBS = len(LIMBS)               # 19
NUM_PAF_CHANNELS = 2 * NUM_LIMBS     # 38

# ---------------------------------------------------------------------------
# Grouping pairs: the order in which the bottom-up assembler walks limbs.
# Follows reference lib/pafprocess/pafprocess.h:21-24 (COCOPAIRS) and the
# matching PAF-channel table COCOPAIRS_NET :16-19.
# ---------------------------------------------------------------------------
GROUP_PAIRS = (
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9), (9, 10),
    (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16), (0, 15), (15, 17),
    (2, 16), (5, 17),
)
NUM_GROUP_PAIRS = len(GROUP_PAIRS)   # 19

# Grouping pair -> (x,y) PAF channel pair.  Hardcoded to the reference values
# (lib/pafprocess/pafprocess.h:16-19); a unit test verifies it is consistent
# with LIMBS modulo the eye/ear quirk for pairs 14/16/17/18.
GROUP_PAIRS_NET = (
    (12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1),
    (2, 3), (4, 5), (6, 7), (8, 9), (10, 11), (28, 29), (30, 31), (34, 35),
    (32, 33), (36, 37), (18, 19), (26, 27),
)

# Pairs eligible to *create* a new person during assembly
# (reference lib/pafprocess/pafprocess.cpp:173 — `pair_id < 18`).
NUM_SEED_PAIRS = 18

# ---------------------------------------------------------------------------
# Flip-swap tables for left/right flip test-time augmentation.
# Derived from FLIP_PART / LIMBS; equal to the hand-written tables in
# reference evaluate/coco_eval.py:207-208 (swap_heat) and :228-230 (swap_paf).
# ---------------------------------------------------------------------------
# heatmap channel c of the flipped image corresponds to channel FLIP_HEAT[c]
FLIP_HEAT = tuple(list(FLIP_PART) + [BACKGROUND_CHANNEL])

def _derive_flip_paf() -> tuple:
    limb_of = {frozenset(l): i for i, l in enumerate(LIMBS)}
    table = []
    for (a, b) in LIMBS:
        j = limb_of[frozenset((FLIP_PART[a], FLIP_PART[b]))]
        table.extend((2 * j, 2 * j + 1))
    return tuple(table)

FLIP_PAF = _derive_flip_paf()

# ---------------------------------------------------------------------------
# COCO-17 interchange.
# COCO annotation keypoint order (val2017 "person_keypoints" category).
# ---------------------------------------------------------------------------
COCO_PART_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
)

# COCO-17 slot -> our 18-part index (reference evaluate/coco_eval.py:52)
ORDER_COCO = tuple(_IDX[n] for n in COCO_PART_NAMES)

# (COCO-17 + synthesized neck at slot 17) -> our 18-part order
# (reference lib/datasets/datasets.py:241-242)
COCO_TO_OURS = tuple(
    (tuple(COCO_PART_NAMES) + ("neck",)).index(n) for n in PART_NAMES
)

# Per-keypoint OKS sigmas in COCO-17 order (pycocotools defaults).
COCO_SIGMAS = np.array([
    .026, .025, .025, .035, .035, .079, .079, .072, .072,
    .062, .062, .107, .107, .087, .087, .089, .089,
], dtype=np.float64)

# ---------------------------------------------------------------------------
# Rendering (reference lib/utils/common.py:276-284): drop the two
# shoulder-ear pairs when drawing.
# ---------------------------------------------------------------------------
RENDER_PAIRS = GROUP_PAIRS[:17]
PART_COLORS = (
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
)
