"""Cross-consistency checks for the canonical skeleton tables.

Golden values are the hand-written tables of the reference implementation
(evaluate/coco_eval.py:52,207-208,228-230; lib/pafprocess/pafprocess.h:16-24;
lib/datasets/datasets.py:13-61,241-242).
"""

import numpy as np

from rtpose_tpu import skeleton as sk


def test_counts():
    assert sk.NUM_PARTS == 18
    assert sk.NUM_HEATMAPS == 19
    assert sk.NUM_LIMBS == 19
    assert sk.NUM_PAF_CHANNELS == 38
    assert sk.NUM_GROUP_PAIRS == 19


def test_order_coco_matches_reference():
    assert list(sk.ORDER_COCO) == [0, 15, 14, 17, 16, 5, 2, 6, 3, 7, 4, 11,
                                   8, 12, 9, 13, 10]


def test_coco_to_ours_matches_reference():
    assert list(sk.COCO_TO_OURS) == [0, 17, 6, 8, 10, 5, 7, 9, 12, 14, 16,
                                     11, 13, 15, 2, 1, 4, 3]


def test_flip_heat_matches_reference():
    assert list(sk.FLIP_HEAT) == [0, 1, 5, 6, 7, 2, 3, 4, 11, 12, 13, 8, 9,
                                  10, 15, 14, 17, 16, 18]


def test_flip_paf_matches_reference():
    expected = [6, 7, 8, 9, 10, 11, 0, 1, 2, 3, 4, 5, 20, 21, 22, 23, 24, 25,
                26, 27, 12, 13, 14, 15, 16, 17, 18, 19, 28, 29, 32, 33, 30,
                31, 36, 37, 34, 35]
    assert list(sk.FLIP_PAF) == expected


def test_group_pairs_match_reference_pafprocess():
    expected_pairs = [(1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8),
                      (8, 9), (9, 10), (1, 11), (11, 12), (12, 13), (1, 0),
                      (0, 14), (14, 16), (0, 15), (15, 17), (2, 16), (5, 17)]
    expected_net = [(12, 13), (20, 21), (14, 15), (16, 17), (22, 23),
                    (24, 25), (0, 1), (2, 3), (4, 5), (6, 7), (8, 9),
                    (10, 11), (28, 29), (30, 31), (34, 35), (32, 33),
                    (36, 37), (18, 19), (26, 27)]
    assert list(sk.GROUP_PAIRS) == expected_pairs
    assert list(sk.GROUP_PAIRS_NET) == expected_net


def test_group_net_consistent_with_limbs():
    """Each grouping pair reads the PAF channels of the training limb whose
    endpoints match — modulo the reference's eye/ear quirk for pairs
    14/16/17/18 (shoulder->eye GT limb reused for shoulder->ear pairing)."""
    limb_of = {}
    for i, (a, b) in enumerate(sk.LIMBS):
        limb_of[frozenset((a, b))] = i
    eye_for_ear = {16: 14, 17: 15}
    for pair, (cx, cy) in zip(sk.GROUP_PAIRS, sk.GROUP_PAIRS_NET):
        assert cy == cx + 1 and cx % 2 == 0
        a, b = (eye_for_ear.get(p, p) if pair in ((2, 16), (5, 17)) else p
                for p in pair)
        key = frozenset((a, b))
        # every pair (after the documented ear->eye substitution) must map
        # to a known limb — a silent skip here would pass on a corrupted
        # table, the exact regression this test exists to catch
        assert key in limb_of, pair
        assert cx == 2 * limb_of[key]


def test_flip_part_involution():
    f = np.array(sk.FLIP_PART)
    assert (f[f] == np.arange(sk.NUM_PARTS)).all()
