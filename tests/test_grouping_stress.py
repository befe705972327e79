"""Stress: device grouping vs host oracle across many random scenes."""

import numpy as np

import jax.numpy as jnp

from rtpose_tpu.ops import grouping_ref as G
from rtpose_tpu.ops.decode import decode_poses, people_to_numpy

from util_synth import synth_example


def _canon_host(people, scores, w_up, h_up):
    out = set()
    for p, s in zip(people, scores):
        parts = tuple(sorted(
            (part, int(round(p[part, 0] * w_up)),
             int(round(p[part, 1] * h_up)))
            for part in range(18) if p[part, 2] > 0))
        out.add((parts, round(float(s), 3)))
    return out


def _canon_dev(people_list, w_up, h_up):
    out = set()
    for person in people_list:
        parts = tuple(sorted(
            (part, int(round(x * w_up)), int(round(y * h_up)))
            for part, (x, y, _s) in person["parts"].items()))
        out.add((parts, round(person["score"], 3)))
    return out


def test_many_random_scenes_agree():
    mismatches = []
    n_scenes = 16
    for seed in range(100, 100 + n_scenes):
        n_people = 1 + seed % 7
        _, heat, paf = synth_example(seed=seed, n_people=n_people)
        w_up = heat.shape[1] * 8
        h_up = heat.shape[0] * 8
        host_people, host_scores = G.paf_to_people(heat, paf)
        dev = decode_poses(jnp.asarray(heat), jnp.asarray(paf))
        dev_people = people_to_numpy(dev, w_up, h_up)
        hs = _canon_host(host_people, host_scores, w_up, h_up)
        ds = _canon_dev(dev_people, w_up, h_up)
        if hs != ds:
            mismatches.append((seed, len(hs), len(ds)))
    # fp near-ties in crowded synthetic scenes can legitimately flip an
    # assignment; demand agreement on all but at most one scene
    assert len(mismatches) <= 1, mismatches
