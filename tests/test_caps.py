"""Fixed-shape cap boundaries: crowded scenes must truncate WITH signal.

The reference C++ grouping keeps unbounded dynamic lists
(pafprocess.cpp:24-43); the device kernels use fixed shapes.  Round-1 gap:
the caps (max_peaks=32, max_total_conns=160, max_people=64) were never
exercised at their boundaries.  Here: scenes that overflow each cap set
People.truncated, never crash, and produce only true (peak-anchored)
people; with raised caps the decode matches the host oracle / scene.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.ops import grouping_ref as G
from rtpose_tpu.ops.decode import decode_poses, people_to_numpy

from util_synth import grid_people, render_maps

RAISED = dict(max_peaks=48, max_people=96, max_total_conns=912,
              max_candidates=512, sampling="gather")


def _crowd(n_rows, n_cols, h, w, seed=0):
    rng = np.random.RandomState(seed)
    people = grid_people(n_rows, n_cols, h, w, rng)
    heat, paf = render_maps(people, h, w)
    paf = paf + rng.normal(0, 1e-4, paf.shape).astype(np.float32)
    return people, heat, paf


@pytest.fixture(scope="module")
def crowd40():
    # 40 people: >32 peaks/part, 19*40=760 connections > 160
    return _crowd(5, 8, 100, 150)


def _decode(heat, paf, **kw):
    kwargs = dict(sampling="gather")
    kwargs.update(kw)
    return decode_poses(jnp.asarray(heat), jnp.asarray(paf), **kwargs)


def test_max_peaks_cap_truncates_with_signal(crowd40):
    _, heat, paf = crowd40
    dev = _decode(heat, paf, **{**RAISED, "max_peaks": 32})
    assert bool(dev.truncated)
    assert int(np.sum(np.asarray(dev.valid))) <= 96


def test_max_total_conns_cap_truncates_with_signal(crowd40):
    _, heat, paf = crowd40
    dev = _decode(heat, paf, **{**RAISED, "max_total_conns": 160})
    assert bool(dev.truncated)


def test_max_people_cap_truncates_with_signal():
    people, heat, paf = _crowd(9, 8, 150, 200)     # 72 people > 64
    dev = _decode(heat, paf, max_peaks=96, max_people=64,
                  max_total_conns=1824, max_candidates=512,
                  sampling="gather")
    assert bool(dev.truncated)
    assert int(np.sum(np.asarray(dev.valid))) <= 64
    # raised cap: every one of the 72 synthetic people is recovered and the
    # signal clears
    dev2 = _decode(heat, paf, max_peaks=96, max_people=96,
                   max_total_conns=1824, max_candidates=512,
                   sampling="gather")
    assert not bool(dev2.truncated)
    assert int(np.sum(np.asarray(dev2.valid))) == 72


def test_raised_caps_match_host_oracle(crowd40):
    """With all caps above the scene's demands the device decode agrees
    with the unbounded host oracle on all 40 people."""
    _, heat, paf = crowd40
    w_up, h_up = heat.shape[1] * 8, heat.shape[0] * 8
    host_people, host_scores = G.paf_to_people(heat, paf)
    dev = _decode(heat, paf, **RAISED)
    assert not bool(dev.truncated)
    dev_people = people_to_numpy(dev, w_up, h_up)
    assert len(dev_people) == len(host_people) == 40

    def canon_host():
        out = set()
        for p, s in zip(host_people, host_scores):
            parts = tuple(sorted(
                (part, int(round(p[part, 0] * w_up)),
                 int(round(p[part, 1] * h_up)))
                for part in range(18) if p[part, 2] > 0))
            out.add((parts, round(float(s), 3)))
        return out

    def canon_dev():
        out = set()
        for person in dev_people:
            parts = tuple(sorted(
                (part, int(round(x * w_up)), int(round(y * h_up)))
                for part, (x, y, _s) in person["parts"].items()))
            out.add((parts, round(person["score"], 3)))
        return out

    assert canon_host() == canon_dev()


def test_truncated_people_are_still_true_people(crowd40):
    """At default caps on a 40-person scene: overflow is signalled and every
    decoded part sits on a real peak of the scene (graceful truncation,
    not corruption)."""
    _, heat, paf = crowd40
    w_up, h_up = heat.shape[1] * 8, heat.shape[0] * 8
    dev = _decode(heat, paf)          # all defaults
    assert bool(dev.truncated)
    host_people, _ = G.paf_to_people(heat, paf)
    real_parts = set()
    for p in host_people:
        for part in range(18):
            if p[part, 2] > 0:
                real_parts.add((part, int(round(p[part, 0] * w_up)),
                                int(round(p[part, 1] * h_up))))
    dev_people = people_to_numpy(dev, w_up, h_up)
    assert dev_people, "some people must survive truncation"
    for person in dev_people:
        for part, (x, y, _s) in person["parts"].items():
            key = (part, int(round(x * w_up)), int(round(y * h_up)))
            assert key in real_parts, key


def test_uncrowded_scene_not_truncated():
    from util_synth import synth_example
    _, heat, paf = synth_example(seed=3, n_people=4)
    dev = _decode(heat, paf)
    assert not bool(dev.truncated)
