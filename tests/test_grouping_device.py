"""On-device grouping vs host oracle: people-level differential tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.ops import grouping_ref as G
from rtpose_tpu.ops.decode import decode_poses, people_to_numpy
from rtpose_tpu.skeleton import NUM_PARTS

from util_synth import synth_example


def _people_sets_host(people, scores, w_up, h_up):
    out = []
    for p, s in zip(people, scores):
        parts = {}
        for part in range(NUM_PARTS):
            if p[part, 2] > 0:
                parts[part] = (int(round(p[part, 0] * w_up)),
                               int(round(p[part, 1] * h_up)))
        out.append((frozenset(parts.items()), round(float(s), 4)))
    return sorted(out, key=repr)


def _people_sets_device(people_list, w_up, h_up):
    out = []
    for person in people_list:
        parts = {}
        for part, (xn, yn, _score) in person["parts"].items():
            parts[part] = (int(round(xn * w_up)), int(round(yn * h_up)))
        out.append((frozenset(parts.items()), round(person["score"], 4)))
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 2), (2, 3), (3, 4),
                                           (4, 5), (5, 6)])
def test_device_grouping_matches_oracle(seed, n_people):
    _, heat, paf = synth_example(seed=seed, n_people=n_people)
    w_up = heat.shape[1] * 8
    h_up = heat.shape[0] * 8

    host_people, host_scores = G.paf_to_people(heat, paf)
    dev = decode_poses(jnp.asarray(heat), jnp.asarray(paf))
    dev_people = people_to_numpy(dev, w_up, h_up)

    hs = _people_sets_host(host_people, host_scores, w_up, h_up)
    ds = _people_sets_device(dev_people, w_up, h_up)
    assert len(hs) == len(ds), (hs, ds)
    for (hp, hscore), (dp, dscore) in zip(hs, ds):
        assert hp == dp
        assert abs(hscore - dscore) < 2e-3


def test_device_grouping_empty():
    heat = np.zeros((46, 46, 19), dtype=np.float32)
    paf = np.zeros((46, 46, 38), dtype=np.float32)
    dev = decode_poses(jnp.asarray(heat), jnp.asarray(paf))
    assert not np.asarray(dev.valid).any()


def test_device_grouping_batched():
    from rtpose_tpu.ops.decode import decode_poses_batch
    _, heat0, paf0 = synth_example(seed=0, n_people=2)
    _, heat1, paf1 = synth_example(seed=1, n_people=4)
    heat = jnp.stack([jnp.asarray(heat0), jnp.asarray(heat1)])
    paf = jnp.stack([jnp.asarray(paf0), jnp.asarray(paf1)])
    out = decode_poses_batch(heat, paf)
    assert out.coords.shape[0] == 2
    n0 = int(np.asarray(out.valid[0]).sum())
    n1 = int(np.asarray(out.valid[1]).sum())
    assert n0 == 2 and n1 == 4
