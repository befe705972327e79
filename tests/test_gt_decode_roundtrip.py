"""GT decode self-check (the working analogue of the reference's
bit-rotted lib/datasets/test_dataloader.py): synthesize GT maps from
keypoints, decode them back with the on-device grouping, and verify the
recovered skeletons match the input people."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtpose_tpu.data.gt import ground_truth_maps
from rtpose_tpu.ops.decode import decode_poses, people_to_numpy
from rtpose_tpu.skeleton import NUM_PARTS


def _spread_people(rng, n, size=368):
    """Non-overlapping upright people within the crop."""
    cols = max(1, int(np.ceil(np.sqrt(n))))
    kps = np.zeros((n, NUM_PARTS, 3))
    from util_synth import _TEMPLATE
    for i in range(n):
        cx = (i % cols + 0.5) / cols * size
        cy = (i // cols + 0.5) / cols * size
        s = size / cols * 0.7
        for part, (tx, ty) in _TEMPLATE.items():
            kps[i, part] = (cx + (tx - 0.5) * s + rng.normal(0, 1),
                            cy + (ty - 0.5) * s + rng.normal(0, 1), 2)
    np.clip(kps[:, :, 0], 0, size - 1, out=kps[:, :, 0])
    np.clip(kps[:, :, 1], 0, size - 1, out=kps[:, :, 1])
    return kps


@pytest.mark.parametrize("n_people", [1, 2, 4])
def test_gt_maps_decode_back_to_people(n_people):
    rng = np.random.RandomState(n_people)
    kps = _spread_people(rng, n_people)
    heat, paf = ground_truth_maps(kps, input_y=368, input_x=368,
                                  stride=8, sigma=7.0)
    # break plateau ties from idealized GT (cf. util_synth)
    heat = heat + rng.normal(0, 1e-5, heat.shape)
    people_dev = decode_poses(jnp.asarray(heat, jnp.float32),
                              jnp.asarray(paf, jnp.float32),
                              thresh_heatmap=0.3)
    people = people_to_numpy(people_dev, 368, 368)
    assert len(people) == n_people
    for person in people:
        # match against the closest GT person
        errs = []
        for gt in kps:
            err = []
            for part, (xn, yn, _s) in person["parts"].items():
                err.append(abs(xn * 368 - gt[part, 0])
                           + abs(yn * 368 - gt[part, 1]))
            errs.append(np.mean(err))
        assert min(errs) < 10.0   # within ~one grid cell at stride 8
        assert len(person["parts"]) >= 12
