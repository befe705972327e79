"""The selftest's decode-parity check and its order-insensitive person
matcher.

Person EMISSION order is tie-sensitive (one bit-equal candidate score
orders differently through lax.top_k on TPU vs CPU — observed on scene 4
of the selftest set), so the parity check must match people by content,
not index, while still failing on any real divergence.
"""

import numpy as np

from rtpose_tpu.selftest import _match_people, check_decode_parity


def _person(parts):
    return {"parts": {p: (x, y, s) for p, (x, y, s) in parts.items()}}


def _host(parts, n_parts=18):
    hp = np.full((n_parts, 3), -1.0)
    for p, (x, y, s) in parts.items():
        hp[p] = (x, y, s)
    return hp


def test_match_people_handles_swapped_order():
    a = {0: (0.1, 0.1, 1.0), 5: (0.15, 0.12, 0.9)}
    b = {0: (0.7, 0.8, 1.0), 5: (0.75, 0.82, 0.9)}
    dev = [_person(a), _person(b)]
    host = [_host(b), _host(a)]          # swapped emission order
    assert _match_people(dev, host, 368, 368) == [1, 0]
    # identity order still maps to identity
    assert _match_people(dev, [_host(a), _host(b)], 368, 368) == [0, 1]


def test_match_people_rejects_unmatchable():
    # a device person whose parts are ALL missing on every host person
    dev = [_person({3: (0.5, 0.5, 1.0)})]
    host = [_host({7: (0.5, 0.5, 1.0)})]
    assert _match_people(dev, host, 368, 368) is None


def test_decode_parity_passes_on_cpu():
    # the full 6-scene device-vs-host-oracle comparison (CPU backend in
    # the suite; the same code runs on the TPU via rtpose_tpu.selftest)
    assert check_decode_parity()
