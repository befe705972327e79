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


def test_match_people_injective_when_best_column_taken():
    # advisor round-3 high: two device people both nearest to host column
    # 0; greedy-with-unmasked-finiteness returned [0, 0] (non-injective),
    # letting a duplicated/dropped-person parity break pass. The exact
    # matcher must assign distinct columns.
    a = {0: (0.10, 0.10, 1.0)}
    a_close = {0: (0.11, 0.10, 1.0)}        # nearer to a than to b
    b = {0: (0.70, 0.80, 1.0)}
    dev = [_person(a), _person(a_close)]
    host = [_host(a), _host(b)]
    order = _match_people(dev, host, 368, 368)
    assert order is not None
    assert sorted(order) == [0, 1]          # injective
    assert order[0] == 0                    # and optimal: a -> a


def test_match_people_none_when_only_finite_column_taken():
    # device person 1's ONLY finite-distance host column is the one
    # person 0 must take; no injective matching exists -> None, not a
    # silent double-assignment
    dev = [_person({0: (0.1, 0.1, 1.0)}), _person({0: (0.12, 0.1, 1.0)})]
    host = [_host({0: (0.1, 0.1, 1.0)}), _host({7: (0.9, 0.9, 1.0)})]
    assert _match_people(dev, host, 368, 368) is None


def test_match_people_finds_matching_greedy_would_miss():
    # advisor round-3 low: greedy nearest-first assigns dev0 -> hostA
    # (its global nearest), stranding dev1 whose ONLY finite column is
    # hostA -> spurious None. The exact matcher must return the valid
    # matching dev0 -> hostB, dev1 -> hostA.
    dev0 = {0: (0.50, 0.50, 1.0)}                 # finite to both hosts
    dev1 = {3: (0.50, 0.50, 1.0)}                 # finite to hostA only
    host_a = {0: (0.50, 0.50, 1.0), 3: (0.55, 0.50, 1.0)}
    host_b = {0: (0.60, 0.50, 1.0)}
    dev = [_person(dev0), _person(dev1)]
    order = _match_people(dev, [_host(host_a), _host(host_b)], 368, 368)
    assert order == [1, 0]


def test_match_people_count_mismatch_returns_none():
    # advisor round-3 low: (n, n) sizing from len(dev) IndexError'd when
    # host had more people; now an explicit None
    dev = [_person({0: (0.1, 0.1, 1.0)})]
    host = [_host({0: (0.1, 0.1, 1.0)}), _host({0: (0.7, 0.8, 1.0)})]
    assert _match_people(dev, host, 368, 368) is None
    assert _match_people(dev + dev, [host[0]], 368, 368) is None


def test_decode_parity_passes_on_cpu():
    # the full 6-scene device-vs-host-oracle comparison (CPU backend in
    # the suite; the same code runs on the TPU via rtpose_tpu.selftest)
    assert check_decode_parity()
