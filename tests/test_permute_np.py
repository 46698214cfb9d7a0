"""The vectorized permute_expression_pair fast path must be byte-identical
to the exact-int dict algorithm (halo2 lookup/prover.rs semantics,
including the leftover first-occurrence ordering)."""

import random

import pytest

from halo2_lib_tpu.backend.prover import _blind, _permute_pair


def _reference(a, table, u, n, rng):
    a_sorted = sorted(a[:u])
    s_multiset: dict = {}
    for v in table[:u]:
        s_multiset[v] = s_multiset.get(v, 0) + 1
    s_out: list = [None] * u
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            cnt = s_multiset.get(v, 0)
            if cnt == 0:
                raise ValueError("lookup failure")
            s_multiset[v] = cnt - 1
            s_out[i] = v
    leftovers = []
    for v, c in s_multiset.items():
        leftovers.extend([v] * c)
    it = iter(leftovers)
    for i in range(u):
        if s_out[i] is None:
            s_out[i] = next(it)
    return _blind(a_sorted, n, rng), _blind([int(v) for v in s_out], n, rng)


def test_numpy_permute_matches_dict_path():
    for trial in range(200):
        rng0 = random.Random(trial)
        u = rng0.randrange(4, 60)
        n = u + 24
        table = [rng0.randrange(16) for _ in range(u)]
        a = [table[rng0.randrange(u)] for _ in range(u)]
        got = _permute_pair(a, table, u, n, random.Random(99))
        want = _reference(a, table, u, n, random.Random(99))
        assert got == want, trial


def test_numpy_permute_full_width_falls_back():
    """Values >= 2^63 take the exact-int path; outputs still agree."""
    big = 1 << 200
    u, n = 6, 16
    table = [big + i for i in (0, 0, 1, 2, 3, 3)]
    a = [big + i for i in (0, 1, 3, 3, 2, 0)]
    got = _permute_pair(a, table, u, n, random.Random(5))
    want = _reference(a, table, u, n, random.Random(5))
    assert got == want


def test_numpy_permute_lookup_failure_raises():
    with pytest.raises(ValueError, match="lookup failure"):
        _permute_pair([5], [7], 1, 8, random.Random(0))