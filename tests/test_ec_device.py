"""Device G1 arithmetic + MSM vs host curve oracle."""

import random

import pytest

from halo2_lib_tpu.ops.ec_device import DeviceCurve, msm_device
from halo2_lib_tpu.ops.limbs import DeviceField
from halo2_lib_tpu.utils.curves import BN254_G1


@pytest.fixture(scope="module")
def dc():
    return DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)


def test_point_add_double(dc):
    rng = random.Random(7)
    pts = [BN254_G1.random_point(rng) for _ in range(8)]
    qts = [BN254_G1.random_point(rng) for _ in range(8)]
    P = dc.pack_points(pts)
    Q = dc.pack_points(qts)
    got = dc.unpack_points(dc.add(P, Q))
    expected = [BN254_G1.add(p, q) for p, q in zip(pts, qts)]
    assert got == expected
    got_dbl = dc.unpack_points(dc.double(P))
    assert got_dbl == [BN254_G1.double(p) for p in pts]


def test_point_add_edge_cases(dc):
    rng = random.Random(8)
    p = BN254_G1.random_point(rng)
    cases = [
        (p, p),                    # double via add
        (p, BN254_G1.neg(p)),      # P + (-P) = O
        (p, None),                 # P + O
        (None, p),                 # O + P
        (None, None),              # O + O
    ]
    P = dc.pack_points([c[0] for c in cases])
    Q = dc.pack_points([c[1] for c in cases])
    got = dc.unpack_points(dc.add(P, Q))
    expected = [BN254_G1.add(a, b) for a, b in cases]
    assert got == expected


def test_tree_reduce(dc):
    rng = random.Random(9)
    pts = [BN254_G1.random_point(rng) for _ in range(13)]
    P = dc.pack_points(pts)
    got = dc.unpack_points(dc.tree_reduce(P))[0]
    expected = None
    for p in pts:
        expected = BN254_G1.add(expected, p)
    assert got == expected


@pytest.mark.parametrize("n,window_bits", [(1, 4), (37, 4), (128, 8)])
def test_msm(dc, n, window_bits):
    rng = random.Random(n)
    pts = [BN254_G1.random_point(rng) for _ in range(n)]
    scalars = [BN254_G1.random_scalar(rng) for _ in range(n)]
    got = dc.unpack_points(dc.msm(pts, scalars, window_bits))[0]
    assert got == BN254_G1.msm(pts, scalars)


def test_msm_with_identity_and_zero_scalar(dc):
    rng = random.Random(77)
    pts = [BN254_G1.random_point(rng), None, BN254_G1.random_point(rng)]
    scalars = [5, 7, 0]
    got = dc.unpack_points(dc.msm(pts, scalars, 4))[0]
    assert got == BN254_G1.mul(pts[0], 5)
