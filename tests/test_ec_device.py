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


def test_msm(dc):
    """One shape (XLA:CPU compiles are ~minutes per shape) covering every MSM
    edge case at once: identity base, zero scalar, DUPLICATE bases (exercises
    the doubling branch of the bucket-accumulation mixed add), tiny scalars."""
    rng = random.Random(64)
    n = 64
    pts = [BN254_G1.random_point(rng) for _ in range(n)]
    scalars = [BN254_G1.random_scalar(rng) for _ in range(n)]
    pts[3] = None  # identity base
    scalars[5] = 0  # zero scalar
    pts[10] = pts[11] = pts[12]  # duplicate bases -> same bucket doubling
    scalars[10] = scalars[11] = scalars[12]
    pts[20] = pts[21]  # duplicate base, different scalars
    scalars[30] = 1
    scalars[31] = 255  # single-window scalars
    got = dc.unpack_points(dc.msm(pts, scalars, 8))[0]
    expected = BN254_G1.msm([p for p in pts if p], [s for p, s in zip(pts, scalars) if p])
    assert got == expected


@pytest.mark.slow
@pytest.mark.parametrize("n,window_bits", [(37, 4), (128, 8)])
def test_msm_shapes(dc, n, window_bits):
    rng = random.Random(n)
    pts = [BN254_G1.random_point(rng) for _ in range(n)]
    scalars = [BN254_G1.random_scalar(rng) for _ in range(n)]
    got = dc.unpack_points(dc.msm(pts, scalars, window_bits))[0]
    assert got == BN254_G1.msm(pts, scalars)


def test_msm_many_lagrange_style(dc):
    """msm_many_device: several scalar columns over shared bases, one dispatch;
    the distinct-bases fast path (no doubling branch)."""
    import jax.numpy as jnp

    from halo2_lib_tpu.ops.ec_device import msm_many_device

    rng = random.Random(99)
    n, C = 32, 3
    pts = [BN254_G1.random_point(rng) for _ in range(n)]
    cols = [[BN254_G1.random_scalar(rng) for _ in range(n)] for _ in range(C)]
    A = dc.pack_points_affine(pts)
    digits = jnp.stack([dc.pack_scalars(col, 8) for col in cols])  # [C, W, n]
    out = msm_many_device(dc, A, digits, 8, True)  # (X, Y, Z) each [16, C]
    got = dc.unpack_points(out)
    for c in range(C):
        assert got[c] == BN254_G1.msm(pts, cols[c])
