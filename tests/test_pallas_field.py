"""Pallas kernels (ops/pallas_field.py) vs the XLA reference path.

Runs in interpret mode on the CPU test backend; the TPU path compiles the
same kernel bodies through Mosaic. Covers the complete-add case analysis:
generic, doubling (P+P), inverse (P+(-P)), and identity operands.
"""

import random

import jax.numpy as jnp
import pytest

from halo2_lib_tpu.ops import pallas_field as pf
from halo2_lib_tpu.ops.ec_device import DeviceCurve
from halo2_lib_tpu.ops.limbs import DeviceField
from halo2_lib_tpu.utils.curves import BN254_G1

pytestmark = pytest.mark.skipif(not pf.HAVE_PALLAS, reason="pallas unavailable")

N = 512  # one lane-pad granule


@pytest.fixture(scope="module")
def dc():
    return DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)


def test_mont_mul_matches_xla(dc):
    df = dc.df
    rng = random.Random(11)
    a = df.pack([rng.randrange(df.p_int) for _ in range(N)])
    b = df.pack([rng.randrange(df.p_int) for _ in range(N)])
    want = df._mont_mul_xla(a, b)
    got = pf.mont_mul(df, a, b, interpret=True)
    assert jnp.array_equal(want, got)


def test_mont_mul_edge_values(dc):
    df = dc.df
    vals = [0, 1, df.p_int - 1, df.R % df.p_int] * (N // 4)
    a = df.pack(vals)
    b = df.pack(list(reversed(vals)))
    want = df._mont_mul_xla(a, b)
    got = pf.mont_mul(df, a, b, interpret=True)
    assert jnp.array_equal(want, got)


def test_ec_add_all_cases(dc):
    rng = random.Random(7)
    n = N
    pts1 = [BN254_G1.random_point(rng) for _ in range(n)]
    pts2 = [BN254_G1.random_point(rng) for _ in range(n)]
    # exercise the special-case selects
    pts1[0] = None  # O + Q
    pts2[1] = None  # P + O
    pts1[2] = None
    pts2[2] = None  # O + O
    pts2[3] = pts1[3]  # P + P (doubling branch)
    x, y = pts1[4]
    pts2[4] = (x, BN254_G1.base.p - y)  # P + (-P) = O
    P1 = dc.pack_points(pts1)
    P2 = dc.pack_points(pts2)
    want = dc.unpack_points(dc._add_xla(P1, P2))
    got = dc.unpack_points(pf.ec_add(dc, P1, P2, interpret=True))
    assert want == got


def test_ec_double_matches_xla(dc):
    rng = random.Random(9)
    pts = [BN254_G1.random_point(rng) for _ in range(N - 1)] + [None]
    P = dc.pack_points(pts)
    want = dc.unpack_points(dc._double_xla(P))
    got = dc.unpack_points(pf.ec_double(dc, P, interpret=True))
    assert want == got


def test_off_block_size_falls_back(dc):
    """Sizes not divisible by BLK take the XLA path and still agree."""
    df = dc.df
    rng = random.Random(3)
    a = df.pack([rng.randrange(df.p_int) for _ in range(10)])
    b = df.pack([rng.randrange(df.p_int) for _ in range(10)])
    assert jnp.array_equal(
        pf.mont_mul(df, a, b, interpret=True), df._mont_mul_xla(a, b)
    )


def test_fermat_inv_interpret():
    """In-kernel unrolled a^(p-2) (pallas_field.fermat_inv) vs host pow.

    Uses a small prime so interpret mode stays fast (the 254-bit chain is
    ~330 interpreted Montgomery multiplies — minutes); the full-width chain
    runs through the same windowed-constant code path."""
    import random

    from halo2_lib_tpu.ops import pallas_field
    from halo2_lib_tpu.ops.limbs import DeviceField
    from halo2_lib_tpu.utils.fields import PrimeField

    p = 65537
    df = DeviceField(PrimeField(p, "f65537"))
    rng = random.Random(9)
    vals = [rng.randrange(1, p) for _ in range(3)] + [0, 1, p - 1]
    a = df.pack(vals)
    out = pallas_field.fermat_inv(df, a, interpret=True)
    got = df.unpack(out)
    want = [pow(v, p - 2, p) if v else 0 for v in vals]
    assert got == want
