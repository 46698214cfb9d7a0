"""MXU digit-matmul NTT (ops/ntt_mxu.py) vs the Stockham reference kernel.

The MXU path is exact by construction (8-bit digit planes, f32-exact sums);
these tests check bit-identical agreement with ops/ntt.py on CPU, including
the recursive (log_n > 16 is too big for tests; recursion is exercised via a
forced small split) and batched paths.
"""

import random

import jax.numpy as jnp
import pytest

from halo2_lib_tpu.ops.limbs import DeviceField
from halo2_lib_tpu.ops.ntt import NTT
from halo2_lib_tpu.ops.ntt_mxu import MxuNTT
from halo2_lib_tpu.utils.fields import FR_BN254 as F


@pytest.fixture(scope="module")
def df():
    return DeviceField(F)


def test_mxu_matches_stockham(df):
    rng = random.Random(5)
    log_n = 6
    n = 1 << log_n
    ref = NTT(df, log_n)
    mxu = MxuNTT(df, log_n)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    x = df.pack(coeffs)
    assert df.unpack(mxu.forward(x)) == df.unpack(ref.forward(x))
    assert df.unpack(mxu.inverse(ref.forward(x))) == coeffs


def test_mxu_batched_and_roundtrip(df):
    rng = random.Random(6)
    log_n = 7
    n = 1 << log_n
    mxu = MxuNTT(df, log_n)
    cols = [[rng.randrange(F.p) for _ in range(n)] for _ in range(3)]
    stacked = jnp.stack([df.pack(c) for c in cols])
    out = mxu.forward(stacked)
    ref = NTT(df, log_n)
    for i, c in enumerate(cols):
        assert df.unpack(out[i]) == df.unpack(ref.forward(df.pack(c)))
    back = mxu.inverse(out)
    for i, c in enumerate(cols):
        assert df.unpack(back[i]) == c


def test_mxu_recursive_split(df):
    """The outer four-step recursion (log_n > 16 path), forced at a small
    size by constructing the object by hand."""
    rng = random.Random(7)
    log_n = 8
    n = 1 << log_n
    mxu = MxuNTT(df, log_n)
    # rebuild with a forced outer split (k1=3, k2=5) exercising .sub
    forced = MxuNTT.__new__(MxuNTT)
    forced.df = df
    forced.log_n = log_n
    forced.n = n
    forced.omega = mxu.omega
    forced.omega_inv = mxu.omega_inv
    forced.n_inv = mxu.n_inv
    forced.n_inv_mont = mxu.n_inv_mont
    forced.k1, forced.k2 = 3, 5
    forced.sub = (MxuNTT(df, 3), MxuNTT(df, 5))
    forced._tw = {}
    import jax

    forced._fwd = jax.jit(lambda x: forced._mapped(x, True))
    forced._bwd = jax.jit(lambda x: forced._mapped(x, False))

    coeffs = [rng.randrange(F.p) for _ in range(n)]
    x = df.pack(coeffs)
    ref = NTT(df, log_n)
    assert df.unpack(forced.forward(x)) == df.unpack(ref.forward(x))
    assert df.unpack(forced.inverse(forced.forward(x))) == coeffs
