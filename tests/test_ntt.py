"""NTT kernel vs naive host DFT over bn254 Fr.

One shared log_n=5 instance: each NTT size compiles its own kernel (~10s on
1-core CPU), so tests reuse instances rather than sweeping sizes.
"""

import random

import pytest

from halo2_lib_tpu.ops.limbs import DeviceField
from halo2_lib_tpu.ops.ntt import NTT, CosetNTT
from halo2_lib_tpu.utils.fields import FR_BN254 as F

LOG_N = 5
N = 1 << LOG_N


@pytest.fixture(scope="module")
def df():
    return DeviceField(F)


@pytest.fixture(scope="module")
def ntt(df):
    return NTT(df, LOG_N)


def naive_dft(coeffs, w, p):
    n = len(coeffs)
    return [sum(c * pow(w, i * j, p) for j, c in enumerate(coeffs)) % p for i in range(n)]


def test_ntt_vs_naive(df, ntt):
    rng = random.Random(0)
    coeffs = [rng.randrange(F.p) for _ in range(N)]
    got = df.unpack(ntt.forward(df.pack(coeffs)))
    assert got == naive_dft(coeffs, ntt.omega, F.p)


def test_ntt_size_2(df):
    # smallest size sanity check
    ntt2 = NTT(df, 1)
    a, b = 3, 5
    got = df.unpack(ntt2.forward(df.pack([a, b])))
    w = ntt2.omega
    assert got == [(a + b) % F.p, (a + b * w) % F.p]


def test_ntt_roundtrip(df, ntt):
    rng = random.Random(1)
    coeffs = [rng.randrange(F.p) for _ in range(N)]
    back = df.unpack(ntt.inverse(ntt.forward(df.pack(coeffs))))
    assert back == coeffs


def test_ntt_convolution(df, ntt):
    """NTT(a) * NTT(b) == NTT(a conv b) — the property the prover relies on."""
    rng = random.Random(2)
    a = [rng.randrange(F.p) for _ in range(N // 2)] + [0] * (N // 2)
    b = [rng.randrange(F.p) for _ in range(N // 2)] + [0] * (N // 2)
    c = [0] * N
    for i in range(N // 2):
        for j in range(N // 2):
            c[i + j] = (c[i + j] + a[i] * b[j]) % F.p
    ec = df.mont_mul(ntt.forward(df.pack(a)), ntt.forward(df.pack(b)))
    assert df.unpack(ntt.inverse(ec)) == c


def test_coset_ntt(df):
    rng = random.Random(3)
    log_n = 4
    n = 1 << log_n
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    shift = 7  # Fr multiplicative generator
    cntt = CosetNTT(df, log_n, shift)
    got = df.unpack(cntt.forward(df.pack(coeffs)))
    w = F.nth_root_of_unity(log_n)
    want = [
        sum(c * pow(shift * pow(w, i, F.p) % F.p, j, F.p) for j, c in enumerate(coeffs)) % F.p
        for i in range(n)
    ]
    assert got == want
    back = df.unpack(cntt.inverse(cntt.forward(df.pack(coeffs))))
    assert back == coeffs


def test_ntt_batched(df, ntt):
    """Leading batch dims transform independently in one dispatch."""
    rng = random.Random(9)
    cols = [[rng.randrange(F.p) for _ in range(N)] for _ in range(3)]
    import jax.numpy as jnp

    stacked = jnp.stack([df.pack(c) for c in cols])
    out = ntt.forward(stacked)
    for i, c in enumerate(cols):
        assert df.unpack(out[i]) == df.unpack(ntt.forward(df.pack(c)))
    back = ntt.inverse(out)
    for i, c in enumerate(cols):
        assert df.unpack(back[i]) == c
