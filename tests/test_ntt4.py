"""Four-step VMEM NTT (ops/ntt4.py) vs the reference Stockham path.

The kernels run in pallas interpret mode here (CPU test host); bit-exactness
against ops/ntt.NTT covers the stage-twiddle construction, the fused mid
(diagonal) twiddle, the folded 1/n inverse scaling, and the inter-level
transposes. Role: the radix-2 FFT inside halo2-axiom create_proof
(SURVEY.md §2.9)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halo2_lib_tpu.ops.limbs import DeviceField, N_LIMBS
from halo2_lib_tpu.ops.ntt import NTT
from halo2_lib_tpu.ops.ntt4 import FourStepNTT, _plan
from halo2_lib_tpu.utils.fields import FR_BN254


def test_plan_factors():
    assert _plan(1 << 12) == [32, 128]
    assert _plan(1 << 15) == [2, 128, 128]
    assert _plan(1 << 17) == [8, 128, 128]
    assert _plan(1 << 20) == [64, 128, 128]
    for k in range(12, 21):
        fs = _plan(1 << k)
        assert np.prod(fs) == 1 << k
        assert all(f <= 128 for f in fs)
        assert fs == sorted(fs)


@pytest.fixture(scope="module")
def pair():
    df = DeviceField(FR_BN254)
    log_n = 12
    return df, NTT(df, log_n), FourStepNTT(df, log_n, interpret=True), 1 << log_n


def _rand(n, c, seed):
    key = jax.random.PRNGKey(seed)
    x = jax.random.randint(key, (c, N_LIMBS, n), 0, 1 << 16, dtype=jnp.uint32)
    return x.at[:, -1, :].set(0)  # keep values < p


def test_forward_matches_reference(pair):
    df, ref, fs, n = pair
    x = _rand(n, 2, 0)
    a = np.asarray(ref._body(x, True))
    b = np.asarray(fs._body(x, True))
    assert (a == b).all()


def test_inverse_matches_reference_with_folded_scale(pair):
    df, ref, fs, n = pair
    x = _rand(n, 2, 1)
    a = np.asarray(ref._body(x, False))  # includes 1/n
    b = np.asarray(fs._body(x, False))  # 1/n folded into level-0 mid
    assert (a == b).all()


def test_roundtrip(pair):
    df, ref, fs, n = pair
    x = _rand(n, 1, 2)
    back = np.asarray(fs._body(fs._body(x, True), False))
    assert (back == np.asarray(x)).all()
