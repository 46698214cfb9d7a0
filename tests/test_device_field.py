"""Device limb field arithmetic vs exact Python ints (the host oracle)."""

import random

import jax
import jax.numpy as jnp
import pytest

from halo2_lib_tpu.ops.limbs import DeviceField
from halo2_lib_tpu.utils.fields import FR_BN254, FQ_BN254, FP_SECP256K1, FQ_SECP256K1

FIELDS = [FR_BN254, FQ_BN254, FP_SECP256K1, FQ_SECP256K1]


@pytest.fixture(scope="module", params=FIELDS, ids=lambda f: f.name)
def df(request):
    return DeviceField(request.param)


def _rand_elems(field, n, seed=0):
    rng = random.Random(seed)
    # include edge cases
    edge = [0, 1, 2, field.p - 1, field.p - 2, (1 << 255) % field.p]
    return edge + [rng.randrange(field.p) for _ in range(n - len(edge))]


def test_pack_unpack_roundtrip(df):
    vals = _rand_elems(df.field, 32)
    arr = df.pack(vals)
    assert df.unpack(arr) == vals
    arr_c = df.pack(vals, mont=False)
    assert df.unpack(arr_c, mont=False) == vals


def test_add_sub_neg(df):
    F = df.field
    a_vals = _rand_elems(F, 64, seed=1)
    b_vals = _rand_elems(F, 64, seed=2)
    a, b = df.pack(a_vals), df.pack(b_vals)
    assert df.unpack(df.add(a, b)) == [F.add(x, y) for x, y in zip(a_vals, b_vals)]
    assert df.unpack(df.sub(a, b)) == [F.sub(x, y) for x, y in zip(a_vals, b_vals)]
    assert df.unpack(df.neg(a)) == [F.neg(x) for x in a_vals]
    assert df.unpack(df.double(a)) == [F.add(x, x) for x in a_vals]


def test_mont_mul(df):
    F = df.field
    a_vals = _rand_elems(F, 64, seed=3)
    b_vals = _rand_elems(F, 64, seed=4)
    a, b = df.pack(a_vals), df.pack(b_vals)
    got = df.unpack(df.mont_mul(a, b))
    assert got == [F.mul(x, y) for x, y in zip(a_vals, b_vals)]
    assert df.unpack(df.square(a)) == [F.mul(x, x) for x in a_vals]


def test_mul_jit_and_vmap(df):
    F = df.field
    a_vals = _rand_elems(F, 16, seed=5)
    b_vals = _rand_elems(F, 16, seed=6)
    a, b = df.pack(a_vals), df.pack(b_vals)
    mul_jit = jax.jit(df.mont_mul)
    assert df.unpack(mul_jit(a, b)) == [F.mul(x, y) for x, y in zip(a_vals, b_vals)]
    # 2D batch: [16, 16] lanes -> [4, 16, 4] (leading batch dim of 4)
    a2 = a.reshape(16, 4, 4).transpose(1, 0, 2)
    b2 = b.reshape(16, 4, 4).transpose(1, 0, 2)
    got = df.unpack(jax.jit(df.mont_mul)(a2, b2))
    assert got == [F.mul(x, y) for x, y in zip(a_vals, b_vals)]


def test_pow_inv(df):
    F = df.field
    vals = [v for v in _rand_elems(F, 20, seed=7) if v != 0]
    a = df.pack(vals)
    got = df.unpack(df.pow(a, 5))
    assert got == [pow(v, 5, F.p) for v in vals]
    inv = df.unpack(df.inv(a))
    assert inv == [F.inv(v) for v in vals]


def test_batch_inv(df):
    F = df.field
    vals = _rand_elems(F, 24, seed=8)  # includes zeros
    a = df.pack(vals)
    got = df.unpack(df.batch_inv(a))
    want = [F.inv(v) if v != 0 else 0 for v in vals]
    assert got == want


def test_predicates(df):
    F = df.field
    vals = [0, 1, 5, 0, F.p - 1]
    a = df.pack(vals)
    assert list(jax.device_get(df.is_zero(a))) == [v == 0 for v in vals]
    assert list(jax.device_get(df.eq(a, a))) == [True] * 5


def test_to_from_mont(df):
    F = df.field
    vals = _rand_elems(F, 16, seed=9)
    canonical = df.pack(vals, mont=False)
    m = df.to_mont(canonical)
    assert df.unpack(m) == vals
    back = df.from_mont(m)
    assert df.unpack(back, mont=False) == vals
