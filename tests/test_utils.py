"""Limb decomposition round-trips vs ground truth (reference: utils/mod.rs:446-550)."""

import random

from halo2_lib_tpu.utils import (
    FR_BN254,
    FQ_BN254,
    FP_SECP256K1,
    FQ_SECP256K1,
    compose_int,
    decompose_int,
)


def test_decompose_roundtrip():
    rng = random.Random(0)
    for field in (FR_BN254, FQ_BN254, FP_SECP256K1, FQ_SECP256K1):
        for _ in range(500):
            x = rng.randrange(field.p)
            for bit_len in (1, 8, 16, 64, 88, 90):
                n = -(-field.num_bits // bit_len)
                limbs = decompose_int(x, n, bit_len)
                assert all(0 <= l < (1 << bit_len) for l in limbs)
                assert compose_int(limbs, bit_len) == x


def test_field_basics():
    for field in (FR_BN254, FQ_BN254, FP_SECP256K1, FQ_SECP256K1):
        rng = random.Random(1)
        for _ in range(100):
            a, b = rng.randrange(1, field.p), rng.randrange(1, field.p)
            assert field.mul(a, field.inv(a)) == 1
            assert field.add(a, field.neg(a)) == 0
            assert field.sub(field.add(a, b), b) == a


def test_roots_of_unity():
    # bn254 Fr has 2-adicity 28; generator 7 must be a non-residue
    assert FR_BN254.s == 28
    assert pow(7, (FR_BN254.p - 1) // 2, FR_BN254.p) == FR_BN254.p - 1
    w = FR_BN254.nth_root_of_unity(10)
    assert pow(w, 1 << 10, FR_BN254.p) == 1
    assert pow(w, 1 << 9, FR_BN254.p) != 1
