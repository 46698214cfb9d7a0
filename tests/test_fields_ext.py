"""Fp2/Fp12 chip tests vs host tower-field oracles."""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.ecc.fields_ext import Fp2Chip, Fp12Chip
from halo2_lib_tpu.ecc.fp import FpChip
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils.bn254_pairing import Fq12
from halo2_lib_tpu.utils.curves import FQ2_BN254
from halo2_lib_tpu.utils.fields import FQ_BN254

LIMB_BITS = 88
NUM_LIMBS = 3


def run_circuit(f, k=15, lookup_bits=14):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(lookup_bits)
    rc = builder.range_chip()
    fp_chip = FpChip(rc, LIMB_BITS, NUM_LIMBS, FQ_BN254)
    res = f(builder.main(0), fp_chip)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(k, builder).verify()
    assert not errors, "\n".join(errors[:5])
    return res


def rand_fq2(rng):
    return (rng.randrange(FQ_BN254.p), rng.randrange(FQ_BN254.p))


def rand_fq12(rng):
    return Fq12([rng.randrange(FQ_BN254.p) for _ in range(12)])


def test_fp2_mul_divide():
    rng = random.Random(21)
    a_v, b_v = rand_fq2(rng), rand_fq2(rng)

    def f(ctx, fp_chip):
        chip = Fp2Chip(fp_chip)
        a = chip.load_private(ctx, list(a_v))
        b = chip.load_private(ctx, list(b_v))
        c = chip.mul(ctx, a, b)
        assert chip.get_assigned_value(c) == FQ2_BN254.mul(a_v, b_v)
        q = chip.divide_unsafe(ctx, a, b)
        assert chip.get_assigned_value(q) == FQ2_BN254.mul(a_v, FQ2_BN254.inv(b_v))
        conj = chip.conjugate(ctx, a)
        assert chip.get_assigned_value(conj) == FQ2_BN254.conjugate(a_v)

    run_circuit(f)


def test_fp12_mul():
    rng = random.Random(22)
    a_v, b_v = rand_fq12(rng), rand_fq12(rng)

    def f(ctx, fp_chip):
        chip = Fp12Chip(fp_chip)
        a = chip.load_private(ctx, chip.fq12_to_coeffs(a_v))
        b = chip.load_private(ctx, chip.fq12_to_coeffs(b_v))
        c = chip.mul(ctx, a, b)
        assert chip.get_fq12_value(c) == a_v * b_v
        q = chip.divide_unsafe(ctx, a, b)
        assert chip.get_fq12_value(q) == a_v * b_v.inv()
        conj = chip.conjugate(ctx, a)
        assert chip.get_fq12_value(conj) == a_v.conjugate()

    run_circuit(f)


def test_fp12_frobenius():
    from halo2_lib_tpu.ecc.final_exp import frobenius_map
    from halo2_lib_tpu.utils.bn254_pairing import P as FQ_P

    rng = random.Random(23)
    a_v = rand_fq12(rng)

    def f(ctx, fp_chip):
        chip = Fp12Chip(fp_chip)
        a = chip.load_private(ctx, chip.fq12_to_coeffs(a_v))
        for power in (1, 2, 3):
            fr = frobenius_map(chip, ctx, a, power)
            assert chip.get_fq12_value(fr) == a_v.pow(FQ_P**power), f"power {power}"

    run_circuit(f)


def test_cyclotomic_square_vs_real_square():
    """For an element of the cyclotomic subgroup, compressed squaring must
    match true squaring (Karabina Thm 3.2)."""
    from halo2_lib_tpu.ecc.final_exp import (
        cyclotomic_compress,
        cyclotomic_decompress,
        cyclotomic_square,
    )
    from halo2_lib_tpu.utils.bn254_pairing import P as FQ_P, R as FR_R

    rng = random.Random(24)
    # random cyclotomic element: x^{(p^6-1)(p^2+1)}
    x = rand_fq12(rng)
    g = x.pow(FQ_P**6 - 1)
    g = g.pow(FQ_P**2 + 1)

    def f(ctx, fp_chip):
        chip = Fp12Chip(fp_chip)
        a = chip.load_private(ctx, chip.fq12_to_coeffs(g))
        comp = cyclotomic_compress(a)
        sq_comp = cyclotomic_square(chip, ctx, comp)
        dec = cyclotomic_decompress(chip, ctx, sq_comp)
        assert chip.get_fq12_value(dec) == g * g

    run_circuit(f)
