"""FpChip / bigint CRT arithmetic tests against exact big-int ground truth.

Mirrors the reference's fields/tests/fp (mock-prover unit tests) and the
negative-test pattern of gates/tests/neg_prop.rs.
"""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.ecc.fp import FpChip
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils.fields import FQ_BN254, FR_BN254, FP_SECP256K1

LIMB_BITS = 88
NUM_LIMBS = 3


def run_fp_circuit(f, expect_ok=True, k=14, lookup_bits=13, fp=FQ_BN254):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(lookup_bits)
    range_chip = builder.range_chip()
    chip = FpChip(range_chip, LIMB_BITS, NUM_LIMBS, fp)
    ctx = builder.main(0)
    res = f(ctx, chip)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(k, builder).verify()
    if expect_ok:
        assert not errors, "\n".join(errors[:5])
    else:
        assert errors, "expected failure but circuit is satisfied"
    return res


@pytest.mark.parametrize("seed", range(4))
def test_fp_mul(seed):
    rng = random.Random(seed)
    a_v, b_v = rng.randrange(FQ_BN254.p), rng.randrange(FQ_BN254.p)

    def f(ctx, chip):
        a = chip.load_private(ctx, a_v)
        b = chip.load_private(ctx, b_v)
        c = chip.mul(ctx, a, b)
        assert chip.get_assigned_value(c) == a_v * b_v % FQ_BN254.p
        return c

    run_fp_circuit(f)


def test_fp_add_sub_carry():
    rng = random.Random(1)
    a_v, b_v = rng.randrange(FQ_BN254.p), rng.randrange(FQ_BN254.p)

    def f(ctx, chip):
        a = chip.load_private(ctx, a_v)
        b = chip.load_private(ctx, b_v)
        s = chip.carry_mod(ctx, chip.add_no_carry(ctx, a, b))
        d = chip.carry_mod(ctx, chip.sub_no_carry(ctx, a, b))
        assert chip.get_assigned_value(s) == (a_v + b_v) % FQ_BN254.p
        assert chip.get_assigned_value(d) == (a_v - b_v) % FQ_BN254.p

    run_fp_circuit(f)


def test_fp_divide():
    rng = random.Random(2)
    a_v, b_v = rng.randrange(FQ_BN254.p), rng.randrange(1, FQ_BN254.p)

    def f(ctx, chip):
        a = chip.load_private(ctx, a_v)
        b = chip.load_private(ctx, b_v)
        q = chip.divide(ctx, a, b)
        assert chip.get_assigned_value(q) == a_v * FQ_BN254.inv(b_v) % FQ_BN254.p

    run_fp_circuit(f)


def test_fp_negate_zero_and_nonzero():
    def f(ctx, chip):
        a = chip.load_private(ctx, 12345)
        na = chip.negate(ctx, a)
        assert chip.get_assigned_value(na) == FQ_BN254.p - 12345
        z = chip.load_private(ctx, 0)
        nz = chip.negate(ctx, z)
        assert chip.get_assigned_value(nz) == 0

    run_fp_circuit(f)


def test_fp_is_zero_is_equal():
    def f(ctx, chip):
        a = chip.load_private(ctx, 7)
        b = chip.load_private(ctx, 7)
        z = chip.load_private(ctx, 0)
        assert chip.is_zero(ctx, z).val() == 1
        assert chip.is_zero(ctx, a).val() == 0
        assert chip.is_equal(ctx, a, b).val() == 1
        assert chip.is_equal(ctx, a, z).val() == 0

    run_fp_circuit(f)


def test_fp_scalar_mul_and_add():
    rng = random.Random(3)
    a_v, b_v = rng.randrange(FQ_BN254.p), rng.randrange(FQ_BN254.p)

    def f(ctx, chip):
        a = chip.load_private(ctx, a_v)
        b = chip.load_private(ctx, b_v)
        out = chip.carry_mod(ctx, chip.scalar_mul_and_add_no_carry(ctx, a, b, -5))
        assert chip.get_assigned_value(out) == (a_v * -5 + b_v) % FQ_BN254.p

    run_fp_circuit(f)


def test_fp_secp_base_field():
    rng = random.Random(4)
    a_v, b_v = rng.randrange(FP_SECP256K1.p), rng.randrange(FP_SECP256K1.p)

    def f(ctx, chip):
        a = chip.load_private(ctx, a_v)
        b = chip.load_private(ctx, b_v)
        c = chip.mul(ctx, a, b)
        assert chip.get_assigned_value(c) == a_v * b_v % FP_SECP256K1.p

    run_fp_circuit(f, fp=FP_SECP256K1)


def test_fp_mul_pranked_witness_fails():
    """Negative test: corrupt the product witness, MockProver must reject."""
    def f(ctx, chip):
        a = chip.load_private(ctx, 1234567)
        b = chip.load_private(ctx, 7654321)
        c = chip.mul(ctx, a, b)
        # prank limb 0 of the output
        c.limbs()[0].debug_prank(ctx, (c.limbs()[0].val() + 1) % FR_BN254.p)

    run_fp_circuit(f, expect_ok=False)
