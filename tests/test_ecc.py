"""EC chip tests: in-circuit results vs host exact curve arithmetic.

Mirrors halo2-ecc's ecc tests (bn254/tests/, ec_add etc.): random points,
in-circuit op, compare against ShortWeierstrass oracle, MockProver check.
"""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.ecc.ec import EccChip, ec_double_and_add_unequal
from halo2_lib_tpu.ecc.fp import FpChip
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils.curves import BN254_G1, SECP256K1

LIMB_BITS = 88
NUM_LIMBS = 3


def run_ec_circuit(f, curve=BN254_G1, expect_ok=True, k=16, lookup_bits=15, use_pool=False):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(lookup_bits)
    range_chip = builder.range_chip()
    fp_chip = FpChip(range_chip, LIMB_BITS, NUM_LIMBS, curve.base)
    chip = EccChip(fp_chip, curve)
    if use_pool:
        res = f(builder.pool(0), chip)
    else:
        res = f(builder.main(0), chip)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(k, builder).verify()
    if expect_ok:
        assert not errors, "\n".join(errors[:5])
    else:
        assert errors, "expected failure"
    return res


def point_value(chip, pt):
    fc = chip.field_chip
    return (fc.get_assigned_value(pt.x), fc.get_assigned_value(pt.y))


@pytest.mark.parametrize("curve", [BN254_G1, SECP256K1], ids=["bn254", "secp256k1"])
def test_ec_add_double_sub(curve):
    rng = random.Random(11)
    P = curve.random_point(rng)
    Q = curve.random_point(rng)

    def f(ctx, chip):
        p = chip.load_private(ctx, P)
        q = chip.load_private(ctx, Q)
        s = chip.add_unequal(ctx, p, q, True)
        assert point_value(chip, s) == curve.add(P, Q)
        d = chip.double(ctx, p)
        assert point_value(chip, d) == curve.double(P)
        sub = chip.sub_unequal(ctx, p, q, True)
        assert point_value(chip, sub) == curve.add(P, curve.neg(Q))
        dba = ec_double_and_add_unequal(chip.field_chip, ctx, p, q, True)
        assert point_value(chip, dba) == curve.add(curve.double(P), Q)
        n = chip.negate(ctx, p)
        assert point_value(chip, n) == curve.neg(P)

    run_ec_circuit(f, curve)


def test_ec_on_curve_checks():
    rng = random.Random(12)
    P = BN254_G1.random_point(rng)

    def f(ctx, chip):
        p = chip.load_private(ctx, P)  # includes on-curve check
        inf = chip.assign_point(ctx, None)
        assert chip.field_chip.get_assigned_value(inf.x) == 0
        ok = chip.is_on_curve_or_infinity(ctx, p)
        assert ok.val() == 1

    run_ec_circuit(f)


def test_ec_bad_point_fails():
    def f(ctx, chip):
        chip.load_private(ctx, (5, 7))  # not on bn254

    run_ec_circuit(f, expect_ok=False)


@pytest.mark.parametrize("curve", [BN254_G1, SECP256K1], ids=["bn254", "secp256k1"])
def test_scalar_mult(curve):
    rng = random.Random(13)
    P = curve.random_point(rng)
    s = curve.random_scalar(rng)

    # scalars wider than the native field are split into 128-bit chunks
    max_bits = 254 if curve.scalar.num_bits <= 254 else 128
    num_chunks = -(-curve.scalar.num_bits // max_bits)
    mask = (1 << max_bits) - 1
    chunks = [(s >> (max_bits * i)) & mask for i in range(num_chunks)]

    def f(ctx, chip):
        p = chip.load_private(ctx, P)
        sc = [ctx.load_witness(c) for c in chunks]
        out = chip.scalar_mult(ctx, p, sc, max_bits=max_bits, window_bits=4)
        assert point_value(chip, out) == curve.mul(P, s)

    run_ec_circuit(f, curve, k=17, lookup_bits=16)


def test_msm_small():
    rng = random.Random(14)
    n = 3
    points = [BN254_G1.random_point(rng) for _ in range(n)]
    scalars = [BN254_G1.random_scalar(rng) for _ in range(n)]
    expected = BN254_G1.msm(points, scalars)

    def f(pool, chip):
        ctx = pool.main()
        pts = [chip.load_private(ctx, P) for P in points]
        scs = [[ctx.load_witness(s)] for s in scalars]
        out = chip.variable_base_msm(pool, pts, scs, max_bits=254)
        assert point_value(chip, out) == expected

    run_ec_circuit(f, k=18, lookup_bits=17, use_pool=True)


def test_msm_with_identity_and_cancellation():
    """msm_sum_infinity analog: includes (0,0) point and P + (-P)."""
    rng = random.Random(15)
    P = BN254_G1.random_point(rng)
    points = [P, BN254_G1.neg(P), None]
    scalars = [5, 5, 7]
    expected = None  # 5P - 5P + 7*O = O

    def f(pool, chip):
        ctx = pool.main()
        pts = [chip.assign_point(ctx, p) for p in points]
        scs = [[ctx.load_witness(s)] for s in scalars]
        out = chip.variable_base_msm(pool, pts, scs, max_bits=254)
        assert point_value(chip, out) == (0, 0)

    run_ec_circuit(f, k=18, lookup_bits=17, use_pool=True)


def test_fixed_base_scalar_mult():
    rng = random.Random(16)
    s = BN254_G1.random_scalar(rng)
    G = BN254_G1.g

    def f(ctx, chip):
        sc = [ctx.load_witness(s)]
        out = chip.fixed_base_scalar_mult(ctx, G, sc, max_bits=254, window_bits=4)
        assert point_value(chip, out) == BN254_G1.mul(G, s)

    run_ec_circuit(f, k=17, lookup_bits=16)


def test_fixed_base_msm():
    rng = random.Random(17)
    n = 4
    points = [BN254_G1.random_point(rng) for _ in range(n)]
    scalars = [BN254_G1.random_scalar(rng) for _ in range(n)]
    expected = BN254_G1.msm(points, scalars)

    def f(pool, chip):
        ctx = pool.main()
        scs = [[ctx.load_witness(s)] for s in scalars]
        out = chip.fixed_base_msm(pool, points, scs, max_scalar_bits_per_cell=254)
        assert point_value(chip, out) == expected

    run_ec_circuit(f, k=18, lookup_bits=17, use_pool=True)


def test_ec_sum_with_identity():
    rng = random.Random(18)
    pts_host = [BN254_G1.random_point(rng) for _ in range(3)]
    expected = None
    for p in pts_host:
        expected = BN254_G1.add(expected, p)

    def f(ctx, chip):
        pts = [chip.load_private(ctx, p) for p in pts_host]
        pts.append(chip.assign_point(ctx, None))
        out = chip.sum(ctx, pts)
        assert point_value(chip, out) == expected

    run_ec_circuit(f, k=16, lookup_bits=15)
