"""BN254 pairing circuit test vs the host optimal-Ate oracle.

Mirrors halo2-ecc/src/bn254/tests/pairing.rs: random G1/G2 points, in-circuit
miller loop + final exp, compare with host pairing; MockProver check.
"""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.ecc.fp import FpChip
from halo2_lib_tpu.ecc.pairing import PairingChip
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils import bn254_pairing as host
from halo2_lib_tpu.utils.curves import BN254_G1, BN254_G2
from halo2_lib_tpu.utils.fields import FQ_BN254

K = 17
LOOKUP_BITS = 16


@pytest.mark.slow
def test_pairing_circuit_matches_host():
    rng = random.Random(71)
    P = BN254_G1.random_point(rng)
    s = rng.randrange(1, 1 << 40)
    Q = BN254_G2.mul(BN254_G2.g, s)
    expected = host.pairing(P, Q)

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_lookup_bits(LOOKUP_BITS)
    rc = builder.range_chip()
    fp_chip = FpChip(rc, 88, 3, FQ_BN254)
    chip = PairingChip(fp_chip)
    ctx = builder.main(0)
    p_assigned = chip.load_private_g1_unchecked(ctx, P)
    q_assigned = chip.load_private_g2_unchecked(ctx, Q)
    f = chip.pairing(ctx, q_assigned, p_assigned)

    from halo2_lib_tpu.ecc.fields_ext import Fp12Chip

    fp12 = Fp12Chip(fp_chip)
    got = fp12.get_fq12_value(f)
    assert got == expected, "in-circuit pairing != host pairing"

    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(K, builder).verify()
    assert not errors, "\n".join(errors[:5])


@pytest.mark.slow
def test_miller_loop_bilinearity_in_circuit():
    """e'(aP, Q) after final exp == e'(P, aQ) after final exp."""
    rng = random.Random(72)
    a = rng.randrange(1, 1 << 30)
    P = BN254_G1.random_point(rng)
    Q = BN254_G2.mul(BN254_G2.g, 7)
    lhs = host.pairing(BN254_G1.mul(P, a), Q)
    rhs = host.pairing(P, BN254_G2.mul(Q, a))
    assert lhs == rhs  # host sanity

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_lookup_bits(LOOKUP_BITS)
    rc = builder.range_chip()
    fp_chip = FpChip(rc, 88, 3, FQ_BN254)
    chip = PairingChip(fp_chip)
    ctx = builder.main(0)
    p_a = chip.load_private_g1_unchecked(ctx, BN254_G1.mul(P, a))
    q = chip.load_private_g2_unchecked(ctx, Q)
    f = chip.pairing(ctx, q, p_a)

    from halo2_lib_tpu.ecc.fields_ext import Fp12Chip

    assert Fp12Chip(fp_chip).get_fq12_value(f) == lhs
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(K, builder).verify()
    assert not errors, "\n".join(errors[:5])
