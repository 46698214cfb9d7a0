"""End-to-end real-prover tests: keygen -> create_proof -> verify_proof.

Mirrors the reference's bench_builder path (utils/testing.rs:198-247) and the
soundness tests of fields/tests/fp/assert_eq.rs (tampered proofs must fail).
"""

import random

import pytest

from halo2_lib_tpu.backend.keygen import keygen
from halo2_lib_tpu.backend.kzg import ParamsKZG
from halo2_lib_tpu.backend.prover import create_proof
from halo2_lib_tpu.backend.verifier import VerificationError, verify_proof
from halo2_lib_tpu.core.cells import Constant, Existing, Witness
from halo2_lib_tpu.gates.circuit import (
    BaseCircuitBuilder,
    BaseCircuitParams,
    CircuitBuilderStage,
)

K = 9


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.setup(K)


def build_circuit(x_val: int, use_range: bool = True) -> BaseCircuitBuilder:
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_lookup_bits(8)
    rc = builder.range_chip()
    gate = rc.gate
    ctx = builder.main(0)
    x = ctx.load_witness(x_val)
    y = gate.mul(ctx, Existing(x), Existing(x))
    z = gate.add(ctx, Existing(y), Constant(7))
    for _ in range(10):
        z = gate.mul_add(ctx, Existing(z), Existing(x), Constant(3))
    if use_range:
        rc.range_check(ctx, z, 240)
        rc.check_less_than(ctx, Existing(x), Constant(1 << 40), 48)
    # force >= 2 advice columns + 1 lookup col (prover does not take the
    # single-column q_lookup path)
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    if use_range:
        p.num_lookup_advice_per_phase[0] = max(p.num_lookup_advice_per_phase[0], 1)
    return builder


def test_prove_and_verify(params):
    builder = build_circuit(12345)
    pk = keygen(params, builder)
    proof = create_proof(params, pk, builder)
    assert verify_proof(params, pk.vk, proof)


def test_proof_is_deterministic(params):
    builder = build_circuit(999)
    pk = keygen(params, builder)
    p1 = create_proof(params, pk, builder, seed=1)
    builder2 = build_circuit(999)
    p2 = create_proof(params, pk, builder2, seed=1)
    assert p1 == p2


def test_tampered_proof_fails(params):
    builder = build_circuit(4242)
    pk = keygen(params, builder)
    proof = bytearray(create_proof(params, pk, builder))
    proof[len(proof) // 2] ^= 1
    assert not verify_proof(params, pk.vk, bytes(proof))


def test_wrong_witness_fails(params):
    """Proof generated from a circuit whose witness violates a range check."""
    builder = build_circuit(12345)
    pk = keygen(params, builder)

    bad_builder = build_circuit(12345)
    # corrupt one advice witness: prank the first context cell
    ctx = bad_builder.main(0)
    ctx.advice[0] = (ctx.advice[0] + 1) % bad_builder.field.p
    try:
        proof = create_proof(params, pk, bad_builder)
    except Exception:
        return  # witness gen itself detected the inconsistency -> fine
    assert not verify_proof(params, pk.vk, proof)


def test_q_lookup_single_column_prover(params):
    """Single-advice-column circuit proves through the q_lookup selector path
    (reference range/mod.rs:88-108: q_lookup * a_0 in the lookup argument)."""
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_lookup_bits(8)
    rc = builder.range_chip()
    ctx = builder.main(0)
    x = ctx.load_witness(0xAB)
    rc.range_check(ctx, x, 8)
    y = rc.gate.add(ctx, Existing(x), Constant(1))
    rc.range_check(ctx, y, 8)
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    assert p.num_advice_per_phase[0] == 1
    p.num_lookup_advice_per_phase[0] = max(p.num_lookup_advice_per_phase[0], 1)
    pk = keygen(params, builder)
    assert pk.vk.uses_q_lookup
    proof = create_proof(params, pk, builder)
    assert verify_proof(params, pk.vk, proof)


def test_srs_roundtrip(tmp_path, params):
    path = str(tmp_path / "test.srs")
    params.write(path)
    loaded = ParamsKZG.read(path)
    assert loaded.k == params.k
    assert loaded.g[:10] == params.g[:10]
    assert loaded.g2 == params.g2 and loaded.s_g2 == params.s_g2
