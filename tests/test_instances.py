"""Instance (public input) columns end-to-end: mock, real prover, verifier.

Role parity: `BaseCircuitBuilder::assigned_instances` exposure and the
instance commitment/eval path of halo2-axiom create_proof/verify_proof
(/root/reference/halo2-base/src/gates/circuit/builder.rs:291-309,
assign_instances). Covers: instance equality constraints (sigma cycles over
the instance column), transcript absorption of instance values, barycentric
instance evals in the verifier, and rejection of mismatched instances.
"""

import pytest

from halo2_lib_tpu.backend.keygen import keygen
from halo2_lib_tpu.backend.kzg import gen_srs
from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.backend.prover import create_proof
from halo2_lib_tpu.backend.verifier import verify_proof
from halo2_lib_tpu.core.cells import Existing, Witness
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.gates.flex_gate import GateChip
from halo2_lib_tpu.utils.fields import FR_BN254

K = 9


def _build(xv: int, yv: int):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_instance_columns(1)
    gate = GateChip(FR_BN254)
    ctx = builder.main(0)
    x = ctx.load_witness(xv)
    y = ctx.load_witness(yv)
    z = gate.mul(ctx, Existing(x), Existing(y))
    builder.assigned_instances[0].extend([x, z])
    builder.calculate_params(minimum_rows=9)
    builder.config_params.num_advice_per_phase[0] = max(
        builder.config_params.num_advice_per_phase[0], 1
    )
    return builder, [xv, xv * yv % FR_BN254.p]


def test_mock_instances_match_and_reject():
    builder, inst = _build(7, 11)
    assert not MockProver.run(K, builder, [inst]).verify()
    bad = [inst[0], (inst[1] + 1) % FR_BN254.p]
    assert MockProver.run(K, builder, [bad]).verify(), (
        "wrong public input must produce a failure"
    )


def test_real_proof_instances_end_to_end():
    builder, inst = _build(1234567, 89)
    params = gen_srs(K)
    pk = keygen(params, builder)
    proof = create_proof(params, pk, builder)
    assert verify_proof(params, pk.vk, proof, [inst])
    bad = [inst[0], (inst[1] + 1) % FR_BN254.p]
    assert not verify_proof(params, pk.vk, proof, [bad]), (
        "proof must not verify against different public inputs"
    )
    # proving WITH the wrong instance values baked in must not yield a proof
    # that verifies against the honest instances. Our prover detects the
    # broken permutation identity up front (the quotient stops dividing by
    # Z_H, so the degree guard aborts); halo2 would emit an invalid proof.
    try:
        proof_bad = create_proof(params, pk, builder, instances=[bad])
    except AssertionError:
        return  # degree guard caught the inconsistent instance column
    assert not verify_proof(params, pk.vk, proof_bad, [inst])
