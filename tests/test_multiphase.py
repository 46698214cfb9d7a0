"""Multi-phase challenge support: RLC circuit across two phases.

The reference exposes FirstPhase/SecondPhase/ThirdPhase advice columns
(halo2-base flex_gate/mod.rs:63-67); phase challenges are squeezed by the
external halo2-axiom create_proof between per-phase advice commitments and
later-phase witnesses may depend on them (RLC gadgets). Here the backend
itself squeezes the challenges (backend/prover.py phase loop) and pins
challenge witnesses with q_chal * (a - challenge) = 0
(gates/circuit.py::constrain_challenge).
"""

import pytest

from halo2_lib_tpu.backend.challenges import mock_challenge
from halo2_lib_tpu.backend.keygen import keygen
from halo2_lib_tpu.backend.kzg import gen_srs
from halo2_lib_tpu.backend.mock import MockProver, VerifyFailure
from halo2_lib_tpu.backend.prover import create_proof
from halo2_lib_tpu.backend.verifier import VerificationError, verify_proof
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.gates.flex_gate import GateChip
from halo2_lib_tpu.utils.fields import FR_BN254

K = 9
VALS = [3, 1415926, 535897, 93238462]


def _rlc_phase1(builder, gate, vals_assigned, challenge_value):
    """Phase-1 witnesses: pin the challenge, fold vals with Horner."""
    ctx1 = builder.main(1)
    ch = ctx1.load_witness(challenge_value)
    builder.constrain_challenge(ch, 0)
    acc = vals_assigned[0]
    for v in vals_assigned[1:]:
        # acc * ch + v  (gate.mul_add layout)
        acc = gate.mul_add(ctx1, acc, ch, v)
    return acc


def _rlc_expected(vals, ch):
    p = FR_BN254.p
    acc = vals[0]
    for v in vals[1:]:
        acc = (acc * ch + v) % p
    return acc


def _build(stage: CircuitBuilderStage, challenge_value=None):
    builder = BaseCircuitBuilder.from_stage(stage).use_k(K)
    gate = GateChip(FR_BN254)
    ctx0 = builder.main(0)
    vs = [ctx0.load_witness(v) for v in VALS]
    if challenge_value is not None:
        _rlc_phase1(builder, gate, vs, challenge_value)
    return builder, gate, vs


def test_rlc_mock():
    builder, gate, vs = _build(CircuitBuilderStage.MOCK, mock_challenge(0))
    builder.calculate_params(minimum_rows=9)
    MockProver.run(K, builder).assert_satisfied()


def test_rlc_mock_wrong_challenge_fails():
    builder, gate, vs = _build(CircuitBuilderStage.MOCK, mock_challenge(0) + 1)
    builder.calculate_params(minimum_rows=9)
    with pytest.raises(VerifyFailure, match="challenge pin"):
        MockProver.run(K, builder).assert_satisfied()


def _keygen():
    builder, gate, vs = _build(CircuitBuilderStage.MOCK, mock_challenge(0))
    builder.calculate_params(minimum_rows=9)
    params = gen_srs(K)
    pk = keygen(params, builder)
    return params, pk, builder.break_points()


def test_rlc_prove_verify_roundtrip():
    params, pk, bps = _keygen()
    assert len(pk.vk.num_advice_per_phase) == 2
    assert pk.vk.challenge_pins, "challenge pin missing from vk"
    # halo2 Challenge API shape: the pin is structural — no committed
    # q_chal fixed column exists anywhere in the vk
    assert not hasattr(pk.vk, "chal_q_commitments")
    assert all(len(pin) == 3 for pin in pk.vk.challenge_pins)

    pb = BaseCircuitBuilder.prover(pk.config_params, bps)
    gate = GateChip(FR_BN254)
    ctx0 = pb.main(0)
    vs = [ctx0.load_witness(v) for v in VALS]
    seen = {}

    def phase1(b, chals):
        seen["ch"] = chals[0]
        acc = _rlc_phase1(b, gate, vs, chals[0])
        assert acc.val() == _rlc_expected(VALS, chals[0])

    proof = create_proof(params, pk, pb, phase_fns={1: phase1})
    assert seen["ch"] != mock_challenge(0), "real challenge should differ from mock"
    assert verify_proof(params, pk.vk, proof)


def test_rlc_prove_wrong_challenge_fails():
    params, pk, bps = _keygen()
    pb = BaseCircuitBuilder.prover(pk.config_params, bps)
    gate = GateChip(FR_BN254)
    ctx0 = pb.main(0)
    vs = [ctx0.load_witness(v) for v in VALS]

    def phase1(b, chals):
        # adversarial prover uses a challenge value of its choosing
        _rlc_phase1(b, gate, vs, (chals[0] + 1) % FR_BN254.p)

    try:
        proof = create_proof(params, pk, pb, phase_fns={1: phase1})
    except AssertionError:
        return  # prover-side challenge-pin check caught it -> fine
    assert not verify_proof(params, pk.vk, proof)
