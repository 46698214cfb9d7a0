"""HALO2_PRECOMPILE warm-up (backend/precompile.py): the parallel warm of
shape-shared prover executables must run cleanly and leave the prover
producing the same proof (it only populates compile caches)."""

from halo2_lib_tpu.backend.keygen import keygen
from halo2_lib_tpu.backend.kzg import gen_srs
from halo2_lib_tpu.backend.precompile import maybe_warm, warm_prover
from halo2_lib_tpu.backend.prover import create_proof
from halo2_lib_tpu.backend.verifier import verify_proof
from halo2_lib_tpu.core.cells import Existing
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.gates.flex_gate import GateChip
from halo2_lib_tpu.utils.fields import FR_BN254

K = 8


def _builder():
    b = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    gate = GateChip(FR_BN254)
    ctx = b.main(0)
    x = ctx.load_witness(7)
    for _ in range(6):
        x = gate.mul(ctx, Existing(x), Existing(x))
    b.calculate_params(minimum_rows=9)
    b.config_params.num_advice_per_phase[0] = max(
        b.config_params.num_advice_per_phase[0], 2
    )
    return b


def test_warm_then_prove(monkeypatch):
    builder = _builder()
    params = gen_srs(K)
    pk = keygen(params, builder)
    circuit = builder.synthesize()
    proof_cold = create_proof(params, pk, circuit)
    ntasks = warm_prover(params, pk)
    assert ntasks >= 8
    proof_warm = create_proof(params, pk, circuit)
    assert proof_warm == proof_cold
    assert verify_proof(params, pk.vk, proof_warm)
    monkeypatch.delenv("HALO2_PRECOMPILE", raising=False)
    assert maybe_warm(params, pk) is False
    monkeypatch.setenv("HALO2_PRECOMPILE", "1")
    assert maybe_warm(params, pk) is True
