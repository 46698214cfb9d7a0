"""Phase-0 witness/commit pipelining (backend/pipeline.py).

The pipelined prover overlaps witness generation with per-column flatten/
upload/commit; the resulting proof must be BYTE-IDENTICAL to the plain
create_proof (same blinding rng stream, same break-point replay, same
transcript)."""

import pytest

from halo2_lib_tpu.backend.keygen import keygen
from halo2_lib_tpu.backend.kzg import gen_srs
from halo2_lib_tpu.backend.pipeline import Phase0Pipeline, prove_pipelined
from halo2_lib_tpu.backend.prover import create_proof
from halo2_lib_tpu.backend.verifier import verify_proof
from halo2_lib_tpu.core.cells import Existing, Witness
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils.fields import FR_BN254
from halo2_lib_tpu.utils.pinning import pinning_of

K = 9


def _witness(b):
    rc = b.range_chip()
    gate = rc.gate
    ctx = b.main(0)
    x = ctx.load_witness(3)
    for i in range(150):
        x = gate.mul(ctx, Existing(x), Witness(i + 5))
        if i % 10 == 0:
            a = ctx.load_witness((i * 37) % (1 << 16))
            rc.range_check(ctx, a, 16)
    return b


@pytest.fixture(scope="module")
def setup():
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_lookup_bits(8)
    _witness(builder)
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    p.num_lookup_advice_per_phase[0] = max(p.num_lookup_advice_per_phase[0], 1)
    params = gen_srs(K)
    pk = keygen(params, builder)
    return params, pk, pinning_of(builder)


def test_pipelined_proof_matches_plain(setup):
    params, pk, pinning = setup
    if params._native_msm() is None:
        pytest.skip("native engine unavailable")
    assert pk.vk.num_advice_per_phase[0] >= 2, "want multiple columns"

    pb = pinning.prover_builder()
    _witness(pb)
    proof_plain = create_proof(params, pk, pb)

    pb2 = pinning.prover_builder()
    proof_piped = prove_pipelined(params, pk, pb2, _witness)
    assert proof_piped == proof_plain
    assert verify_proof(params, pk.vk, proof_piped)


def test_pipeline_column_replay_matches_flatten(setup):
    """The incremental break-point replay must produce exactly the columns
    flatten_witnesses produces (boundary-cell duplication included)."""
    params, pk, pinning = setup
    if params._native_msm() is None:
        pytest.skip("native engine unavailable")
    from halo2_lib_tpu.backend.prover import _blind, _flatten_prover_phase
    import random as _random

    from halo2_lib_tpu.backend.protocol import P, usable_row_count

    pb = pinning.prover_builder()
    pipe = Phase0Pipeline(params, pk, pb).run(_witness)

    pb2 = pinning.prover_builder()
    _witness(pb2)
    n = 1 << K
    u = usable_row_count(n)
    na0 = pk.vk.num_advice_per_phase[0]
    adv, _lk = _flatten_prover_phase(pb2, 0, na0, 0, u)
    rng = _random.Random(("create-proof-blinding", 0).__repr__())
    expect = [_blind(col, n, rng) for col in adv]
    assert pipe.advice_cols == expect