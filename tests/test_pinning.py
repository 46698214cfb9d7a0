"""Pinning round-trip: prover-mode builder replays the keygen layout exactly."""

import random

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.core.cells import Constant, Existing
from halo2_lib_tpu.utils.pinning import Pinning, pinning_of


def witness_logic(builder, x_val):
    rc = builder.range_chip()
    gate = rc.gate
    ctx = builder.main(0)
    x = ctx.load_witness(x_val)
    acc = x
    for _ in range(200):
        acc = gate.mul_add(ctx, Existing(acc), Existing(x), Constant(3))
    rc.range_check(ctx, x, 64)
    return acc


def test_pinning_roundtrip(tmp_path):
    from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage

    k = 9
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(8)
    witness_logic(builder, 7)
    builder.calculate_params(minimum_rows=9)
    mock_circuit = builder.synthesize()
    assert not MockProver(mock_circuit, None).verify()

    pin = pinning_of(builder)
    path = str(tmp_path / "pinning.json")
    pin.write(path)
    pin2 = Pinning.read(path)
    assert pin2.params.to_json() == pin.params.to_json()
    assert pin2.break_points == pin.break_points

    # prover-mode builder with same witnesses must produce identical columns
    prover_builder = pin2.prover_builder()
    witness_logic(prover_builder, 7)
    prover_circuit = prover_builder.synthesize()
    assert prover_circuit.witness_gen_only
    mock_cols = mock_circuit.phases[0].columns
    prover_cols = prover_circuit.phases[0].columns
    assert len(mock_cols) == len(prover_cols)
    for mc, pc in zip(mock_cols, prover_cols):
        assert mc == pc, "prover replay diverged from keygen layout"
