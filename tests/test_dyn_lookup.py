"""RAM-out-of-lookups integration test.

Mirrors halo2-base/src/virtual_region/tests/lookups/memory.rs: a memory table
of (index, value) pairs; reads constrained via the dynamic lookup.
"""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.core.dyn_lookup import BasicDynLookupManager
from halo2_lib_tpu.core.cells import Existing
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage


def build_ram_circuit(tamper=False, k=10):
    rng = random.Random(81)
    memory = [rng.randrange(1 << 64) for _ in range(64)]
    reads = [rng.randrange(64) for _ in range(32)]

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    mgr = BasicDynLookupManager(key_col=2)
    builder.dyn_lookup_manager = mgr
    ctx = builder.main(0)

    # assign the RAM table
    for idx, val in enumerate(memory):
        idx_c = ctx.load_witness(idx)
        val_c = ctx.load_witness(val)
        mgr.sets[0].add_table_row((idx_c, val_c))

    # reads: witness (index, claimed value), constrained by lookup
    outputs = []
    for r in reads:
        claimed = memory[r] + (1 if tamper else 0)
        idx_c = ctx.load_witness(r)
        val_c = ctx.load_witness(claimed)
        mgr.sets[0].add_lookup((idx_c, val_c))
        outputs.append(val_c)
    builder.calculate_params(minimum_rows=9)
    return builder


def test_ram_reads_ok():
    builder = build_ram_circuit()
    assert not MockProver.run(10, builder).verify()


def test_ram_bad_read_fails():
    builder = build_ram_circuit(tamper=True)
    errors = MockProver.run(10, builder).verify()
    assert errors and "dyn lookup" in errors[0]


def test_ram_real_prover_roundtrip():
    """RAM circuit through keygen + create_proof + verify_proof — the real
    dynamic-lookup argument (theta-compressed multi-column halo2 lookup),
    mirroring the reference RAMCircuit test through the real prover
    (virtual_region/tests/lookups/memory.rs)."""
    from halo2_lib_tpu.backend.keygen import keygen
    from halo2_lib_tpu.backend.kzg import gen_srs
    from halo2_lib_tpu.backend.prover import create_proof
    from halo2_lib_tpu.backend.verifier import verify_proof

    k = 9
    builder = build_ram_circuit(k=k)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    params = gen_srs(k)
    pk = keygen(params, builder)
    assert pk.vk.dyn_key_cols == [2]
    proof = create_proof(params, pk, builder.synthesize())
    assert verify_proof(params, pk.vk, proof)


def test_ram_real_prover_tamper_fails():
    """A tampered read must make proving fail (the compressed key is not in
    the compressed table, so permute_expression_pair cannot align them)."""
    from halo2_lib_tpu.backend.keygen import keygen
    from halo2_lib_tpu.backend.kzg import gen_srs
    from halo2_lib_tpu.backend.prover import create_proof

    k = 9
    builder = build_ram_circuit(tamper=True, k=k)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    params = gen_srs(k)
    pk = keygen(params, builder)
    with pytest.raises((ValueError, AssertionError)):
        create_proof(params, pk, builder.synthesize())
