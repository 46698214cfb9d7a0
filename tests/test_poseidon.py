"""Poseidon hasher tests: in-circuit vs native host implementation.

Mirrors the reference's poseidon/hasher/tests/compatibility.rs (circuit vs
native pse-poseidon) and tests/hasher.rs (var-len vectors).
"""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.core.cells import Existing
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.gates.flex_gate import GateChip
from halo2_lib_tpu.poseidon.hasher import PoseidonHasher, PoseidonSponge
from halo2_lib_tpu.poseidon.primitives import PoseidonNative
from halo2_lib_tpu.poseidon.spec import default_spec
from halo2_lib_tpu.utils.fields import FR_BN254


def run_circuit(f, k=12, lookup_bits=None):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    if lookup_bits is not None:
        builder.set_lookup_bits(lookup_bits)
        chip = builder.range_chip()
    else:
        chip = GateChip(FR_BN254)
    res = f(builder.main(0), chip)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(k, builder).verify()
    assert not errors, "\n".join(errors[:5])
    return res


@pytest.mark.parametrize("n_inputs", [0, 1, 2, 3, 4, 5])
def test_fix_len_hash_matches_native(n_inputs):
    rng = random.Random(100 + n_inputs)
    inputs = [rng.randrange(FR_BN254.p) for _ in range(n_inputs)]
    native = PoseidonNative().hash_fixed(inputs)

    def f(ctx, gate):
        hasher = PoseidonHasher(default_spec())
        hasher.initialize_consts(ctx, gate)
        cells = [ctx.load_witness(v) for v in inputs]
        h = hasher.hash_fix_len_array(ctx, gate, cells)
        assert h.val() == native

    run_circuit(f)


def test_sponge_multiple_squeeze():
    rng = random.Random(200)
    a = [rng.randrange(FR_BN254.p) for _ in range(3)]
    b = [rng.randrange(FR_BN254.p) for _ in range(2)]

    def f(ctx, gate):
        sponge = PoseidonSponge(ctx, default_spec())
        sponge.update([ctx.load_witness(v) for v in a])
        h1 = sponge.squeeze(ctx, gate)
        sponge.update([ctx.load_witness(v) for v in b])
        h2 = sponge.squeeze(ctx, gate)
        assert h1.val() == PoseidonNative().hash_fixed(a)
        return (h1.val(), h2.val())

    run_circuit(f)


@pytest.mark.parametrize("max_len,length", [(5, 3), (4, 4), (6, 0), (2, 2)])
def test_var_len_hash_matches_native(max_len, length):
    rng = random.Random(300 + max_len * 10 + length)
    inputs = [rng.randrange(FR_BN254.p) for _ in range(max_len)]
    native = PoseidonNative().hash_fixed(inputs[:length])

    def f(ctx, range_chip):
        gate = range_chip.gate
        hasher = PoseidonHasher(default_spec())
        hasher.initialize_consts(ctx, gate)
        cells = [ctx.load_witness(v) for v in inputs]
        len_cell = ctx.load_witness(length)
        h = hasher.hash_var_len_array(ctx, range_chip, cells, len_cell)
        assert h.val() == native, f"var-len hash mismatch (len={length})"

    run_circuit(f, k=13, lookup_bits=12)


def test_empty_hash_cached():
    def f(ctx, gate):
        hasher = PoseidonHasher(default_spec())
        hasher.initialize_consts(ctx, gate)
        assert hasher._empty_hash.val() == PoseidonNative().hash_fixed([])

    run_circuit(f)
