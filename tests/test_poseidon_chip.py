"""PoseidonChip over SafeType byte containers.

Mirrors the reference's byte-oriented Poseidon chip layer
(`halo2-base/src/poseidon/mod.rs:15-114`) the way
`poseidon/hasher/tests/compatibility.rs:14-110` exercises the hashers:
in-circuit hashes must equal the host-native Poseidon of the same inputs,
for fixed- and variable-length byte arrays, and the circuit must be
satisfied (SafeByte range checks included).
"""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.poseidon import PoseidonChip
from halo2_lib_tpu.poseidon.primitives import PoseidonNative
from halo2_lib_tpu.poseidon.spec import default_spec
from halo2_lib_tpu.safe_types import SafeTypeChip


def run_circuit(f, k=12):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(8)
    range_chip = builder.range_chip()
    res = f(builder.main(0), range_chip)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(k, builder).verify()
    assert not errors, "\n".join(errors[:5])
    return res


@pytest.mark.parametrize("n_bytes", [0, 1, 5, 31])
def test_hash_fix_len_bytes_matches_native(n_bytes):
    rng = random.Random(7 + n_bytes)
    data = [rng.randrange(256) for _ in range(n_bytes)]
    native = PoseidonNative().hash_fixed(data)

    def f(ctx, range_chip):
        chip = PoseidonChip(ctx, default_spec(), range_chip)
        safe = SafeTypeChip(range_chip)
        cells = [ctx.load_witness(b) for b in data]
        fx = safe.raw_to_fix_len_bytes(ctx, cells)
        h = chip.hash_fix_len_bytes(ctx, fx)
        assert h.val() == native
        return h

    run_circuit(f)


@pytest.mark.parametrize("max_len,length", [(8, 0), (8, 3), (8, 8), (17, 5)])
def test_hash_var_len_bytes_matches_native(max_len, length):
    rng = random.Random(11 + max_len + length)
    data = [rng.randrange(256) for _ in range(length)] + [0] * (max_len - length)
    native = PoseidonNative().hash_fixed(data[:length])

    def f(ctx, range_chip):
        chip = PoseidonChip(ctx, default_spec(), range_chip)
        safe = SafeTypeChip(range_chip)
        cells = [ctx.load_witness(b) for b in data]
        len_cell = ctx.load_witness(length)
        vb = safe.raw_to_var_len_bytes(ctx, cells, len_cell)
        h = chip.hash_var_len_bytes(ctx, vb)
        assert h.val() == native, f"var-len chip hash mismatch (len={length})"
        # the Vec variant is the same runtime shape
        vbv = safe.raw_to_var_len_bytes_vec(ctx, cells, len_cell, max_len)
        h2 = chip.hash_var_len_bytes_vec(ctx, vbv)
        assert h2.val() == native
        return h

    run_circuit(f)


def test_hash_fix_len_bytes_bad_byte_rejected():
    """A value >= 256 must fail the SafeByte range check in the mock."""

    def f(ctx, range_chip):
        chip = PoseidonChip(ctx, default_spec(), range_chip)
        safe = SafeTypeChip(range_chip)
        cells = [ctx.load_witness(300)]
        fx = safe.raw_to_fix_len_bytes(ctx, cells)
        chip.hash_fix_len_bytes(ctx, fx)

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(12)
    builder.set_lookup_bits(8)
    range_chip = builder.range_chip()
    f(builder.main(0), range_chip)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(12, builder).verify()
    assert errors, "expected the out-of-range byte to fail"
