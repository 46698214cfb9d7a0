"""SafeType tests (reference: halo2-base/src/safe_types/tests)."""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.safe_types import SafeTypeChip


def run(f, expect_ok=True, k=11, lookup_bits=10):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(lookup_bits)
    rc = builder.range_chip()
    chip = SafeTypeChip(rc)
    res = f(builder.main(0), chip, rc.gate)
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(k, builder).verify()
    if expect_ok:
        assert not errors, "\n".join(errors[:5])
    else:
        assert errors
    return res


def test_safe_bool_byte():
    def f(ctx, chip, gate):
        b = chip.load_bool(ctx, True)
        assert b.value.val() == 1
        by = chip.load_byte(ctx, 200)
        assert by.value.val() == 200

    run(f)


def test_bad_byte_fails():
    def f(ctx, chip, gate):
        cell = ctx.load_witness(300)
        chip.assert_byte(ctx, cell)

    run(f, expect_ok=False)


def test_bad_bool_fails():
    def f(ctx, chip, gate):
        cell = ctx.load_witness(2)
        chip.assert_bool(ctx, cell)

    run(f, expect_ok=False)


def test_raw_bytes_to_bytes32():
    rng = random.Random(51)
    raw = [rng.randrange(256) for _ in range(32)]

    def f(ctx, chip, gate):
        cells = [ctx.load_witness(v) for v in raw]
        st = chip.raw_bytes_to(ctx, cells, 1, 256)
        assert [c.val() for c in st.values] == raw

    run(f)


def test_raw_bytes_packing():
    """BYTES_PER_ELE=8 packs 8 bytes per element little-endian."""
    rng = random.Random(52)
    raw = [rng.randrange(256) for _ in range(16)]

    def f(ctx, chip, gate):
        cells = [ctx.load_witness(v) for v in raw]
        st = chip.raw_bytes_to(ctx, cells, 8, 128)
        expected = [
            sum(raw[i + j] << (8 * j) for j in range(8)) for i in (0, 8)
        ]
        assert [c.val() for c in st.values] == expected

    run(f)


def test_var_len_bytes_left_pad():
    def f(ctx, chip, gate):
        data = [5, 6, 7, 0, 0]  # len 3, max 5
        cells = [ctx.load_witness(v) for v in data]
        length = ctx.load_witness(3)
        vb = chip.raw_to_var_len_bytes(ctx, cells, length)
        fixed = vb.left_pad_to_fixed(ctx, gate)
        assert [b.value.val() for b in fixed.bytes] == [0, 0, 5, 6, 7]

    run(f)


def test_ensure_0_padding():
    def f(ctx, chip, gate):
        data = [5, 6, 7, 99, 88]  # junk beyond len 3
        cells = [ctx.load_witness(v) for v in data]
        length = ctx.load_witness(3)
        vb = chip.raw_to_var_len_bytes(ctx, cells, length)
        clean = vb.ensure_0_padding(ctx, gate)
        assert [b.value.val() for b in clean.bytes] == [5, 6, 7, 0, 0]

    run(f)
