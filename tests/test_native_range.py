"""The C emit_range_check must produce bit-identical circuits to Python.

The native emitter (native/halo2_native.c) replaces the whole multi-limb
range_check hot path (decompose + inner-product region + a == acc copy +
lookup rows). Any divergence in cell values, selector placement, lookup-row
order, or copy bookkeeping would silently change witness tables, so this
builds the same circuit both ways and compares the flattened artifacts.
"""

import random

import pytest

import halo2_lib_tpu.gates.range as range_mod
from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.core.cells import Constant, Existing
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.native import get_emitter
from halo2_lib_tpu.utils.fields import FR_BN254

K = 10


def _build(use_native: bool):
    orig = range_mod.get_emitter
    if not use_native:
        range_mod.get_emitter = lambda p: None
    try:
        rng = random.Random(7)
        builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
        builder.set_lookup_bits(8)
        rc = builder.range_chip()
        ctx = builder.main(0)
        for bits in (16, 24, 33, 64, 88, 130, 17):
            x = ctx.load_witness(rng.randrange(1 << bits))
            rc.range_check(ctx, x, bits)
        a = ctx.load_witness(1234)
        assert rc.is_less_than(ctx, Existing(a), Constant(2000), 16).val() == 1
        builder.calculate_params(minimum_rows=9)
        assert not MockProver.run(K, builder).verify()
        fp = builder.core.phase_manager[0].flatten_with_constraints(4, (1 << K) - 9)
        rows = [tuple(c.value for c in t) for t in builder.lookup_manager[0].iter_rows()]
        ncopies = len(builder.core.copy_manager.advice_equalities)
        return fp.columns, [list(map(bool, s)) for s in fp.selectors], rows, ncopies
    finally:
        range_mod.get_emitter = orig


@pytest.mark.skipif(
    get_emitter(FR_BN254.p) is None
    or not hasattr(get_emitter(FR_BN254.p).mod, "emit_range_check"),
    reason="native emitter unavailable",
)
def test_native_range_check_bit_identical():
    cols_n, sels_n, rows_n, ncp_n = _build(True)
    cols_p, sels_p, rows_p, ncp_p = _build(False)
    assert cols_n == cols_p
    assert sels_n == sels_p
    assert rows_n == rows_p
    assert ncp_n == ncp_p
