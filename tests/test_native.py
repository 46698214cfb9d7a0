"""Native C extension tests: bulk field ops + gate column check vs Python."""

import random

import pytest

from halo2_lib_tpu.native import NativeField, get_native
from halo2_lib_tpu.utils.fields import FR_BN254

P = FR_BN254.p


@pytest.fixture(scope="module")
def nf():
    f = NativeField(P)
    if not f.available:
        pytest.skip("no C compiler / native module unavailable")
    return f


def test_modmul_vec(nf):
    rng = random.Random(1)
    a = [rng.randrange(P) for _ in range(257)]
    b = [rng.randrange(P) for _ in range(257)]
    assert nf.modmul(a, b) == [x * y % P for x, y in zip(a, b)]
    assert nf.modadd(a, b) == [(x + y) % P for x, y in zip(a, b)]
    assert nf.modsub(a, b) == [(x - y) % P for x, y in zip(a, b)]


def test_gate_column_check(nf):
    rng = random.Random(2)
    n = 500
    vals = [rng.randrange(P) for _ in range(n)]
    sels = [False] * n
    # satisfy some gates
    for r in (3, 100, 400):
        vals[r + 3] = (vals[r] + vals[r + 1] * vals[r + 2]) % P
        sels[r] = True
    assert nf.check_gate_column(vals, sels) == -1
    # break one
    vals[103] = (vals[103] + 1) % P
    assert nf.check_gate_column(vals, sels) == 100


def test_mock_prover_uses_native():
    """MockProver verdicts identical with and without the native path."""
    import halo2_lib_tpu.backend.mock as mock_mod
    from halo2_lib_tpu.backend.mock import MockProver
    from halo2_lib_tpu.core.cells import Existing, Witness
    from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
    from halo2_lib_tpu.gates.flex_gate import GateChip

    def build(prank):
        b = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(8)
        gate = GateChip(FR_BN254)
        ctx = b.main(0)
        x = ctx.load_witness(7)
        y = gate.mul(ctx, Existing(x), Existing(x))
        if prank:
            y.debug_prank(ctx, 5)
        b.calculate_params(minimum_rows=9)
        return b

    assert not MockProver.run(8, build(False)).verify()
    assert MockProver.run(8, build(True)).verify()


# ---- witness-engine emitters (emit_region / emit_inner_product) ----------


def _build_mixed_trace(native: bool, wg: bool):
    """A trace exercising every QCell kind, b0==1 and general inner products,
    negative gate offsets (assign_region_smart), and fractions."""
    import halo2_lib_tpu.core.context as cctx
    import halo2_lib_tpu.native as natmod
    from halo2_lib_tpu.core.cells import (
        Constant,
        Existing,
        Witness,
        WitnessFraction,
    )
    from halo2_lib_tpu.gates.circuit import (
        BaseCircuitBuilder,
        BaseCircuitParams,
        CircuitBuilderStage,
    )
    from halo2_lib_tpu.gates.flex_gate import GateChip

    # force native on/off for this build
    saved = (natmod._REGION_MOD, cctx._REGION, dict(natmod._EMITTERS))
    natmod._REGION_MOD = False if native else None
    cctx._REGION = False if native else None
    if not native:
        natmod._EMITTERS.clear()
        natmod._EMITTERS[P] = None
    try:
        if wg:
            params = BaseCircuitParams(
                k=9,
                num_advice_per_phase=[1],
                num_fixed=1,
                num_lookup_advice_per_phase=[0],
                lookup_bits=None,
                num_instance_columns=0,
            )
            b = BaseCircuitBuilder.prover(params, [[]])
        else:
            b = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(9)
        g = GateChip(FR_BN254)
        if not native:
            g._nat = None
        ctx = b.main(0)
        rng = random.Random(99)
        w = [ctx.load_witness(rng.randrange(P)) for _ in range(6)]
        g.inner_product(
            ctx,
            [Existing(w[0]), Witness(123), Constant(5), Existing(w[1])],
            [Constant(1), Existing(w[2]), Witness(77), Constant(9)],
        )
        g.inner_product(
            ctx,
            [Witness(rng.randrange(P)) for _ in range(5)],
            [Existing(w[3])] + [Constant(rng.randrange(P)) for _ in range(4)],
        )
        g.mul(ctx, w[4], w[5])
        # fractions flow through untouched
        ctx.assign_region([WitnessFraction(3, 7), Constant(0), Constant(0), Witness(0)], [])
        # negative gate offsets via assign_region_smart
        ctx.assign_region_smart(
            [Witness(1), Witness(2)], [-2], [(0, -3)], [(w[0].cell, -1)] if not wg else []
        )
        return b, ctx
    finally:
        natmod._REGION_MOD, cctx._REGION = saved[0], saved[1]
        natmod._EMITTERS.clear()
        natmod._EMITTERS.update(saved[2])


@pytest.mark.parametrize("wg", [False, True])
def test_emitters_match_pure_python(wg):
    if get_native() is None:
        pytest.skip("native module unavailable")
    bn, cn = _build_mixed_trace(True, wg)
    bp, cp = _build_mixed_trace(False, wg)
    assert cn.advice == cp.advice
    assert cn.selector == cp.selector
    if not wg:
        cmn, cmp_ = bn.core.copy_manager, bp.core.copy_manager
        assert cmn.advice_equalities == cmp_.advice_equalities
        assert cmn.constant_equalities == cmp_.constant_equalities
        from halo2_lib_tpu.core.cells import ContextCell

        for l, r in cmn.advice_equalities:
            assert type(l) is ContextCell and type(r) is ContextCell


def test_native_msm_commit_matches_host():
    """The threaded C Pippenger (11-bit windows, tail-safe digit
    extraction) against the exact host MSM, including an identity column."""
    import random

    import numpy as np

    from halo2_lib_tpu.backend.kzg import ParamsKZG
    from halo2_lib_tpu.utils.curves import BN254_G1

    params = ParamsKZG.setup(6, seed=7)
    if params._native_msm() is None:
        import pytest

        pytest.skip("native module unavailable")
    rng = random.Random(5)
    cols = [[rng.randrange(BN254_G1.scalar.p) for _ in range(64)] for _ in range(3)]
    cols.append([0] * 64)  # identity commitment
    out = params.commit_host_ints(cols, True)
    for ci, col in enumerate(cols):
        want = BN254_G1.msm(params.g_lagrange[:64], col)
        row = out[ci]
        got = None if row[32] else (
            sum(int(row[j]) << (16 * j) for j in range(16)),
            sum(int(row[16 + j]) << (16 * j) for j in range(16)),
        )
        assert got == want
