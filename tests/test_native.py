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
