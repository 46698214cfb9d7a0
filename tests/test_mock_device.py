"""Device MockProver agrees with the host exact MockProver."""

import random

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.backend.mock_device import DeviceMockProver
from halo2_lib_tpu.core.cells import Constant, Existing
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage


def build(k=10, prank=False):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(8)
    rc = builder.range_chip()
    gate = rc.gate
    ctx = builder.main(0)
    rng = random.Random(61)
    xs = [ctx.load_witness(rng.randrange(1 << 32)) for _ in range(50)]
    acc = xs[0]
    for x in xs[1:]:
        acc = gate.mul_add(ctx, Existing(acc), Existing(x), Constant(5))
        rc.range_check(ctx, x, 40)
    y = gate.select(ctx, Existing(xs[0]), Existing(xs[1]), Existing(gate.is_zero(ctx, xs[2])))
    if prank:
        acc.debug_prank(ctx, 12345)
    builder.calculate_params(minimum_rows=9)
    return builder


def test_device_mock_agrees_positive():
    builder = build()
    circuit = builder.synthesize()
    host_errors = MockProver(circuit, None).verify()
    device_errors = DeviceMockProver(circuit).verify()
    assert not host_errors and not device_errors


def test_device_mock_agrees_negative():
    builder = build(prank=True)
    circuit = builder.synthesize()
    host_errors = MockProver(circuit, None).verify()
    device_errors = DeviceMockProver(circuit).verify()
    assert host_errors and device_errors
