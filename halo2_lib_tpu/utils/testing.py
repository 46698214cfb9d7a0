"""Test harness: the `base_test()` builder pattern.

Mirrors halo2-base/src/utils/testing.rs:105-247 — run a closure against a
fresh circuit builder and check it with MockProver (and later the real prover
via `bench_builder`).
"""

from __future__ import annotations

from ..backend.mock import MockProver
from ..gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from ..utils.fields import FR_BN254, PrimeField


class BaseTester:
    def __init__(self):
        self.k = 10
        self.lookup_bits: int | None = None
        self.expect_satisfied = True
        self.num_instance_columns = 0
        self.field: PrimeField = FR_BN254

    def use_k(self, k: int) -> "BaseTester":
        self.k = k
        return self

    def use_lookup_bits(self, lookup_bits: int) -> "BaseTester":
        self.lookup_bits = lookup_bits
        return self

    def use_field(self, field: PrimeField) -> "BaseTester":
        self.field = field
        return self

    def expect(self, satisfied: bool) -> "BaseTester":
        self.expect_satisfied = satisfied
        return self

    def run(self, f):
        """f(ctx, range_chip) -> optional result; mock-proves the circuit."""
        return self.run_builder(lambda pool, range_chip: f(pool.main(), range_chip))

    def run_gate(self, f):
        """f(ctx, gate_chip) -> optional result."""
        from ..gates.flex_gate import GateChip

        gate = GateChip(self.field)
        return self.run_builder(lambda pool, _range: f(pool.main(), gate))

    def run_builder(self, f):
        builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK, self.field).use_k(self.k)
        if self.lookup_bits is not None:
            builder.set_lookup_bits(self.lookup_bits)
        builder.set_instance_columns(self.num_instance_columns)
        range_chip = builder.range_chip() if self.lookup_bits is not None else None
        res = f(builder.pool(0), range_chip)

        builder.calculate_params(minimum_rows=9)
        mock = MockProver.run(self.k, builder)
        errors = mock.verify()
        if self.expect_satisfied:
            assert not errors, "circuit not satisfied:\n" + "\n".join(errors[:8])
        else:
            assert errors, "expected circuit to fail but it was satisfied"
        return res


def base_test() -> BaseTester:
    return BaseTester()
