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


    def bench_builder(self, init_input, logic_input, f):
        """keygen with init_input, then prove+verify with logic_input.

        Port of BaseTester::bench_builder (utils/testing.rs:198-247): keygen
        builder + calculate_params + SRS, pinned prover builder re-runs the
        witness closure, create_proof, check_proof. Returns proof bytes.
        """
        from ..backend.keygen import keygen
        from ..backend.kzg import gen_srs
        from ..backend.prover import create_proof
        from ..backend.verifier import verify_proof
        from ..utils.pinning import pinning_of

        builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK, self.field).use_k(self.k)
        if self.lookup_bits is not None:
            builder.set_lookup_bits(self.lookup_bits)
        range_chip = builder.range_chip() if self.lookup_bits is not None else None
        f(builder.pool(0), range_chip, init_input)
        builder.calculate_params(minimum_rows=9)
        # the real prover needs dedicated lookup columns (no q_lookup path)
        p = builder.config_params
        if p.num_advice_per_phase:
            p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
        if self.lookup_bits is not None and p.num_lookup_advice_per_phase:
            p.num_lookup_advice_per_phase[0] = max(p.num_lookup_advice_per_phase[0], 1)
        params = gen_srs(self.k)
        circuit = builder.synthesize()
        pk = keygen(params, builder, circuit)
        pinning = pinning_of(builder)

        prover_builder = pinning.prover_builder(self.field)
        prover_range = (
            prover_builder.range_chip() if self.lookup_bits is not None else None
        )
        f(prover_builder.pool(0), prover_range, logic_input)
        proof = create_proof(params, pk, prover_builder)
        assert verify_proof(params, pk.vk, proof), "proof verification failed"
        return proof


def gen_proof(params, pk, builder_or_circuit, instances=None) -> bytes:
    """Prove with a seeded transcript (utils/testing.rs:54-60)."""
    from ..backend.prover import create_proof

    return create_proof(params, pk, builder_or_circuit, instances)


def check_proof(params, vk, proof: bytes, instances=None, expect_satisfied: bool = True) -> None:
    """Verify and assert the expected outcome (utils/testing.rs:64-88)."""
    from ..backend.verifier import VerificationError, verify_proof

    try:
        ok = verify_proof(params, vk, proof, instances)
    except (VerificationError, ValueError):
        ok = False
    assert ok == expect_satisfied, (
        "proof verified but expected failure" if ok else "proof failed verification"
    )


def base_test() -> BaseTester:
    return BaseTester()
