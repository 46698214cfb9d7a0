"""BaseTester.bench_builder: the reference's keygen+prove+verify test path."""

from halo2_lib_tpu.core.cells import Constant, Existing
from halo2_lib_tpu.utils.testing import base_test


def test_bench_builder_roundtrip():
    def f(pool, range_chip, x_val):
        gate = range_chip.gate
        ctx = pool.main()
        x = ctx.load_witness(x_val)
        acc = x
        for _ in range(50):
            acc = gate.mul_add(ctx, Existing(acc), Existing(x), Constant(7))
        range_chip.range_check(ctx, x, 32)

    proof = base_test().use_k(9).use_lookup_bits(8).bench_builder(123, 456, f)
    assert isinstance(proof, bytes) and len(proof) > 0
