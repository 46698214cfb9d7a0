"""RangeChip tests: positive + negative, mirroring gates/tests/range.rs."""

import random

from halo2_lib_tpu.core.cells import Constant, Existing, Witness
from halo2_lib_tpu.utils.fields import FR_BN254 as F
from halo2_lib_tpu.utils.testing import base_test

rng = random.Random(7)


def test_range_check_pass():
    def f(ctx, range_chip):
        a = ctx.load_witness((1 << 16) - 1)
        range_chip.range_check(ctx, a, 16)

    base_test().use_lookup_bits(8).run(f)


def test_range_check_non_multiple_bits():
    def f(ctx, range_chip):
        a = ctx.load_witness((1 << 13) - 1)
        range_chip.range_check(ctx, a, 13)

    base_test().use_lookup_bits(8).run(f)


def test_range_check_fail():
    def f(ctx, range_chip):
        a = ctx.load_witness(1 << 16)
        range_chip.range_check(ctx, a, 16)

    base_test().use_lookup_bits(8).expect(False).run(f)


def test_range_check_fail_tight():
    # 2^13 fails a 13-bit check even though it fits in 2 8-bit limbs
    def f(ctx, range_chip):
        a = ctx.load_witness(1 << 13)
        range_chip.range_check(ctx, a, 13)

    base_test().use_lookup_bits(8).expect(False).run(f)


def test_check_less_than():
    def f(ctx, range_chip):
        a, b = ctx.load_witness(100), ctx.load_witness(101)
        range_chip.check_less_than(ctx, Existing(a), Existing(b), 8)

    base_test().use_lookup_bits(8).run(f)

    def f_bad(ctx, range_chip):
        a, b = ctx.load_witness(101), ctx.load_witness(100)
        range_chip.check_less_than(ctx, Existing(a), Existing(b), 8)

    base_test().use_lookup_bits(8).expect(False).run(f_bad)


def test_check_less_than_safe():
    def f(ctx, range_chip):
        a = ctx.load_witness(50)
        range_chip.check_less_than_safe(ctx, a, 100)

    base_test().use_lookup_bits(8).run(f)

    def f_bad(ctx, range_chip):
        a = ctx.load_witness(100)
        range_chip.check_less_than_safe(ctx, a, 100)

    base_test().use_lookup_bits(8).expect(False).run(f_bad)


def test_is_less_than():
    cases = [(5, 10, 1), (10, 5, 0), (7, 7, 0), (0, 1, 1), (255, 255, 0)]
    for a, b, want in cases:
        out = base_test().use_lookup_bits(4).run(
            lambda ctx, rc: rc.is_less_than(ctx, Witness(a), Witness(b), 8)
        )
        assert out.val() == want, (a, b, want)


def test_is_less_than_safe():
    out = base_test().use_lookup_bits(4).run(
        lambda ctx, rc: rc.is_less_than_safe(ctx, ctx.load_witness(10), 16)
    )
    assert out.val() == 1


def test_div_mod():
    a, b = 1234567, 91
    def f(ctx, rc):
        d, r = rc.div_mod(ctx, Witness(a), b, 32)
        return d.val(), r.val()

    got = base_test().use_lookup_bits(8).run(f)
    assert got == (a // b, a % b)


def test_div_mod_var():
    a, b = 987654321, 12345
    def f(ctx, rc):
        d, r = rc.div_mod_var(ctx, Witness(a), Witness(b), 32, 16)
        return d.val(), r.val()

    got = base_test().use_lookup_bits(8).run(f)
    assert got == (a // b, a % b)


def test_get_last_bit():
    for x in (6, 7, 0, 255):
        out = base_test().use_lookup_bits(4).run(
            lambda ctx, rc: rc.get_last_bit(ctx, ctx.load_witness(x), 8)
        )
        assert out.val() == (x & 1)


def test_range_check_random_sweep():
    for _ in range(20):
        bits = rng.randrange(1, 64)
        x = rng.randrange(1 << bits)

        def f(ctx, rc, x=x, bits=bits):
            rc.range_check(ctx, ctx.load_witness(x), bits)

        base_test().use_lookup_bits(8).run(f)
