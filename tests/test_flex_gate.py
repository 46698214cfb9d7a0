"""GateChip op tests: in-circuit output vs ground truth.

Mirrors halo2-base/src/gates/tests/flex_gate.rs table tests and the negative
prop tests (witness pranking → MockProver failure).
"""

import random

import pytest

from halo2_lib_tpu.core.cells import Constant, Existing, Witness
from halo2_lib_tpu.utils.fields import FR_BN254 as F
from halo2_lib_tpu.utils.testing import base_test

rng = random.Random(42)


def rand():
    return rng.randrange(F.p)


def test_add():
    a, b = rand(), rand()
    out = base_test().run_gate(lambda ctx, gate: gate.add(ctx, Witness(a), Witness(b)))
    assert out.val() == F.add(a, b)


def test_sub():
    a, b = rand(), rand()
    out = base_test().run_gate(lambda ctx, gate: gate.sub(ctx, Witness(a), Witness(b)))
    assert out.val() == F.sub(a, b)


def test_sub_mul():
    a, b, c = rand(), rand(), rand()
    out = base_test().run_gate(lambda ctx, gate: gate.sub_mul(ctx, Witness(a), Witness(b), Witness(c)))
    assert out.val() == F.sub(a, F.mul(b, c))


def test_neg():
    a = rand()
    out = base_test().run_gate(lambda ctx, gate: gate.neg(ctx, Witness(a)))
    assert out.val() == F.neg(a)


def test_mul():
    a, b = rand(), rand()
    out = base_test().run_gate(lambda ctx, gate: gate.mul(ctx, Witness(a), Witness(b)))
    assert out.val() == F.mul(a, b)


def test_mul_add():
    a, b, c = rand(), rand(), rand()
    out = base_test().run_gate(lambda ctx, gate: gate.mul_add(ctx, Witness(a), Witness(b), Witness(c)))
    assert out.val() == F.add(F.mul(a, b), c)


def test_mul_not():
    b = rand()
    for a in (0, 1):
        out = base_test().run_gate(lambda ctx, gate: gate.mul_not(ctx, Witness(a), Witness(b)))
        assert out.val() == F.mul(1 - a, b)


def test_div_unsafe():
    a, b = rand(), rng.randrange(1, F.p)
    out = base_test().run_gate(lambda ctx, gate: gate.div_unsafe(ctx, Witness(a), Witness(b)))
    assert out.val() == F.div(a, b)


def test_assert_bit_pass_and_fail():
    def f_ok(ctx, gate):
        x = ctx.load_witness(1)
        gate.assert_bit(ctx, x)

    base_test().run_gate(f_ok)

    def f_bad(ctx, gate):
        x = ctx.load_witness(2)
        gate.assert_bit(ctx, x)

    base_test().expect(False).run_gate(f_bad)


def test_inner_product():
    n = 7
    a = [rand() for _ in range(n)]
    b = [rand() for _ in range(n)]
    want = sum(x * y for x, y in zip(a, b)) % F.p
    out = base_test().run_gate(
        lambda ctx, gate: gate.inner_product(ctx, [Witness(x) for x in a], [Witness(y) for y in b])
    )
    assert out.val() == want
    # b starting with Constant(1): triggers the 3-cell optimization
    b2 = [Constant(1)] + [Witness(y) for y in b[1:]]
    want2 = (a[0] + sum(x * y for x, y in zip(a[1:], b[1:]))) % F.p
    out2 = base_test().run_gate(
        lambda ctx, gate: gate.inner_product(ctx, [Witness(x) for x in a], b2)
    )
    assert out2.val() == want2


def test_inner_product_left_last():
    n = 5
    a = [rand() for _ in range(n)]
    b = [rand() for _ in range(n)]
    want = sum(x * y for x, y in zip(a, b)) % F.p

    def f(ctx, gate):
        ip, last = gate.inner_product_left_last(
            ctx, [Witness(x) for x in a], [Witness(y) for y in b]
        )
        assert last.val() == a[-1]
        return ip

    out = base_test().run_gate(f)
    assert out.val() == want


def test_inner_product_with_sums():
    n = 4
    a = [rand() for _ in range(n)]
    b = [rand() for _ in range(n)]

    def f(ctx, gate):
        sums = gate.inner_product_with_sums(ctx, [Witness(x) for x in a], [Witness(y) for y in b])
        return [s.val() for s in sums]

    got = base_test().run_gate(f)
    acc, want = 0, []
    for x, y in zip(a, b):
        acc = (acc + x * y) % F.p
        want.append(acc)
    assert got == want


def test_sum_and_partial_sums():
    n = 6
    a = [rand() for _ in range(n)]
    out = base_test().run_gate(lambda ctx, gate: gate.sum(ctx, [Witness(x) for x in a]))
    assert out.val() == sum(a) % F.p

    def f(ctx, gate):
        return [s.val() for s in gate.partial_sums(ctx, [Witness(x) for x in a])]

    got = base_test().run_gate(f)
    acc, want = 0, []
    for x in a:
        acc = (acc + x) % F.p
        want.append(acc)
    assert got == want


def test_boolean_ops():
    for a in (0, 1):
        for b in (0, 1):
            out = base_test().run_gate(lambda ctx, gate: gate.or_(ctx, Witness(a), Witness(b)))
            assert out.val() == (a | b)
            out = base_test().run_gate(lambda ctx, gate: gate.and_(ctx, Witness(a), Witness(b)))
            assert out.val() == (a & b)
    out = base_test().run_gate(lambda ctx, gate: gate.not_(ctx, Witness(1)))
    assert out.val() == 0


def test_select():
    a, b = rand(), rand()
    for sel in (0, 1):
        out = base_test().run_gate(
            lambda ctx, gate: gate.select(ctx, Witness(a), Witness(b), Witness(sel))
        )
        assert out.val() == (a if sel else b)


def test_or_and():
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                out = base_test().run_gate(
                    lambda ctx, gate: gate.or_and(ctx, Witness(a), Witness(b), Witness(c))
                )
                assert out.val() == (a | (b & c))


def test_bits_to_indicator():
    def f(ctx, gate):
        bits = [ctx.load_witness(b) for b in (1, 0, 1)]  # little-endian: idx = 5
        ind = gate.bits_to_indicator(ctx, bits)
        return [x.val() for x in ind]

    got = base_test().run_gate(f)
    assert got == [1 if i == 5 else 0 for i in range(8)]


def test_idx_to_indicator():
    for idx in (0, 3, 7, 9):
        def f(ctx, gate):
            ind = gate.idx_to_indicator(ctx, Witness(idx), 8)
            return [x.val() for x in ind]

        got = base_test().run_gate(f)
        assert got == [1 if i == idx else 0 for i in range(8)]


def test_select_by_indicator_and_from_idx():
    a = [rand() for _ in range(6)]
    idx = 4

    def f(ctx, gate):
        return gate.select_from_idx(ctx, [Witness(x) for x in a], Witness(idx))

    out = base_test().run_gate(f)
    assert out.val() == a[idx]


def test_select_array_by_indicator():
    arr = [[rand() for _ in range(3)] for _ in range(4)]
    idx = 2

    def f(ctx, gate):
        rows = [[ctx.load_witness(v) for v in row] for row in arr]
        ind = gate.idx_to_indicator(ctx, Witness(idx), 4)
        out = gate.select_array_by_indicator(ctx, rows, ind)
        return [x.val() for x in out]

    got = base_test().run_gate(f)
    assert got == arr[idx]


def test_is_zero_is_equal():
    out = base_test().run_gate(lambda ctx, gate: gate.is_zero(ctx, ctx.load_witness(0)))
    assert out.val() == 1
    out = base_test().run_gate(lambda ctx, gate: gate.is_zero(ctx, ctx.load_witness(5)))
    assert out.val() == 0
    a = rand()
    out = base_test().run_gate(lambda ctx, gate: gate.is_equal(ctx, Witness(a), Witness(a)))
    assert out.val() == 1
    out = base_test().run_gate(
        lambda ctx, gate: gate.is_equal(ctx, Witness(a), Witness((a + 1) % F.p))
    )
    assert out.val() == 0


def test_num_to_bits():
    x = 0b1011010
    def f(ctx, gate):
        a = ctx.load_witness(x)
        bits = gate.num_to_bits(ctx, a, 8)
        return [b.val() for b in bits]

    got = base_test().run_gate(f)
    assert got == [(x >> i) & 1 for i in range(8)]


def test_pow_var():
    a, e = rand(), 13
    def f(ctx, gate):
        return gate.pow_var(ctx, ctx.load_witness(a), ctx.load_witness(e), 5)

    out = base_test().run_gate(f)
    assert out.val() == pow(a, e, F.p)


def test_lagrange_and_eval():
    pts = [(i + 1, rand()) for i in range(4)]
    x = 17

    # ground truth via Lagrange interpolation
    def truth():
        total = 0
        for i, (xi, yi) in enumerate(pts):
            term = yi
            for j, (xj, _) in enumerate(pts):
                if i != j:
                    term = term * (x - xj) % F.p
                    term = term * F.inv((xi - xj) % F.p) % F.p
            total = (total + term) % F.p
        return total

    def f(ctx, gate):
        coords = [(ctx.load_witness(a), ctx.load_witness(b)) for a, b in pts]
        xa = ctx.load_witness(x)
        out, _z = gate.lagrange_and_eval(ctx, coords, xa)
        return out

    out = base_test().run_gate(f)
    assert out.val() == truth()


def test_sum_products_with_coeff_and_var():
    vals = [(rand(), rand(), rand()) for _ in range(4)] + [(1, rand(), rand()), (0, rand(), rand())]
    var = rand()
    want = (var + sum(c * a * b for c, a, b in vals)) % F.p

    def f(ctx, gate):
        return gate.sum_products_with_coeff_and_var(
            ctx, [(c, Witness(a), Witness(b)) for c, a, b in vals], Witness(var)
        )

    out = base_test().run_gate(f)
    assert out.val() == want


def test_accumulated_product():
    a = [rand() for _ in range(3)]
    b = [rand() for _ in range(4)]

    def f(ctx, gate):
        out = gate.accumulated_product(ctx, [Witness(x) for x in a], [Witness(y) for y in b])
        return [x.val() for x in out]

    got = base_test().run_gate(f)
    want = [b[0]]
    for i in range(3):
        want.append((a[i] * want[-1] + b[i + 1]) % F.p)
    assert got == want


# --- negative tests: prank a witness, circuit must fail (neg_prop.rs pattern) ---
def test_prank_add_fails():
    def f(ctx, gate):
        out = gate.add(ctx, Witness(3), Witness(4))
        out.debug_prank(ctx, 99)  # corrupt the output cell

    base_test().expect(False).run_gate(f)


def test_prank_inner_product_fails():
    def f(ctx, gate):
        out = gate.inner_product(ctx, [Witness(3), Witness(4)], [Witness(5), Witness(6)])
        out.debug_prank(ctx, 1)

    base_test().expect(False).run_gate(f)


def test_debug_assert_false():
    base_test().expect(False).run_gate(lambda ctx, gate: ctx.debug_assert_false())


def test_constrain_equal_fails():
    def f(ctx, gate):
        a = ctx.load_witness(1)
        b = ctx.load_witness(2)
        ctx.constrain_equal(a, b)

    base_test().expect(False).run_gate(f)
