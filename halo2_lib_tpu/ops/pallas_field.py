"""Pallas TPU kernels: fused Montgomery field mul + complete EC point add.

Why these exist: 254-bit field math decomposes into ~10^2 small u32 ops per
element; left to XLA each op is its own HBM round trip. These kernels load a
block of elements into VMEM once, run the entire SOS Montgomery multiply
(or the whole complete Jacobian add: 23 fused multiplies) out of VMEM, and
write the result once.

Layout contract (matches ops/limbs.py): tensors are limb-major
``uint32[..., 16, B]`` — limbs on sublanes, elements on lanes. Blocks are
therefore DENSE (8,128) tiles: a (16, 8192) block is 512 KB of VMEM with
zero padding, so one grid step carries 8192 elements and the ~10 us/step
grid overhead amortizes away. (The limbs-minor layout would pad 16 -> 128
lanes: 8x the VMEM and DMA for the same elements, forcing 8x more steps.)

Replaces the hot inner loops of `halo2curves-axiom` field/curve arithmetic
in the reference backend (SURVEY.md §2.9) on the TPU path; the XLA
implementations in ops/limbs.py and ops/ec_device.py remain the reference
semantics (and the CPU path). Kernels are validated against them in
tests/test_pallas_field.py via interpret mode.

Algorithm notes
---------------
* Convolution: ``cols[i+j] += lo(a_i*b_j)``, ``cols[i+j+1] += hi(a_i*b_j)``
  accumulated into per-8-row TILE accumulators with static slices only
  (iteration i touches just the 3 tiles covering rows i..i+16 — full
  [40, B] rolls/adds made the kernel mostly move zeros). Column sums stay
  < 2^22, safe in uint32 lanes.
* Carry/borrow chains are log-depth Kogge-Stone over the limb axis in pure
  uint32 masks (Mosaic cannot bitcast i1 vregs).
* The EC add groups its 23 Montgomery multiplies into 6 stacked rounds
  ``[G, 16, B]`` exactly like ops/ec_device.py's XLA path, so the VPU
  sees few, fat ops.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from .limbs import LIMB_BITS, MASK, N_LIMBS, DeviceField

try:  # pallas is TPU/interpret-only; keep import soft for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# Lane width of one block: elements per kernel program. (16, BLK) u32 blocks
# are 512 KB — big enough that grid-step overhead is negligible, small
# enough that multi-operand kernels double-buffer comfortably in 16 MB VMEM.
# EC kernels keep ~25 live [16, B] temporaries (stacked multiply rounds +
# two 40-row convolution accumulators), so they run narrower blocks.
BLK = 8192
BLK_EC = 2048
# Minimum lane padding granule (one (8,128) tile row is 128 lanes; 512 keeps
# DMA descriptors fat for small inputs).
_LANE_PAD = 512
_COLS = 2 * N_LIMBS + 1  # 33 product columns
_CPAD = 40  # padded to a multiple of 8 sublanes


def _roll(x, shift, axis):
    """Static-shift roll that works both compiled (Mosaic) and interpreted."""
    return pltpu.roll(x, shift, axis) if shift else x


# --- in-kernel field helpers (values are uint32[..., 16|40, B]) ----------


def _pad_rows(x, before, after):
    """Zero-pad the sublane (row) axis."""
    pad = [(0, 0)] * x.ndim
    pad[-2] = (before, after)
    return jnp.pad(x, pad)


def _conv(at, bt):
    """Product columns of two limb-major values: [..., 16, B] -> [..., 40, B].

    cols[k] = sum_{i+j=k} lo(a_i*b_j) + sum_{i+j+1=k} hi(a_i*b_j); every
    partial sum < 2^22.

    Iteration i touches ONLY rows i..i+16 via a static slice-add: the old
    formulation rolled and added full zero-padded [40, B] blocks (6 fat ops
    per iteration), which made the kernel ~15x slower than its VPU op-count
    floor — most of the vector work was moving zeros.
    """
    ntile = _CPAD // 8
    accs = [None] * ntile
    for i in range(N_LIMBS):
        prod = at[..., i : i + 1, :] * bt  # [..., 16, B] exact u32
        c = _pad_rows(prod & MASK, 0, 1) + _pad_rows(prod >> LIMB_BITS, 1, 0)
        q, r = divmod(i, 8)
        c24 = _pad_rows(c, r, 7 - r)  # 24 rows, aligned to tile q
        for t in range(3):
            blk = c24[..., 8 * t : 8 * (t + 1), :]
            accs[q + t] = blk if accs[q + t] is None else accs[q + t] + blk
    zero = jnp.zeros(at.shape[:-2] + (8,) + at.shape[-1:], jnp.uint32)
    return jnp.concatenate([a if a is not None else zero for a in accs], axis=-2)


# Carry/borrow chains are Kogge-Stone over the limb (sublane) axis — log2(k)
# rounds of whole-block ops instead of k sequential [1, B]-thin row steps
# (mirrors ops/limbs.py; halves both the Mosaic op count and the sequential
# chain length of every field op).


def _shift_up_t(x, d):
    """Shift d positions toward higher limbs along axis -2, zero fill."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (d, 0)
    return jnp.pad(x, pad)[..., : x.shape[-2], :]


def _ks_carries_t(g, p):
    """Inclusive carry chain C_j = g_j | (p_j & C_{j-1}) (Kogge-Stone).

    g, p are uint32 0/1 tensors — NOT bools: Mosaic cannot bitcast i1 vregs
    to i32 (tpu.bitcast_vreg rejects vector<8x128xi1>), so the whole chain
    stays in integer masks."""
    k = g.shape[-2]
    d = 1
    while d < k:
        g = g | (p & _shift_up_t(g, d))
        p = p & _shift_up_t(p, d)
        d *= 2
    return g


def _eq_mask(a, b):
    """uint32 0/1 mask of a == b for values < 2^17 (no bool vregs)."""
    return ((a ^ b) - jnp.uint32(1)) >> 31


def _const_rows(limbs, shape):
    """Python int limb list -> constant rows [..., len(limbs), B]."""
    rows = [
        jnp.full(shape[:-2] + (1,) + shape[-1:], int(v), jnp.uint32) for v in limbs
    ]
    return jnp.concatenate(rows, axis=-2)


def _carry_t(cols, out_limbs):
    """Carry-normalize [..., k, B] (<=32-bit entries) to out_limbs 16-bit
    limbs (value must fit)."""
    k = cols.shape[-2]
    if k < out_limbs:
        pad = [(0, 0)] * cols.ndim
        pad[-2] = (0, out_limbs - k)
        cols = jnp.pad(cols, pad)
    a = cols & MASK
    c = cols >> LIMB_BITS
    t = a + _shift_up_t(c, 1)
    g = t >> LIMB_BITS  # 0/1
    p = ((t & MASK) + 1) >> LIMB_BITS  # 1 iff t & MASK == 0xFFFF
    cin = _shift_up_t(_ks_carries_t(g, p), 1)
    return ((t + cin) & MASK)[..., :out_limbs, :]


def _normalize_low(cols, k):
    """Carry-normalize the first k columns -> (limbs [..., k, B], carry row
    [..., B] out of column k-1, full width)."""
    low = cols[..., :k, :]
    a = low & MASK
    c = low >> LIMB_BITS
    t = a + _shift_up_t(c, 1)
    g = t >> LIMB_BITS
    p = ((t & MASK) + 1) >> LIMB_BITS
    carries = _ks_carries_t(g, p)
    cin = _shift_up_t(carries, 1)
    out = (t + cin) & MASK
    carry = c[..., k - 1, :] + carries[..., k - 1, :]
    return out, carry


def _cond_sub_p(t, p17):
    """t [..., 17, B] normalized limbs (value < 2p) -> t mod p, 16 rows.

    p17 is a python list of 17 int limbs (folded to in-kernel constants)."""
    pt = _const_rows(p17, t.shape)
    d = t - pt
    g = d >> 31  # borrow generated (inputs < 2^16)
    pr = _eq_mask(t, pt)
    borrow = _ks_carries_t(g, pr)
    diff = (d - _shift_up_t(borrow, 1)) & MASK
    ge = borrow[..., N_LIMBS : N_LIMBS + 1, :]  # 1 = t < p: keep t
    return (diff + (t - diff) * ge)[..., :N_LIMBS, :]


def _conv_const(at, c):
    """_conv against a compile-time constant 16-limb value (list of ints).

    Same static slice-add structure as _conv (i indexes the CONSTANT's
    limb; the variable limbs are the rows, so the contribution lands at
    rows i..i+16)."""
    ntile = _CPAD // 8
    accs = [None] * ntile
    for i in range(N_LIMBS):
        if not c[i]:
            continue
        prod = jnp.uint32(c[i]) * at  # [..., 16, B] exact u32 (c[i] < 2^16)
        cc = _pad_rows(prod & MASK, 0, 1) + _pad_rows(prod >> LIMB_BITS, 1, 0)
        q, r = divmod(i, 8)
        c24 = _pad_rows(cc, r, 7 - r)
        for t in range(3):
            blk = c24[..., 8 * t : 8 * (t + 1), :]
            accs[q + t] = blk if accs[q + t] is None else accs[q + t] + blk
    zero = jnp.zeros(at.shape[:-2] + (8,) + at.shape[-1:], jnp.uint32)
    return jnp.concatenate([a if a is not None else zero for a in accs], axis=-2)


def _conv_const_low(at, c):
    """Low 16 columns of _conv_const only: [..., 16, B] -> [..., 16, B].

    Montgomery's m = (T mod R) * n' mod R needs just cols 0..15, so terms
    with i+j >= 16 (over half the multiply volume and ALL the wide-tile
    traffic) are never computed. Column sums stay < 2^21.
    """
    cols = None
    for i in range(N_LIMBS):
        if not c[i]:
            continue
        w = N_LIMBS - i  # rows j < w contribute to cols i+j < 16
        prod = jnp.uint32(c[i]) * at[..., :w, :]  # [..., w, B]
        comb = _pad_rows(prod & MASK, 0, 1) + _pad_rows(prod >> LIMB_BITS, 1, 0)
        comb = comb[..., :w, :]  # drop col 16's row (i + w = 16)
        cc = _pad_rows(comb, i, 0)  # rows i..15
        cols = cc if cols is None else cols + cc
    return cols


def _mont_mul_t(at, bt, consts):
    """SOS Montgomery product on limb-major values [..., 16, B]."""
    nprime, p_rows, p17 = consts
    T = _conv(at, bt)
    t_lo, _ = _normalize_low(T, N_LIMBS)
    m_cols = _conv_const_low(t_lo, nprime)
    m, _ = _normalize_low(m_cols, N_LIMBS)
    U = _conv_const(m, p_rows)
    S = T + U
    _, low_carry = _normalize_low(S, N_LIMBS)
    # high 17 columns + the carry out of the vanished low half
    high = S[..., N_LIMBS : 2 * N_LIMBS + 1, :]
    high = jnp.concatenate(
        [(high[..., :1, :] + low_carry[..., None, :]), high[..., 1:, :]], axis=-2
    )
    return _cond_sub_p(_carry_t(high, N_LIMBS + 1), p17)


def _add_f(at, bt, p17):
    """Field add on limb-major [..., 16, B]."""
    return _cond_sub_p(_carry_t(at + bt, N_LIMBS + 1), p17)


def _sub_f(at, bt, p_rows):
    """Field sub on limb-major [..., 16, B]; p_rows = python list of limbs."""
    d = at - bt
    g = d >> 31
    pr = _eq_mask(at, bt)
    borrow = _ks_carries_t(g, pr)
    diff = (d - _shift_up_t(borrow, 1)) & MASK
    under = borrow[..., N_LIMBS - 1 :, :]  # [..., 1, B] net borrow (0/1)
    t = diff + _const_rows(p_rows, at.shape) * under
    g2 = t >> LIMB_BITS
    p2 = ((t & MASK) + 1) >> LIMB_BITS
    cin = _shift_up_t(_ks_carries_t(g2, p2), 1)
    return (t + cin) & MASK


def _dbl_f(at, p17):
    return _add_f(at, at, p17)


def _is_zero_t(at):
    """[..., 16, B] -> bool [..., 1, B]."""
    return jnp.all(at == 0, axis=-2, keepdims=True)


def _consts_for(df: DeviceField):
    """Per-field constants as python int lists (fold to scalar literals)."""
    nprime = [int(x) for x in df.NPRIME]
    p_rows = [int(x) for x in df.P]
    p17 = [int(x) for x in df.P17]
    return nprime, p_rows, p17


# --- kernels -----------------------------------------------------------------


def _mm_kernel(a_ref, b_ref, o_ref, *, df: DeviceField):
    o_ref[:] = _mont_mul_t(a_ref[:], b_ref[:], _consts_for(df))


def _ec_add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz, *, df: DeviceField):
    """Complete Jacobian add, mirroring ops/ec_device.py::DeviceCurve._add
    (same add-2007-bl + doubling-branch structure and case selects)."""
    nprime, p_rows, p17 = _consts_for(df)
    consts = (nprime, p_rows, p17)
    st = lambda *xs: jnp.stack(xs, axis=0)  # [G, ..., 16, B]

    X1, Y1, Z1 = x1[:], y1[:], z1[:]
    X2, Y2, Z2 = x2[:], y2[:], z2[:]

    r1 = _mont_mul_t(st(Z1, Z2, X1, Y1), st(Z1, Z2, X1, Y1), consts)
    Z1Z1, Z2Z2, A, B = r1[0], r1[1], r1[2], r1[3]
    r2 = _mont_mul_t(st(X1, X2, Y1, Y2, B, Y1), st(Z2Z2, Z1Z1, Z2, Z1, B, Z1), consts)
    U1, U2, t1, t2, C, YZ = (r2[i] for i in range(6))
    tXB = _add_f(X1, B, p17)
    r3 = _mont_mul_t(st(t1, t2, tXB), st(Z2Z2, Z1Z1, tXB), consts)
    S1, S2, tXB2 = r3[0], r3[1], r3[2]

    H = _sub_f(U2, U1, p_rows)
    r_ = _sub_f(S2, S1, p_rows)
    rr = _dbl_f(r_, p17)
    E = _add_f(_dbl_f(A, p17), A, p17)
    D = _dbl_f(_sub_f(_sub_f(tXB2, A, p_rows), C, p_rows), p17)
    zz = _add_f(Z1, Z2, p17)
    r4 = _mont_mul_t(st(H, E, rr, zz), st(H, E, rr, zz), consts)
    HH, F_, rr2, zz2 = r4[0], r4[1], r4[2], r4[3]
    I = _dbl_f(_dbl_f(HH, p17), p17)
    X3d = _sub_f(F_, _dbl_f(D, p17), p_rows)
    zzsub = _sub_f(_sub_f(zz2, Z1Z1, p_rows), Z2Z2, p_rows)
    r5 = _mont_mul_t(st(H, U1, zzsub, E), st(I, I, H, _sub_f(D, X3d, p_rows)), consts)
    J, V, Z3, Ed = r5[0], r5[1], r5[2], r5[3]
    X3 = _sub_f(_sub_f(rr2, J, p_rows), _dbl_f(V, p17), p_rows)
    r6 = _mont_mul_t(st(rr, S1), st(_sub_f(V, X3, p_rows), J), consts)
    S1J = r6[1]
    Y3 = _sub_f(r6[0], _dbl_f(S1J, p17), p_rows)
    C4 = _dbl_f(_dbl_f(C, p17), p17)
    Y3d = _sub_f(Ed, _dbl_f(C4, p17), p_rows)
    Z3d = _dbl_f(YZ, p17)

    p1_inf = _is_zero_t(Z1)
    p2_inf = _is_zero_t(Z2)
    h_zero = _is_zero_t(H)
    r_zero = _is_zero_t(r_)
    is_double = h_zero & r_zero & ~p1_inf & ~p2_inf
    is_ident = h_zero & ~r_zero & ~p1_inf & ~p2_inf

    X3 = jnp.where(is_double, X3d, X3)
    Y3 = jnp.where(is_double, Y3d, Y3)
    Z3 = jnp.where(is_double, Z3d, Z3)
    Z3 = jnp.where(is_ident, jnp.zeros_like(Z3), Z3)
    X3 = jnp.where(p2_inf, X1, jnp.where(p1_inf, X2, X3))
    Y3 = jnp.where(p2_inf, Y1, jnp.where(p1_inf, Y2, Y3))
    Z3 = jnp.where(p2_inf, Z1, jnp.where(p1_inf, Z2, Z3))

    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


def _madd_core(X1, Y1, Z1, X2, Y2, consts, distinct: bool, df: DeviceField):
    """Mixed Jacobian + affine add on limb-major [..., 16, B] values
    (madd-2007-bl), mirroring ops/ec_device.py::DeviceCurve._madd_xla.
    Affine identity = (0,0) sentinel; `distinct` drops the doubling branch
    (sound for SRS bases). Shared by the standalone madd kernel and the
    fused MSM bucket-accumulation scan kernel."""
    nprime, p_rows, p17 = consts
    st = lambda *xs: jnp.stack(xs, axis=0)

    if distinct:
        Z1Z1 = _mont_mul_t(Z1, Z1, consts)
        r2 = _mont_mul_t(st(X2, Y2), st(Z1Z1, Z1), consts)
        U2, t2 = r2[0], r2[1]
        H = _sub_f(U2, X1, p_rows)
        r3 = _mont_mul_t(st(t2, H), st(Z1Z1, H), consts)
        S2, HH = r3[0], r3[1]
    else:
        r1 = _mont_mul_t(st(Z1, X2, Y2), st(Z1, X2, Y2), consts)
        Z1Z1, A, B = r1[0], r1[1], r1[2]
        xB = _add_f(X2, B, p17)
        r2 = _mont_mul_t(st(X2, Y2, B, xB), st(Z1Z1, Z1, B, xB), consts)
        U2, t2, C, xB2 = r2[0], r2[1], r2[2], r2[3]
        H = _sub_f(U2, X1, p_rows)
        E = _add_f(_dbl_f(A, p17), A, p17)
        r3 = _mont_mul_t(st(t2, H, E), st(Z1Z1, H, E), consts)
        S2, HH, F_ = r3[0], r3[1], r3[2]

    rr = _dbl_f(_sub_f(S2, Y1, p_rows), p17)
    I = _dbl_f(_dbl_f(HH, p17), p17)
    ZH = _add_f(Z1, H, p17)
    if distinct:
        r4 = _mont_mul_t(st(H, X1, rr, ZH), st(I, I, rr, ZH), consts)
        J, V, rr2, ZH2 = r4[0], r4[1], r4[2], r4[3]
    else:
        D = _dbl_f(_sub_f(_sub_f(xB2, A, p_rows), C, p_rows), p17)
        X3d = _sub_f(F_, _dbl_f(D, p17), p_rows)
        r4 = _mont_mul_t(
            st(H, X1, rr, ZH, E), st(I, I, rr, ZH, _sub_f(D, X3d, p_rows)), consts
        )
        J, V, rr2, ZH2, Ed = r4[0], r4[1], r4[2], r4[3], r4[4]
    X3 = _sub_f(_sub_f(rr2, J, p_rows), _dbl_f(V, p17), p_rows)
    Z3 = _sub_f(_sub_f(ZH2, Z1Z1, p_rows), HH, p_rows)
    r5 = _mont_mul_t(st(rr, Y1), st(_sub_f(V, X3, p_rows), J), consts)
    Y1J = r5[1]
    Y3 = _sub_f(r5[0], _dbl_f(Y1J, p17), p_rows)

    p1_inf = _is_zero_t(Z1)
    live = ~(_is_zero_t(X2) & _is_zero_t(Y2))
    one_rows = _int_to_rows(df.R, X2.shape)

    if not distinct:
        C4 = _dbl_f(_dbl_f(C, p17), p17)
        Y3d = _sub_f(Ed, _dbl_f(C4, p17), p_rows)
        Z3d = _dbl_f(Y2, p17)
        is_double = live & ~p1_inf & _is_zero_t(H) & _is_zero_t(rr)
        X3 = jnp.where(is_double, X3d, X3)
        Y3 = jnp.where(is_double, Y3d, Y3)
        Z3 = jnp.where(is_double, Z3d, Z3)
    X3 = jnp.where(p1_inf, X2, X3)
    Y3 = jnp.where(p1_inf, Y2, Y3)
    Z3 = jnp.where(p1_inf, jnp.where(live, one_rows, jnp.zeros_like(Z1)), Z3)
    X3 = jnp.where(~live, X1, X3)
    Y3 = jnp.where(~live, Y1, Y3)
    Z3 = jnp.where(~live, Z1, Z3)
    return X3, Y3, Z3


def _ec_madd_kernel(x1, y1, z1, x2, y2, ox, oy, oz, *, df: DeviceField, distinct: bool):
    """Standalone mixed-add kernel on (16, BLK) blocks (see _madd_core)."""
    consts = _consts_for(df)
    X3, Y3, Z3 = _madd_core(x1[:], y1[:], z1[:], x2[:], y2[:], consts, distinct, df)
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


def _int_to_rows(v: int, shape):
    """Compile-time int -> limb-major [..., 16, B] constant rows."""
    rows = [
        jnp.full(shape[:-2] + (1,) + shape[-1:], (v >> (LIMB_BITS * i)) & MASK, jnp.uint32)
        for i in range(N_LIMBS)
    ]
    return jnp.concatenate(rows, axis=-2)


def _ec_double_kernel(x1, y1, z1, ox, oy, oz, *, df: DeviceField):
    """dbl-2009-l (a=0), mirroring DeviceCurve._double."""
    nprime, p_rows, p17 = _consts_for(df)
    consts = (nprime, p_rows, p17)
    st = lambda *xs: jnp.stack(xs, axis=0)
    X, Y, Z = x1[:], y1[:], z1[:]
    r1 = _mont_mul_t(st(X, Y), st(X, Y), consts)
    A, B = r1[0], r1[1]
    E = _add_f(_dbl_f(A, p17), A, p17)
    tXB = _add_f(X, B, p17)
    r2 = _mont_mul_t(st(B, tXB, E), st(B, tXB, E), consts)
    C, tXB2, F_ = r2[0], r2[1], r2[2]
    D = _dbl_f(_sub_f(_sub_f(tXB2, A, p_rows), C, p_rows), p17)
    X3 = _sub_f(F_, _dbl_f(D, p17), p_rows)
    r3 = _mont_mul_t(st(E, Y), st(_sub_f(D, X3, p_rows), Z), consts)
    C4 = _dbl_f(_dbl_f(C, p17), p17)
    Y3 = _sub_f(r3[0], _dbl_f(C4, p17), p_rows)
    Z3 = _dbl_f(r3[1], p17)
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


# --- host-callable wrappers ---------------------------------------------------
#
# Wrappers flatten all leading (non-limb) axes into lanes-plus-grid: a
# [..., 16, B] tensor becomes [L, 16, B] with grid (L, B/blk) and dense
# (1, 16, blk) blocks. Lane counts are padded up to a power-of-two multiple
# of _LANE_PAD so the number of compiled kernel variants stays logarithmic
# (zero padding is semantically inert: zero limbs are the field 0, the
# Jacobian identity (Z=0), and the dead affine sentinel (0,0)).


def _bucket(n: int) -> int:
    b = _LANE_PAD
    while b < n:
        b *= 2
    return b


def _prep_args(args, shape=None, max_blk=BLK):
    """Broadcast + flatten [..., 16, B] operands to [L, 16, BP]; returns
    (flattened args, element shape, L, BP, blk)."""
    if shape is None:
        shape = jnp.broadcast_shapes(*(a.shape for a in args))
    args = [jnp.broadcast_to(a, shape) for a in args]
    B = shape[-1]
    lead = shape[:-2]
    L = 1
    for d in lead:
        L *= d
    BP = _bucket(B)
    out = []
    for a in args:
        a = a.reshape((L, N_LIMBS, B))
        if BP != B:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, BP - B)))
        out.append(a)
    blk = min(BP, max_blk)
    return out, shape, L, BP, blk


def _bspec(blk):
    return pl.BlockSpec((1, N_LIMBS, blk), lambda l, i: (l, 0, i), memory_space=pltpu.VMEM)


def _guard(x):
    """Pin an optimization_barrier between every pallas result and its
    consumers. Works around a TPU XLA compiler abort on large prover graphs
    (TpuInstructionFusion::ShouldFuse → AllowedFusionsWithCustomCallAsProducer
    → HloReachabilityMap::IsReachable → std::out_of_range) when the fusion
    pass considers slicing/reshaping consumers of a pallas custom-call as
    fusion candidates. The barrier is a semantic identity; set
    HALO2_NO_PALLAS_GUARD=1 to drop it."""
    if os.environ.get("HALO2_NO_PALLAS_GUARD") == "1":
        return x
    return jax.lax.optimization_barrier(x)


@functools.lru_cache(maxsize=None)
def _mm_call(p_int: int, L: int, BP: int, blk: int, interpret: bool):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    return pl.pallas_call(
        functools.partial(_mm_kernel, df=df),
        out_shape=jax.ShapeDtypeStruct((L, N_LIMBS, BP), jnp.uint32),
        grid=(L, BP // blk),
        in_specs=[_bspec(blk), _bspec(blk)],
        out_specs=_bspec(blk),
        interpret=interpret,
    )


def mont_mul(df: DeviceField, a, b, interpret: bool = False):
    """Pallas Montgomery product on limb-major [..., 16, B] operands."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    if 0 in shape:
        return jnp.zeros(shape, jnp.uint32)
    (af, bf), shape, L, BP, blk = _prep_args([a, b], shape)
    out = _guard(_mm_call(df.p_int, L, BP, blk, interpret)(af, bf))
    return out[..., : shape[-1]].reshape(shape)


@functools.lru_cache(maxsize=None)
def _ec_call(p_int: int, kind: str, L: int, BP: int, blk: int, interpret: bool, distinct: bool = False):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    shape = jax.ShapeDtypeStruct((L, N_LIMBS, BP), jnp.uint32)
    if kind == "add":
        kern, nin, nout = functools.partial(_ec_add_kernel, df=df), 6, 3
    elif kind == "madd":
        kern, nin, nout = functools.partial(_ec_madd_kernel, df=df, distinct=distinct), 5, 3
    else:
        kern, nin, nout = functools.partial(_ec_double_kernel, df=df), 3, 3
    return pl.pallas_call(
        kern,
        out_shape=(shape,) * nout,
        grid=(L, BP // blk),
        in_specs=[_bspec(blk)] * nin,
        out_specs=(_bspec(blk),) * nout,
        interpret=interpret,
    )


def ec_add(dc, P1, P2, interpret: bool = False):
    """Pallas complete Jacobian add on limb-major coordinate tensors."""
    shape = jnp.broadcast_shapes(*(t.shape for t in (*P1, *P2)))
    if 0 in shape:
        z = jnp.zeros(shape, jnp.uint32)
        return (z, z, z)
    args, shape, L, BP, blk = _prep_args([*P1, *P2], shape, BLK_EC)
    outs = _guard(_ec_call(dc.df.p_int, "add", L, BP, blk, interpret)(*args))
    return tuple(t[..., : shape[-1]].reshape(shape) for t in outs)


def ec_madd(dc, P1, A2, distinct: bool, interpret: bool = False):
    """Pallas mixed Jacobian+affine add on limb-major coordinate tensors."""
    shape = jnp.broadcast_shapes(*(t.shape for t in (*P1, *A2)))
    if 0 in shape:
        z = jnp.zeros(shape, jnp.uint32)
        return (z, z, z)
    args, shape, L, BP, blk = _prep_args([*P1, *A2], shape, BLK_EC)
    outs = _guard(_ec_call(dc.df.p_int, "madd", L, BP, blk, interpret, distinct)(*args))
    return tuple(t[..., : shape[-1]].reshape(shape) for t in outs)


def ec_double(dc, P, interpret: bool = False):
    """Pallas Jacobian doubling on limb-major coordinate tensors."""
    shape = P[0].shape
    if 0 in shape:
        z = jnp.zeros(shape, jnp.uint32)
        return (z, z, z)
    args, shape, L, BP, blk = _prep_args(list(P), shape, BLK_EC)
    outs = _guard(_ec_call(dc.df.p_int, "double", L, BP, blk, interpret)(*args))
    return tuple(t[..., : shape[-1]].reshape(shape) for t in outs)


# --- fused MSM bucket-accumulation scan ---------------------------------------
#
# The MSM's bucket accumulation is an inclusive segmented scan of mixed EC
# adds over bucket-sorted points: CL independent lane-chains of R steps per
# window. As an XLA lax.scan this costs one kernel launch (plus HBM
# round-trips for the accumulator) PER STEP. This kernel runs the whole
# R-step scan in one pallas_call: accumulators live in VMEM scratch across
# sequential grid steps, each step consumes one (W_BLK, 32, CL) block of
# sorted points and writes the inclusive values.

_MSM_W_BLK = 4  # windows per kernel program


def _bucket_scan_kernel(axy_ref, st_ref, out_ref, accx, accy, accz, *, df, distinct, w_blk, cl):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        accx[:] = jnp.zeros_like(accx)
        accy[:] = jnp.zeros_like(accy)
        accz[:] = jnp.zeros_like(accz)

    # Sorted bases arrive PACKED, 2x16-bit limbs per u32 lane (row j holds
    # limbs j and j+8 of each coordinate): halves the HBM gather volume,
    # which is ~40% of the whole MSM. Unpack = mask/shift + row concat.
    at = axy_ref[:].reshape(w_blk, N_LIMBS, cl)
    px = at[:, : N_LIMBS // 2, :]
    py = at[:, N_LIMBS // 2 :, :]
    m16 = jnp.uint32(0xFFFF)
    x2 = jnp.concatenate([px & m16, px >> 16], axis=1)
    y2 = jnp.concatenate([py & m16, py >> 16], axis=1)
    start = st_ref[:].reshape(w_blk, 1, cl) != 0
    # reset the accumulator at segment starts (identity = all-zero, Z=0)
    X1 = jnp.where(start, jnp.uint32(0), accx[:])
    Y1 = jnp.where(start, jnp.uint32(0), accy[:])
    Z1 = jnp.where(start, jnp.uint32(0), accz[:])
    X3, Y3, Z3 = _madd_core(X1, Y1, Z1, x2, y2, _consts_for(df), distinct, df)
    accx[:] = X3
    accy[:] = Y3
    accz[:] = Z3
    out_ref[:] = jnp.concatenate([X3, Y3, Z3], axis=1).reshape(
        w_blk, 1, 3 * N_LIMBS, cl
    )


@functools.lru_cache(maxsize=None)
def _bucket_scan_call(p_int: int, wb: int, R: int, cl: int, distinct: bool, interpret: bool):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    w_blk = _MSM_W_BLK
    while wb % w_blk:
        w_blk //= 2
    grid = (wb // w_blk, R)
    return pl.pallas_call(
        functools.partial(
            _bucket_scan_kernel, df=df, distinct=distinct, w_blk=w_blk, cl=cl
        ),
        out_shape=jax.ShapeDtypeStruct((wb, R, 3 * N_LIMBS, cl), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (w_blk, 1, N_LIMBS, cl),
                lambda w, r: (w, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w_blk, 1, 1, cl), lambda w, r: (w, r, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (w_blk, 1, 3 * N_LIMBS, cl), lambda w, r: (w, r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((w_blk, N_LIMBS, cl), jnp.uint32)] * 3,
        interpret=interpret,
    )


def bucket_scan(dc, axy_sorted, seg_start, cl: int, distinct: bool, interpret: bool = False):
    """Inclusive segmented mixed-add scan for MSM bucket accumulation.

    axy_sorted: uint32[Wb, R, 16, CL] — bucket-sorted affine points PACKED
    two 16-bit limbs per u32 (row j = limbs j and j+8; x rows 0-7, y rows
    8-15; Montgomery; (0,0) = dead slot), laid out so sorted position
    ``lane*R + r`` sits at [w, r, :, lane]. seg_start: int32[Wb, R, CL]
    nonzero at segment (bucket-run) starts. Returns uint32[Wb, R, 48, CL]:
    the inclusive scan value (x|y|z limb-major rows, UNPACKED) after
    absorbing each position.
    """
    wb, R, _, cl_in = axy_sorted.shape
    assert cl_in == cl
    return _guard(
        _bucket_scan_call(dc.df.p_int, wb, R, cl, distinct, interpret)(
            axy_sorted, seg_start.reshape(wb, R, 1, cl)
        )
    )


# --- NTT butterfly ------------------------------------------------------------


def _butterfly_kernel(a_ref, b_ref, w_ref, top_ref, bot_ref, *, df: DeviceField):
    """One Stockham stage step: top = a + b, bot = (a - b) * w (fused)."""
    nprime, p_rows, p17 = _consts_for(df)
    at = a_ref[:]
    bt = b_ref[:]
    wt = w_ref[:]
    top_ref[:] = _add_f(at, bt, p17)
    bot_ref[:] = _mont_mul_t(_sub_f(at, bt, p_rows), wt, (nprime, p_rows, p17))


@functools.lru_cache(maxsize=None)
def _butterfly_call(p_int: int, L: int, BP: int, blk: int, interpret: bool):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    shape = jax.ShapeDtypeStruct((L, N_LIMBS, BP), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_butterfly_kernel, df=df),
        out_shape=(shape, shape),
        grid=(L, BP // blk),
        in_specs=[_bspec(blk)] * 3,
        out_specs=(_bspec(blk), _bspec(blk)),
        interpret=interpret,
    )


def ntt_butterfly(df: DeviceField, a, b, w, interpret: bool = False):
    """(a + b, (a - b) * w) fused, limb-major operands."""
    shape = jnp.broadcast_shapes(a.shape, b.shape, w.shape)
    if 0 in shape:
        z = jnp.zeros(shape, jnp.uint32)
        return (z, z)
    args, shape, L, BP, blk = _prep_args([a, b, w], shape)
    top, bot = _guard(_butterfly_call(df.p_int, L, BP, blk, interpret)(*args))
    B = shape[-1]
    return top[..., :B].reshape(shape), bot[..., :B].reshape(shape)


# --- Fermat inversion ---------------------------------------------------------
#
# a^(p-2) with the 254-step square-and-multiply LOOP INSIDE one kernel: as
# XLA ops the chain is ~500 sequential tiny dispatches (the [16, few]-lane
# operands pad to 512 lanes and each op pays device launch overhead — ~0.1 s
# per inversion on a remote backend). Here the whole chain runs out of VMEM
# under a single fori_loop; exponent bits come from folded u32 constants.


def _fermat_kernel(a_ref, o_ref, *, df: DeviceField):
    """4-bit fixed-window a^(p-2), fully unrolled (the exponent is a
    compile-time constant): ~317 straight-line Montgomery multiplies out of
    VMEM. A data-dependent fori_loop formulation ran ~0.8 ms PER ITERATION
    (scalar-read stall); constants cost nothing."""
    consts = _consts_for(df)
    a = a_ref[:]
    e = df.p_int - 2
    digits = []
    while e:
        digits.append(e & 15)
        e >>= 4
    digits.reverse()
    # table of a^0..a^15 (a^0 in Montgomery form = R)
    table = [None, a]
    for j in range(2, 16):
        table.append(_mont_mul_t(table[j - 1], a, consts))
    acc = None
    for d in digits:
        if acc is not None:
            for _ in range(4):
                acc = _mont_mul_t(acc, acc, consts)
        if d:
            acc = table[d] if acc is None else _mont_mul_t(acc, table[d], consts)
        elif acc is None:
            acc = _int_to_rows(df.R, a.shape) * jnp.uint32(1)
    o_ref[:] = acc


@functools.lru_cache(maxsize=None)
def _fermat_call(p_int: int, L: int, BP: int, blk: int, interpret: bool):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    return pl.pallas_call(
        functools.partial(_fermat_kernel, df=df),
        out_shape=jax.ShapeDtypeStruct((L, N_LIMBS, BP), jnp.uint32),
        grid=(L, BP // blk),
        in_specs=[_bspec(blk)],
        out_specs=_bspec(blk),
        interpret=interpret,
    )


def fermat_inv(df: DeviceField, a, interpret: bool = False):
    """Montgomery-domain a^(p-2) on limb-major [..., 16, B] (0 -> 0).

    The whole 254-step square-and-multiply chain runs inside ONE kernel
    (VMEM-resident accumulator, exponent bits via scalar prefetch): as XLA
    ops the chain is ~500 sequential sub-millisecond dispatches, ~0.1 s per
    inversion on a remote-tunnel backend, paid by every batch_inv total."""
    shape = a.shape
    if 0 in shape:
        return jnp.zeros(shape, jnp.uint32)
    (af,), shape, L, BP, blk = _prep_args([a], shape)
    out = _guard(_fermat_call(df.p_int, L, BP, blk, interpret)(af))
    return out[..., : shape[-1]].reshape(shape)


# --- elementwise field add/sub ------------------------------------------------


def _field_add_kernel(a_ref, b_ref, o_ref, *, df: DeviceField):
    _, _, p17 = _consts_for(df)
    o_ref[:] = _add_f(a_ref[:], b_ref[:], p17)


def _field_sub_kernel(a_ref, b_ref, o_ref, *, df: DeviceField):
    _, p_rows, _ = _consts_for(df)
    o_ref[:] = _sub_f(a_ref[:], b_ref[:], p_rows)


@functools.lru_cache(maxsize=None)
def _field_addsub_call(p_int: int, L: int, BP: int, blk: int, is_add: bool, interpret: bool):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    kern = _field_add_kernel if is_add else _field_sub_kernel
    return pl.pallas_call(
        functools.partial(kern, df=df),
        out_shape=jax.ShapeDtypeStruct((L, N_LIMBS, BP), jnp.uint32),
        grid=(L, BP // blk),
        in_specs=[_bspec(blk), _bspec(blk)],
        out_specs=_bspec(blk),
        interpret=interpret,
    )


def field_addsub(df: DeviceField, a, b, is_add: bool, interpret: bool = False):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    if 0 in shape:
        return jnp.zeros(shape, jnp.uint32)
    (af, bf), shape, L, BP, blk = _prep_args([a, b], shape)
    out = _guard(_field_addsub_call(df.p_int, L, BP, blk, is_add, interpret)(af, bf))
    return out[..., : shape[-1]].reshape(shape)
