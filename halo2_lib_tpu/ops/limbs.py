"""Device field arithmetic: 256-bit modular math on 16x16-bit limb tensors.

TPU-first design (see /opt/skills/guides/pallas_guide.md): the TPU has no
64-bit integer units, so field elements are packed as 16 little-endian 16-bit
limbs stored in ``uint32`` lanes. A 16x16-bit product fits exactly in uint32,
and column-accumulated schoolbook multiplication keeps every intermediate sum
below 2^23 — no 64-bit carries anywhere. Montgomery reduction (R = 2^256) is
interleaved column-wise so the whole modmul is ~110 vector ops over the batch
dimension, which XLA fuses into a handful of VPU kernels.

Layout: tensors are **limb-major** ``uint32[..., 16, B]`` — the 16-limb axis
on SUBLANES (axis -2) and the element/batch axis on LANES (axis -1). This is
the load-bearing TPU choice: the hardware tiles the last two axes as (8, 128),
so limb-major tensors are dense (16 sublanes = 2 full tiles), every vector op
uses all 128 lanes, and VMEM blocks in the pallas kernels carry 8x more
elements than the limbs-minor layout would (which pads 16 -> 128 lanes).
A single scalar is ``[16, 1]``; a list of K scalars is ``[16, K]``.

Everything here is shape-polymorphic over leading batch dims and jit/vmap/
shard_map friendly: no data-dependent control flow, static shapes only.

Replaces the role of `halo2curves-axiom` field arithmetic in the reference
backend (SURVEY.md §2.9); the host-exact twin is utils.fields.PrimeField.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.fields import PrimeField

LIMB_BITS = 16
N_LIMBS = 16  # 256 bits
MASK = (1 << LIMB_BITS) - 1

# TPU: dispatch big-batch Montgomery products to the fused pallas kernel
# (ops/pallas_field.py). CPU keeps the exact-f32 matmul path below.
_USE_PALLAS = None  # resolved lazily on first _mont_mul call


def _use_pallas() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = (
            jax.default_backend() != "cpu"
            and os.environ.get("HALO2_NO_PALLAS") != "1"
        )
    return _USE_PALLAS


def _int_to_limbs(x: int, n: int = N_LIMBS) -> np.ndarray:
    """Host helper: int -> uint32[n] little-endian 16-bit limbs (a flat limb
    VECTOR, not a device tensor — device scalars are [n, 1])."""
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(n)], dtype=np.uint32)


def _limbs_to_int(a) -> int:
    out = 0
    for i, v in enumerate(np.asarray(a, dtype=np.uint64)):
        out |= int(v) << (LIMB_BITS * i)
    return out


def ints_to_limbs(values: list[int], n: int = N_LIMBS) -> np.ndarray:
    """Vectorized packing: list of ints (< 2^(16n)) -> uint32[len, n] limbs.

    NOTE: host layout is row-per-value [len, n]; transpose to [n, len] for
    the device limb-major convention (ints_to_limbs_T does both)."""
    try:
        # fast path: every value < 2^63 packs through one numpy conversion
        # (selector/table/index columns; the common keygen case)
        a = np.array(values, dtype=np.int64)
        if len(a) and a.min() >= 0:
            out = np.zeros((len(a), n), dtype=np.uint32)
            u16 = a.astype(np.uint64).view(np.uint16).reshape(len(a), 4)
            out[:, : min(4, n)] = u16[:, : min(4, n)]
            return out
    except (OverflowError, TypeError):
        pass
    N = len(values)
    if N == 0:
        return np.zeros((0, n), dtype=np.uint32)
    # mixed path: one oversized constant must not push the whole (often
    # mostly-small) array down the per-int to_bytes path — pack the < 2^63
    # bulk through numpy and only the big stragglers per-int.
    lim = 1 << 63
    small = np.fromiter(
        ((v if type(v) is int and 0 <= v < lim else -1) for v in values),
        dtype=np.int64,
        count=N,
    )
    big_idx = np.nonzero(small < 0)[0]
    out = np.zeros((N, n), dtype=np.uint32)
    u16 = np.where(small < 0, 0, small).astype(np.uint64).view(np.uint16).reshape(N, 4)
    out[:, : min(4, n)] = u16[:, : min(4, n)]
    if len(big_idx):
        nbytes = 2 * n
        buf = b"".join(int(values[i]).to_bytes(nbytes, "little") for i in big_idx)
        bu = np.frombuffer(buf, dtype="<u2").reshape(len(big_idx), n)
        out[big_idx] = bu
    return out


def ints_to_limbs_T(values: list[int], n: int = N_LIMBS) -> np.ndarray:
    """List of ints -> uint32[n, len] limb-MAJOR device layout."""
    return np.ascontiguousarray(ints_to_limbs(values, n).T)


def limbs_to_ints(arr) -> list[int]:
    """Vectorized unpacking: uint32[..., n] 16-bit limbs (limbs MINOR, the
    host layout) -> list of ints."""
    a = np.asarray(arr, dtype=np.uint32).reshape(-1, arr.shape[-1])
    u16 = a.astype("<u2")
    buf = u16.tobytes()
    nbytes = 2 * a.shape[-1]
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little") for i in range(a.shape[0])
    ]


class DeviceField:
    """Batched modular arithmetic for one prime field on device.

    Elements are limb-major ``uint32[..., 16, B]`` tensors (see module doc).
    Unless stated otherwise, inputs and outputs are in Montgomery form
    (x * 2^256 mod p) — the form used by every kernel (NTT, MSM, stencil)
    to avoid per-op conversions.
    """

    def __init__(self, field: PrimeField):
        assert field.num_bits <= 256
        self.field = field
        p = field.p
        self.p_int = p
        self.P = _int_to_limbs(p)
        # n0 = -p^{-1} mod 2^16 (Montgomery magic constant)
        self.n0 = np.uint32((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        # nprime = -p^{-1} mod 2^256, 16 limbs (for SOS Montgomery reduction)
        self.NPRIME = _int_to_limbs((-pow(p, -1, 1 << 256)) % (1 << 256))
        self.R = (1 << 256) % p
        self.R2 = _int_to_limbs((self.R * self.R) % p)
        self.ONE_MONT = _int_to_limbs(self.R)  # 1 in Montgomery form
        self.ZERO = np.zeros(N_LIMBS, dtype=np.uint32)
        # p as 17 limbs for the conditional subtract after add/reduce
        self.P17 = _int_to_limbs(p, N_LIMBS + 1)
        # jitted entry points (shape-cached); implementations are the _-methods
        self.add = jax.jit(self._add)
        self.sub = jax.jit(self._sub)
        self.neg = jax.jit(self._neg)
        self.double = jax.jit(self._double)
        self.mont_mul = jax.jit(self._mont_mul)
        self.square = jax.jit(self._square)
        self.to_mont = jax.jit(self._to_mont)
        self.from_mont = jax.jit(self._from_mont)
        self.inv = jax.jit(self._inv)
        self.batch_inv = jax.jit(self._batch_inv)
        self._pow_cache: dict[int, object] = {}

    # --- host <-> device packing (canonical ints <-> Montgomery limbs) -----
    def pack(self, values, mont: bool = True) -> jax.Array:
        """Pack python ints (canonical) into limb-major tensors: an int ->
        [16, 1]; a list of K ints -> [16, K]. Optionally Montgomery form."""
        if isinstance(values, int):
            values = [values]
        p = self.p_int
        if mont:
            vals = [(int(v) << 256) % p for v in values]
        else:
            vals = [int(v) % p for v in values]
        return jnp.asarray(ints_to_limbs_T(vals))

    def unpack(self, arr, mont: bool = True) -> list[int]:
        """Unpack limb-major tensors [..., 16, B] back to canonical ints
        (flattened in element order)."""
        a = np.asarray(jax.device_get(arr))
        a = np.moveaxis(a.reshape(-1, N_LIMBS, a.shape[-1]), 1, 2).reshape(-1, N_LIMBS)
        rinv = pow(1 << 256, -1, self.p_int) if mont else 1
        return [(v * rinv) % self.p_int for v in limbs_to_ints(a)]

    # --- carry helpers -------------------------------------------------------
    # Carry/borrow propagation is Kogge-Stone over the LIMB axis: log2(k)
    # rounds of whole-tensor ops instead of k sequential [1, B]-thin steps.
    # This is the dominant XLA op count of every field op (a ripple chain is
    # ~50 small ops per multiply; KS is ~20 fat ones), so it halves both
    # compile time (XLA:CPU compile of the prover graphs was minutes) and
    # keeps the VPU sublane-full at runtime.

    @staticmethod
    def _shift_up(x: jax.Array, d: int) -> jax.Array:
        """Shift d positions toward higher limbs along axis -2, zero fill."""
        pad = [(0, 0)] * x.ndim
        pad[-2] = (d, 0)
        return jnp.pad(x, pad)[..., : x.shape[-2], :]

    @staticmethod
    def _ks_carries(g: jax.Array, p: jax.Array) -> jax.Array:
        """Inclusive carry chain: C_j = g_j | (p_j & C_{j-1}), Kogge-Stone.

        g, p: bool [..., k, B] per-position generate/propagate. Returns the
        carry OUT of each position j (bool, same shape)."""
        k = g.shape[-2]
        d = 1
        while d < k:
            g = g | (p & DeviceField._shift_up(g, d))
            p = p & DeviceField._shift_up(p, d)
            d *= 2
        return g

    @staticmethod
    def _carry(cols: jax.Array, out_limbs: int) -> jax.Array:
        """Carry-normalize `cols` [..., k, B] (any <=32-bit entries) into
        16-bit limbs [..., out_limbs, B] (value must fit out_limbs limbs)."""
        k = cols.shape[-2]
        if k < out_limbs:
            pad = [(0, 0)] * cols.ndim
            pad[-2] = (0, out_limbs - k)
            cols = jnp.pad(cols, pad)
        # split v = a + (c << 16); add the shifted big carries: t < 2^17
        a = cols & MASK
        c = cols >> LIMB_BITS
        t = a + DeviceField._shift_up(c, 1)
        # unit-carry chain of the remaining base-2^16 addition
        g = t >> LIMB_BITS != 0
        p = (t & MASK) == MASK
        carry_in = DeviceField._shift_up(DeviceField._ks_carries(g, p), 1)
        out = (t + carry_in.astype(jnp.uint32)) & MASK
        return out[..., :out_limbs, :]

    def _cond_sub_p(self, t: jax.Array) -> jax.Array:
        """t [..., 17, B] (normalized limbs, value < 2p) -> t mod p, 16 limbs."""
        p17 = jnp.asarray(self.P17)[:, None]
        d = t - p17  # uint32 wrap; negative iff top bit set (inputs < 2^16)
        g = (d >> 31) != 0  # borrow generated
        pr = t == p17  # borrow propagates
        borrow = self._ks_carries(g, pr)
        borrow_in = DeviceField._shift_up(borrow, 1)
        diff = (d - borrow_in.astype(jnp.uint32)) & MASK
        ge = ~borrow[..., N_LIMBS, :]  # no net borrow -> t >= p
        return jnp.where(ge[..., None, :], diff, t)[..., :N_LIMBS, :]

    # --- ring ops (Montgomery-form in, Montgomery-form out) -------------------
    # TPU dispatch threshold for elementwise add/sub: below this flattened
    # element count the pallas launch overhead beats staying in XLA.
    _PALLAS_ELEMWISE_MIN = 4096

    def _addsub_pallas(self, a, b, is_add):
        if _use_pallas():
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            n = int(np.prod(shape)) // N_LIMBS if shape else 1
            if n >= self._PALLAS_ELEMWISE_MIN:
                from . import pallas_field

                return pallas_field.field_addsub(self, a, b, is_add)
        return None

    def _add(self, a: jax.Array, b: jax.Array) -> jax.Array:
        out = self._addsub_pallas(a, b, True)
        if out is not None:
            return out
        s = self._carry(a + b, N_LIMBS + 1)
        return self._cond_sub_p(s)

    def _sub(self, a: jax.Array, b: jax.Array) -> jax.Array:
        out = self._addsub_pallas(a, b, False)
        if out is not None:
            return out
        # KS borrow-subtract, then add p back where a < b (mod-2^256 wrap)
        a, b = _bcast2(a, b)
        d = a - b
        g = (d >> 31) != 0
        pr = a == b
        borrow = self._ks_carries(g, pr)
        borrow_in = DeviceField._shift_up(borrow, 1)
        diff = (d - borrow_in.astype(jnp.uint32)) & MASK
        underflow = borrow[..., N_LIMBS - 1 :, :]  # net borrow out, [..., 1, B]
        addp = jnp.where(underflow, jnp.asarray(self.P)[:, None], jnp.uint32(0))
        t = diff + addp  # < 2^17
        g2 = t >> LIMB_BITS != 0
        p2 = (t & MASK) == MASK
        carry_in = DeviceField._shift_up(self._ks_carries(g2, p2), 1)
        return (t + carry_in.astype(jnp.uint32)) & MASK

    def _neg(self, a: jax.Array) -> jax.Array:
        zero = jnp.zeros_like(a)
        return self._sub(zero, a)

    def _double(self, a: jax.Array) -> jax.Array:
        return self._add(a, a)

    # Convolution strategy. "f32 matmul" (values < 2^21 < 2^24 so f32
    # accumulation is exact) hits Eigen sgemm on CPU — the u32 dot there is
    # ~100x slower. On TPU the f32 HIGHEST dot falls off the fast MXU path,
    # so the default there is "shift-accumulate": 16 shifted multiply-adds in
    # pure u32 on the VPU (no casts, no giant product tensor).
    _CONV_IN_F32 = jax.default_backend() == "cpu"
    _CONV_SHIFT_ACC = jax.default_backend() != "cpu"

    @staticmethod
    def _conv_cols(a: jax.Array, b: jax.Array, conv_mat: jax.Array) -> jax.Array:
        """Product columns cols[k] = sum_{i+j=k} a_i b_j of two 16-limb values.

        a, b: [..., 16, B] -> [..., 33, B]; entries < 2^21.
        One batched matmul against a 0/1 anti-diagonal matrix — no scatters,
        so the XLA graph stays tiny and the op is MXU/GEMM-friendly.
        """
        if DeviceField._CONV_SHIFT_ACC:
            return DeviceField._conv_cols_shift(a, b)
        prod = a[..., :, None, :] * b[..., None, :, :]  # [..., 16, 16, B]
        lohi = jnp.concatenate(
            [
                (prod & MASK).reshape(*prod.shape[:-3], N_LIMBS * N_LIMBS, prod.shape[-1]),
                (prod >> LIMB_BITS).reshape(*prod.shape[:-3], N_LIMBS * N_LIMBS, prod.shape[-1]),
            ],
            axis=-2,
        )
        # [..., 512, B] contracted with conv_mat [512, 33] -> [..., 33, B]
        if DeviceField._CONV_IN_F32:
            out = jnp.einsum(
                "sk,...sb->...kb",
                conv_mat.astype(jnp.float32),
                lohi.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.astype(jnp.uint32)
        return jnp.einsum("sk,...sb->...kb", conv_mat, lohi)

    @staticmethod
    def _conv_cols_shift(a: jax.Array, b: jax.Array) -> jax.Array:
        """Shift-accumulate convolution: cols += shift_i(a_i * b), lo/hi split.

        16 iterations of a broadcast multiply + two padded adds, all u32 on
        the VPU. Column sums stay < 2^21. a, b: [..., 16, B] -> [..., 33, B].
        """
        a, b = _bcast2(a, b)
        pad = [(0, 0)] * (a.ndim - 2)
        cols = jnp.zeros(a.shape[:-2] + (2 * N_LIMBS + 1, a.shape[-1]), dtype=jnp.uint32)
        for i in range(N_LIMBS):
            prod = a[..., i : i + 1, :] * b  # [..., 16, B] exact u32
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            cols = cols + jnp.pad(lo, pad + [(i, N_LIMBS + 1 - i), (0, 0)])
            cols = cols + jnp.pad(hi, pad + [(i + 1, N_LIMBS - i), (0, 0)])
        return cols

    @staticmethod
    def _normalize_low(cols: jax.Array, k: int):
        """Carry-normalize the first k columns; returns (limbs [..., k, B],
        carry out of column k-1 as a full-width value)."""
        low = cols[..., :k, :]
        a = low & MASK
        c = low >> LIMB_BITS
        t = a + DeviceField._shift_up(c, 1)
        g = t >> LIMB_BITS != 0
        p = (t & MASK) == MASK
        carries = DeviceField._ks_carries(g, p)
        carry_in = DeviceField._shift_up(carries, 1)
        out = (t + carry_in.astype(jnp.uint32)) & MASK
        # carry out of col k-1: the big part (c of the top col) plus the unit
        # carry the KS chain pushed out of the top position
        carry = c[..., k - 1, :] + carries[..., k - 1, :].astype(jnp.uint32)
        return out, carry

    def _mont_mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Montgomery product; fused pallas kernel on TPU for big batches."""
        if _use_pallas():
            from . import pallas_field

            return pallas_field.mont_mul(self, a, b)
        return self._mont_mul_xla(a, b)

    def _mont_mul_xla(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Montgomery product a*b*R^{-1} mod p (SOS form).

        T = a*b; m = (T mod R) * n' mod R; out = (T + m*p) / R, cond-subtract.
        All convolutions are one-hot matmuls (see _conv_cols); the only
        sequential parts are three 16-step carry chains of tiny elementwise
        ops. Intermediate column sums stay < 2^22, safe in uint32 lanes.
        """
        a, b = _bcast2(a, b)
        conv_mat = self._conv_mat()
        T = self._conv_cols(a, b, conv_mat)  # [..., 33, B]
        # m = (T mod R) * nprime mod R
        t_lo, t_carry = self._normalize_low(T, N_LIMBS)
        nprime = jnp.asarray(self.NPRIME)[:, None]
        m_cols = self._conv_cols(t_lo, nprime, conv_mat)
        m, _ = self._normalize_low(m_cols, N_LIMBS)  # mod R: drop carry
        # S = T + m*p; low 16 columns vanish mod R; propagate their carry up
        U = self._conv_cols(m, jnp.asarray(self.P)[:, None], conv_mat)
        S = T + U  # columns < 2^22
        _, low_carry = self._normalize_low(S, N_LIMBS)
        high = S[..., N_LIMBS:, :]  # 17 columns
        high = jnp.concatenate(
            [(high[..., 0, :] + low_carry)[..., None, :], high[..., 1:, :]], axis=-2
        )
        t = self._carry(high, N_LIMBS + 1)
        return self._cond_sub_p(t)

    _CONV_MAT_CACHE: dict[int, object] = {}

    def _conv_mat(self) -> jax.Array:
        """[2*256, 33] 0/1 matrix: (i, j) lo -> col i+j, hi -> col i+j+1."""
        mat = DeviceField._CONV_MAT_CACHE.get(0)
        if mat is None:
            mat = np.zeros((2 * N_LIMBS * N_LIMBS, 2 * N_LIMBS + 1), dtype=np.uint32)
            for i in range(N_LIMBS):
                for j in range(N_LIMBS):
                    mat[i * N_LIMBS + j, i + j] = 1
                    mat[N_LIMBS * N_LIMBS + i * N_LIMBS + j, i + j + 1] = 1
            DeviceField._CONV_MAT_CACHE[0] = mat
        return jnp.asarray(mat)

    def _square(self, a: jax.Array) -> jax.Array:
        return self._mont_mul(a, a)

    def _to_mont(self, x: jax.Array) -> jax.Array:
        return self._mont_mul(x, jnp.asarray(self.R2)[:, None])

    def _from_mont(self, x: jax.Array) -> jax.Array:
        one = jnp.zeros_like(x).at[..., 0, :].set(1)
        return self._mont_mul(x, one)

    # --- scalar-exponent ops ----------------------------------------------------
    def _pow_impl(self, a: jax.Array, bits: jax.Array) -> jax.Array:
        """a^e via lax.scan over MSB-first exponent bits (small compiled graph)."""
        init = jnp.broadcast_to(jnp.asarray(self.ONE_MONT)[:, None], a.shape)

        def body(acc, bit):
            acc = self._mont_mul(acc, acc)
            with_mul = self._mont_mul(acc, a)
            acc = jnp.where(bit, with_mul, acc)
            return acc, None

        out, _ = jax.lax.scan(body, init, bits)
        return out

    def pow(self, a: jax.Array, e: int) -> jax.Array:
        """a^e for a static int exponent (square-and-multiply under lax.scan)."""
        fn = self._pow_cache.get(e)
        if fn is None:
            bits = jnp.asarray([b == "1" for b in bin(e)[2:]], dtype=bool)
            fn = jax.jit(lambda x: self._pow_impl(x, bits))
            self._pow_cache[e] = fn
        return fn(a)

    def _inv(self, a: jax.Array) -> jax.Array:
        """Fermat inverse a^(p-2); zero input yields zero output."""
        if _use_pallas():
            from . import pallas_field

            return pallas_field.fermat_inv(self, a)
        bits = jnp.asarray([b == "1" for b in bin(self.p_int - 2)[2:]], dtype=bool)
        return self._pow_impl(a, bits)

    def _batch_inv(self, a: jax.Array) -> jax.Array:
        """Montgomery batch inversion along the LANE axis: one Fermat inv +
        two log-depth associative product scans (TPU-friendly, no sequential
        O(n) chain).

        inv(a_i) = prefix_{i-1} * suffix_{i+1} * inv(total).
        Zero entries are passed through as zero.
        """
        is_zero = self.is_zero(a)
        one = jnp.broadcast_to(jnp.asarray(self.ONE_MONT)[:, None], a.shape)
        safe = jnp.where(is_zero[..., None, :], one, a)

        lane_ax = safe.ndim - 1
        prefix_inc = jax.lax.associative_scan(self._mont_mul, safe, axis=lane_ax)
        suffix_inc = jax.lax.associative_scan(
            self._mont_mul, safe, axis=lane_ax, reverse=True
        )
        total = prefix_inc[..., -1:]
        inv_total = self._inv(total)
        # exclusive prefix / suffix
        prefix_exc = jnp.concatenate([one[..., :1], prefix_inc[..., :-1]], axis=-1)
        suffix_exc = jnp.concatenate([suffix_inc[..., 1:], one[..., :1]], axis=-1)
        invs = self._mont_mul(self._mont_mul(prefix_exc, suffix_exc), inv_total)
        return jnp.where(is_zero[..., None, :], jnp.zeros_like(a), invs)

    # --- predicates ---------------------------------------------------------------
    @staticmethod
    def is_zero(a: jax.Array) -> jax.Array:
        """[..., 16, B] -> bool [..., B]."""
        return jnp.all(a == 0, axis=-2)

    @staticmethod
    def eq(a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.all(a == b, axis=-2)

    @staticmethod
    def select(cond: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
        """cond ? a : b, cond shaped like the element dims [..., B]."""
        return jnp.where(cond[..., None, :], a, b)

    # --- constants ------------------------------------------------------------------
    def zero(self, shape=()) -> jax.Array:
        """Zero tensor for element shape `shape` (an int B or a tuple whose
        last axis is the lane axis); () -> a [16, 1] scalar."""
        return jnp.zeros(_limb_shape(shape), dtype=jnp.uint32)

    def one_mont(self, shape=()) -> jax.Array:
        return jnp.broadcast_to(jnp.asarray(self.ONE_MONT)[:, None], _limb_shape(shape))

    def const(self, value: int, shape=()) -> jax.Array:
        return jnp.broadcast_to(self.pack(value), _limb_shape(shape))


def _limb_shape(shape) -> tuple:
    """Element shape -> limb-major tensor shape (insert 16 before lanes)."""
    if isinstance(shape, int):
        shape = (shape,)
    if not shape:
        return (N_LIMBS, 1)
    return tuple(shape[:-1]) + (N_LIMBS, shape[-1])


def _bcast2(a: jax.Array, b: jax.Array):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)
