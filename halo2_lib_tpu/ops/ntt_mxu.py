"""MXU-based NTT: the DFT as exact bf16 digit-plane matrix multiplies.

Radix-2 NTT stages are hostile to the TPU's (8, 128) lane tiling — their
fine-grained interleaves become intra-tile shuffles. This module instead
computes the DFT the way the hardware wants: as MATRIX MULTIPLICATION on the
MXU, via the four-step decomposition N = R * C (R, C <= 256):

    A[k1, c] = sum_r W_R[k1, r] * X[r, c]        (one matmul, contract R)
    B[k1, c] = A[k1, c] * omega_N^(k1 * c)        (elementwise twiddle)
    out[k1 + R*k2] = sum_c W_C[k2, c] * B[k1, c]  (one matmul, contract C)

Field elements don't fit the MXU, so each 254-bit value is split into 32
8-bit digit planes. The key exactness facts (why this gives bit-exact field
math on a float unit):
  * 8-bit digits are exact in bf16 (<= 255 needs 8 significand bits);
  * the MXU multiplies bf16 exactly and accumulates in f32;
  * every accumulated sum stays < 2^24 = f32's exact-integer range:
    contraction of R <= 256 terms of (<=255)*(<=255) products < 2^24.
The [32 x 32] digit-pair products are folded into 64 8-bit-weighted columns
(s32 shift-adds), carry-normalized, and reduced mod p by a SECOND exact
matmul against the constant table G[t] = 2^(8t) mod p (again 8-bit digit
planes, sums < 2^22), followed by two/three 2^256-overflow folds and a
branch-free conditional-subtract ladder. Per element this is ~0.6 of a
Montgomery multiply of VPU work plus MXU matmuls — ~5x fewer vector ops
than the radix-2 ladder, with zero shuffle hazards.

Sizes above 2^16 recurse: one outer four-step level (coarse, lane-friendly
transposes + one twiddle multiply) over MXU base transforms.

Replaces ops/ntt.py's Stockham kernel on the TPU path (see new_ntt());
validated against it in tests/test_ntt_mxu.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .limbs import LIMB_BITS, MASK, N_LIMBS, DeviceField, _int_to_limbs

# number of 8-bit digit planes of a 256-bit value
_D = 32
# folded product columns: i + j for i, j < 32 -> 63, padded to 64
_FCOLS = 64


def _digits_of(vals: np.ndarray, nd: int) -> np.ndarray:
    """uint8[..., nd] little-endian digits of an object array of ints."""
    flat = vals.reshape(-1)
    out = np.zeros((flat.size, nd), dtype=np.uint8)
    for i, v in enumerate(flat):
        out[i] = np.frombuffer(int(v).to_bytes(nd, "little"), dtype=np.uint8)
    return out.reshape(vals.shape + (nd,))


@lru_cache(maxsize=None)
def _dft_planes_np(p: int, root: int, R: int) -> np.ndarray:
    """uint8[32, R, R] digit planes of the DFT matrix W[k, r] = root^(k*r).

    Cached as NUMPY (device conversion happens at the use site so traced
    callers embed constants instead of leaking tracers)."""
    pow_tab = [1] * R
    for i in range(1, R):
        pow_tab[i] = pow_tab[i - 1] * root % p
    e = (np.arange(R, dtype=np.int64)[:, None] * np.arange(R, dtype=np.int64)[None, :]) % R
    W = np.array(pow_tab, dtype=object)[e]  # [R(k), R(r)] canonical
    d = _digits_of(W, _D)  # [R, R, 32]
    return np.ascontiguousarray(d.transpose(2, 0, 1))


def _dft_planes(p: int, root: int, R: int):
    return jnp.asarray(_dft_planes_np(p, root, R), dtype=jnp.bfloat16)


@lru_cache(maxsize=None)
def _g_table_np(p: int):
    G = np.array([pow(2, 8 * t, p) for t in range(68)], dtype=object)
    g8 = _digits_of(G, _D)  # [68, 32]
    c256 = tuple(int(x) for x in _int_to_limbs(pow(2, 256, p)))
    return g8, c256


def _g_table(p: int):
    """(g8 bf16[68, 32], c256 limbs tuple): the mod-p fold tables.

    g8[t] = 8-bit digit planes of G_t = 2^(8t) mod p; c256 = 2^256 mod p.
    Numpy-cached; converted per use so jitted callers bake constants.
    """
    g8, c256 = _g_table_np(p)
    return jnp.asarray(g8, dtype=jnp.bfloat16), c256


def _fold_mod_p(df: DeviceField, cols: jax.Array) -> jax.Array:
    """s32 product columns [..., 64, C] (entries < 2^29, value = sum c_t 2^8t)
    -> canonical-mod-p limb-major uint32[..., 16, C].

    carry-normalize -> exact digit matmul against G -> normalize -> three
    2^256-overflow folds -> conditional-subtract ladder (8p, 4p, 2p, p).
    """
    g8, c256 = _g_table(df.p_int)
    # 1. normalize the 64 columns to 8-bit digits (values < 2^29 -> 66 digits)
    digs = []
    carry = jnp.zeros_like(cols[..., 0, :])
    for t in range(_FCOLS):
        v = cols[..., t, :] + carry
        digs.append(v & 0xFF)
        carry = v >> 8
    # entries < 2^29 keep the running carry < 2^21: three trailing digits
    for _ in range(3):
        digs.append(carry & 0xFF)
        carry = carry >> 8
    d8 = jnp.stack(digs, axis=-2)  # [..., 67, C]
    # 2. fold mod p: result = sum_t d_t * G_t via exact bf16 matmul
    # d8 entries <= 255, g8 <= 255, contraction over t <= 67 -> sums < 2^22.1
    nt = d8.shape[-2]
    # digits and G entries are <= 255 (bf16-exact); sums < 2^22.2 (f32-exact)
    res_cols = jnp.einsum(
        "ts,...tc->...sc",
        g8[:nt],
        d8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [..., 32, C]
    # 3. normalize to 8-bit digits; value < 67*255*p < 2^268
    digs2 = []
    carry = jnp.zeros_like(res_cols[..., 0, :])
    for t in range(_D):
        v = res_cols[..., t, :] + carry
        digs2.append(v & 0xFF)
        carry = v >> 8
    for _ in range(3):  # residual carry < 2^15 -> up to 2 digits + slack
        digs2.append(carry & 0xFF)
        carry = carry >> 8
    # 4. pack digit pairs into 16-bit limbs: 35 digits -> 18 limbs
    while len(digs2) % 2:
        digs2.append(jnp.zeros_like(digs2[0]))
    limbs = [
        (digs2[2 * u] | (digs2[2 * u + 1] << 8)).astype(jnp.uint32)
        for u in range(len(digs2) // 2)
    ]
    # 5. fold the >= 2^256 part: val = hi * c256 + lo, three rounds
    for _ in range(3):
        lo, hi = limbs[:N_LIMBS], limbs[N_LIMBS:]
        if not hi:
            break
        # hi has <= 2 limbs after round 1; fold hi * c256 into lo
        acc = [jnp.zeros_like(lo[0]) for _ in range(N_LIMBS + 2)]
        for u in range(N_LIMBS):
            acc[u] = acc[u] + lo[u]
        for hj, h in enumerate(hi):
            for u in range(N_LIMBS):
                prod = h * jnp.uint32(c256[u])  # h < 2^16, limb < 2^16: exact
                if u + hj < len(acc):
                    acc[u + hj] = acc[u + hj] + (prod & MASK)
                if u + hj + 1 < len(acc):
                    acc[u + hj + 1] = acc[u + hj + 1] + (prod >> LIMB_BITS)
        # carry-normalize
        limbs = []
        carry = jnp.zeros_like(acc[0])
        for v in acc:
            v = v + carry
            limbs.append(v & MASK)
            carry = v >> LIMB_BITS
        while limbs and (len(limbs) > N_LIMBS):
            # drop trailing all-zero-by-bound limbs only structurally; keep
            # until the value bound fits: handled by loop rounds
            break
    # after 3 folds the value is < 2^257 (top limb <= 1); now 8p,4p,2p,p ladder
    limbs = limbs[: N_LIMBS + 2]
    while len(limbs) < N_LIMBS + 2:
        limbs.append(jnp.zeros_like(limbs[0]))
    p_int = df.p_int
    for mult in (8, 4, 2, 1):
        mp = _int_to_limbs(mult * p_int, N_LIMBS + 2)
        diff = []
        borrow = jnp.zeros_like(limbs[0])
        for u in range(N_LIMBS + 2):
            d = limbs[u] - jnp.uint32(mp[u]) - borrow
            diff.append(d & MASK)
            borrow = (d >> 31) & 1
        ge = borrow == 0
        limbs = [jnp.where(ge, diff[u], limbs[u]) for u in range(N_LIMBS + 2)]
    return jnp.stack(limbs[:N_LIMBS], axis=-2)


class MxuNTT:
    """NTT of size 2^log_n over df.field via MXU digit matmuls.

    API-compatible with ops.ntt.NTT (forward/inverse on limb-major
    [..., 16, n] Montgomery tensors, natural order in and out).
    """

    CHUNK = 4  # poly-columns per traced map step

    def __init__(self, df: DeviceField, log_n: int):
        field = df.field
        assert log_n <= field.s
        self.df = df
        self.log_n = log_n
        self.n = 1 << log_n
        p = field.p
        w = field.nth_root_of_unity(log_n)
        self.omega = w
        self.omega_inv = pow(w, p - 2, p)
        self.n_inv = pow(self.n, p - 2, p)
        self.n_inv_mont = df.pack(self.n_inv)
        # split: base two-level when log_n <= 16, else one outer level
        if log_n <= 16:
            self.k1 = (log_n + 1) // 2
            self.k2 = log_n - self.k1
            self.sub = None
        else:
            self.k1 = log_n // 2
            self.k2 = log_n - self.k1
            assert self.k1 <= 16 and self.k2 <= 16
            self.sub = (MxuNTT(df, self.k1), MxuNTT(df, self.k2))
        # constants are built EAGERLY: building them lazily inside a jit
        # trace would cache tracers (same rule as ops/ntt.py's twiddles)
        self._tw: dict[bool, tuple] = {}
        self._consts(True)
        self._consts(False)
        self._fwd = jax.jit(lambda x: self._mapped(x, True))
        self._bwd = jax.jit(lambda x: self._mapped(x, False))

    # --- per-direction constants (built eagerly on first use) ---------------
    def _consts(self, forward: bool):
        if forward not in self._tw:
            p = self.df.p_int
            w = self.omega if forward else self.omega_inv
            N1, N2 = 1 << self.k1, 1 << self.k2
            from .ntt import pows_host

            # host power chain + numpy gather: no device compiles at all
            pows = pows_host(self.df, w, self.n, device=False)  # np [16, n]
            ij = (
                np.arange(N1, dtype=np.int64)[:, None]
                * np.arange(N2, dtype=np.int64)[None, :]
            ) % self.n
            tw = jnp.asarray(
                np.ascontiguousarray(pows[:, ij.reshape(-1)]).reshape(
                    N_LIMBS, N1, N2
                )
            )
            if self.sub is None:
                w1 = _dft_planes(p, pow(w, N2, p), N1)
                w2 = _dft_planes(p, pow(w, N1, p), N2)
                self._tw[forward] = (tw, w1, w2)
            else:
                self._tw[forward] = (tw,)
        return self._tw[forward]

    # --- core two-level transform -------------------------------------------
    def _transform(self, x: jax.Array, forward: bool) -> jax.Array:
        """[..., 16, n] -> [..., 16, n], natural order both ways."""
        df = self.df
        N1, N2 = 1 << self.k1, 1 << self.k2
        lead = x.shape[:-2]
        X = x.reshape(lead + (N_LIMBS, N1, N2))
        if self.sub is None:
            tw, w1, w2 = self._consts(forward)
            # stage 1: contract r (axis -2): planes index rows k1
            A = _stage_limbs(df, w1, X)  # [..., 16, N1(k1), N2]
            # twiddle: elementwise Montgomery multiply (flatten structure axes
            # so the limb axis sits at -2 as mont_mul expects)
            B = df._mont_mul(
                A.reshape(lead + (N_LIMBS, N1 * N2)),
                tw.reshape(N_LIMBS, N1 * N2),
            ).reshape(lead + (N_LIMBS, N1, N2))
            Bt = jnp.swapaxes(B, -1, -2)  # [..., 16, N2(c), N1(k1)]
            O = _stage_limbs(df, w2, Bt)  # [..., 16, N2(k2), N1(k1)]
            return O.reshape(lead + (N_LIMBS, self.n))
        # outer four-step over MXU bases
        sub1, sub2 = self.sub
        (tw,) = self._consts(forward)
        # DFT_N1 along axis -2 for each c: batch N2 on a leading axis
        Xt = jnp.moveaxis(X, -1, -3)  # [..., N2, 16, N1]
        A = sub1._transform(Xt, forward)
        A = jnp.moveaxis(A, -3, -1)  # [..., 16, N1(k1), N2]
        B = df._mont_mul(
            A.reshape(lead + (N_LIMBS, N1 * N2)),
            tw.reshape(N_LIMBS, N1 * N2),
        ).reshape(lead + (N_LIMBS, N1, N2))
        Bt = jnp.moveaxis(jnp.swapaxes(B, -1, -2), -1, -3)  # [..., N1, 16, N2]
        O = sub2._transform(Bt, forward)  # [..., N1(k1), 16, N2(k2)]
        O = jnp.moveaxis(O, -3, -1)  # [..., 16, N2(k2), N1(k1)]
        return O.reshape(lead + (N_LIMBS, self.n))

    def _mapped(self, x: jax.Array, forward: bool) -> jax.Array:
        batch = x.shape[:-2]
        tail = x.shape[-2:]
        B = 1
        for d in batch:
            B *= d
        xf = x.reshape((B,) + tail)
        pad = (-B) % self.CHUNK
        if pad:
            xf = jnp.pad(xf, ((0, pad), (0, 0), (0, 0)))
        body = lambda c: self._transform(c, forward)
        out = jax.lax.map(body, xf.reshape((-1, self.CHUNK) + tail))
        return out.reshape((-1,) + tail)[:B].reshape(batch + tail)

    def forward(self, coeffs: jax.Array) -> jax.Array:
        return self._fwd(coeffs)

    def inverse(self, evals: jax.Array) -> jax.Array:
        out = self._bwd(evals)
        return self.df.mont_mul(out, self.n_inv_mont)

    # --- host-chunked batched entry points (see ops/ntt.py) -------------------
    def _body(self, x: jax.Array, forward: bool) -> jax.Array:
        out = self._transform(x, forward)
        if not forward:
            out = self.df._mont_mul(out, self.n_inv_mont)
        return out

    def _chunk_jit(self, forward: bool, b: int):
        if not hasattr(self, "_chunk_jits"):
            self._chunk_jits = {}
        key = (forward, b)
        fn = self._chunk_jits.get(key)
        if fn is None:
            fn = jax.jit(lambda c: self._body(c, forward))
            self._chunk_jits[key] = fn
        return fn

    def forward_cols(self, x: jax.Array) -> jax.Array:
        """[C, 16, n] -> [C, 16, n], host-chunked (call OUTSIDE jit)."""
        from .ntt import dispatch_cols

        return dispatch_cols(x, self.CHUNK, lambda b: self._chunk_jit(True, b))

    def inverse_cols(self, x: jax.Array) -> jax.Array:
        from .ntt import dispatch_cols

        return dispatch_cols(x, self.CHUNK, lambda b: self._chunk_jit(False, b))


def _stage_limbs(df: DeviceField, planes: jax.Array, X: jax.Array) -> jax.Array:
    """DFT stage on limb-major [..., 16, R, C]: contract R, limbs stay at -3.

    Rearranges to digit space, runs the 32 plane matmuls, folds mod p, and
    restores the limb axis to -3 (i.e. [..., 16, R_out, C]).
    """
    lead = X.shape[:-3]
    R, C = X.shape[-2], X.shape[-1]
    R_out = planes.shape[1]
    # move limbs off: [..., R, C, 16] -> digits handled inside _dft_stage on
    # a [..., 16, R, C] layout where the contraction axis is R.
    # digits: d[2i] = limb_i & 255 -> [..., 32, R, C]
    d = jnp.concatenate(
        [
            (X & 0xFF).reshape(lead + (N_LIMBS, 1, R, C)),
            (X >> 8).reshape(lead + (N_LIMBS, 1, R, C)),
        ],
        axis=-3,
    ).reshape(lead + (_D, R, C))
    rhs = jnp.swapaxes(d, -3, -2).reshape(lead + (R, _D * C)).astype(jnp.bfloat16)
    acc = jnp.zeros(lead + (R_out, _FCOLS, C), jnp.int32)
    nlead = len(lead)
    for i in range(_D):
        M = jax.lax.dot_general(
            planes[i],
            rhs,
            dimension_numbers=(((1,), (nlead,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if nlead:
            M = jnp.moveaxis(M, 0, nlead)
        Mi = M.reshape(lead + (R_out, _D, C)).astype(jnp.int32)
        pad = [(0, 0)] * Mi.ndim
        pad[-2] = (i, _FCOLS - _D - i)
        acc = acc + jnp.pad(Mi, pad)
    out = _fold_mod_p(df, acc)  # [..., R_out, 16, C]
    return jnp.swapaxes(out, -3, -2)  # [..., 16, R_out, C]
