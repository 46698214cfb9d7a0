"""Radix-2 NTT over a prime field, Stockham auto-sort formulation.

This is the backend FFT used by the prover for coefficient<->evaluation
conversion and extended-domain (coset) quotient computation — the role of the
radix-2 FFT inside `halo2-axiom`'s `create_proof` (SURVEY.md §2.9).

TPU-first shape choice: Stockham DIF avoids the bit-reversal permutation
entirely — every stage is a slice + butterfly (add/sub/mont_mul) + block
interleave on the flat LANE axis of limb-major ``[..., 16, N]`` tensors
(see ops/limbs.py for the layout rationale). All transforms accept arbitrary
leading batch dims.

Compile-cost design: the prover transforms MANY column stacks of shapes
[C, 16, n] with C varying per call site (pk tables, advice, quotient, single
openings). Tracing the log n-stage 254-bit butterfly graph per distinct C is
a multi-minute XLA compile EACH. So batched transforms are dispatched from
the HOST in power-of-two column chunks (`forward_cols`/`inverse_cols`):
every chunk reuses one executable per (chunk size, n), shared by every call
site, keygen, and the prover. The traceable `forward`/`inverse` remain for
use inside enclosing jits (tests, sharded kernels).

Multi-chip scaling: the leading stages split across devices and exchange
with all_to_all (four-step decomposition); see parallel/sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .limbs import N_LIMBS, DeviceField, _use_pallas, ints_to_limbs_T


# Fixed column-chunk for batched transforms routed through lax.map when the
# transform runs inside an enclosing jit trace (forward/inverse): the
# butterfly graph is traced ONCE per n, independent of the column count.
NTT_CHUNK = 8


def pows_host(df: DeviceField, root: int, m: int, device: bool = True):
    """[16, m] Montgomery powers 1, root, ..., root^{m-1}.

    Computed with exact host ints (two bigint mulmods per element) and packed
    through numpy — measured faster end-to-end than compiling a log-depth
    device power scan per distinct m (each such compile is seconds on TPU,
    and every domain needs four tables). Set device=False for the raw
    numpy limbs."""
    p = df.p_int
    r = df.R
    out = [0] * m
    cur = 1
    for i in range(m):
        out[i] = cur * r % p
        cur = cur * root % p
    arr = ints_to_limbs_T(out)
    return jnp.asarray(arr) if device else arr


def pows_host_ints(p: int, root: int, m: int) -> list[int]:
    """Canonical host power chain [1, root, ..., root^{m-1}] mod p."""
    out = [0] * m
    cur = 1
    for i in range(m):
        out[i] = cur
        cur = cur * root % p
    return out


# retained name: callers treat this as "give me the powers table on device"
def _pows_device(df: DeviceField, root: int, m: int) -> jax.Array:
    return pows_host(df, root, m)


def dispatch_cols(x: jax.Array, chunk: int, jit_for):
    """Host-chunked dispatch of a per-chunk executable over the leading axis.

    x: concrete [C, ...]; `jit_for(b)` returns a jitted fn for chunk size b.
    Every dispatch is exactly `chunk` wide (the tail is zero-padded), so ONE
    executable per op exists, shared by every caller — on a remote-compile
    TPU service each extra shape variant is a multi-second compile, far more
    than the padded tail's wasted compute. Returns the [C, ...] result."""
    C = x.shape[0]
    if C == 0:
        return x
    outs = []
    i = 0
    fn = jit_for(chunk)
    while i < C:
        piece = jax.lax.slice_in_dim(x, i, min(i + chunk, C), axis=0)
        if piece.shape[0] < chunk:
            pad = [(0, chunk - piece.shape[0])] + [(0, 0)] * (x.ndim - 1)
            piece = jnp.pad(piece, pad)
        outs.append(fn(piece))
        i += chunk
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:C] if out.shape[0] != C else out


class NTT:
    """NTT/INTT of size 2^log_n over df.field (which must have 2-adicity >= log_n).

    Operates on ``uint32[..., 16, n]`` Montgomery limb-major tensors; any
    leading batch dims are transformed independently in the same dispatch.
    """

    CHUNK = NTT_CHUNK

    def __init__(self, df: DeviceField, log_n: int):
        field = df.field
        assert log_n <= field.s, f"field 2-adicity {field.s} < log_n {log_n}"
        self.df = df
        self.log_n = log_n
        self.n = 1 << log_n
        p = field.p
        w = field.nth_root_of_unity(log_n)
        w_inv = pow(w, p - 2, p)
        self.omega = w
        self.omega_inv = w_inv
        self.n_inv = pow(self.n, p - 2, p)
        # twiddle tables are built EAGERLY (host power chain): building them
        # lazily inside a jit trace would cache tracers
        half = max(self.n // 2, 1)
        self._tw = {True: pows_host(df, w, half), False: pows_host(df, w_inv, half)}
        self.n_inv_mont = df.pack(self.n_inv)
        self._fwd = jax.jit(lambda x: self._mapped(x, True))
        self._bwd = jax.jit(lambda x: self._mapped(x, False))
        self._chunk_jits: dict = {}

    def _table(self, forward: bool) -> jax.Array:
        """[16, n/2] Montgomery twiddles w^k."""
        return self._tw[forward]

    def _fori_idx(self):
        """Per-stage gather tables for the shape-constant (fori_loop) form:
        (IDX int32[L, N]: output lane -> concat(top, bot) lane;
         IDXW int32[L, N/2]: lane -> expanded stage-twiddle lane)."""
        tabs = getattr(self, "_fidx", None)
        if tabs is None:
            import numpy as np

            L, N = self.log_n, self.n
            idx = np.zeros((L, N), np.int32)
            idxw = np.zeros((L, N // 2), np.int32)
            q = np.arange(N // 2)
            for st in range(L):
                s = 1 << st
                i, j = q // s, q % s
                out = np.empty(N, np.int64)
                out[(2 * i) * s + j] = q
                out[(2 * i + 1) * s + j] = N // 2 + q
                idx[st] = out
                idxw[st] = (q // s) * s
            tabs = (idx, idxw)
            self._fidx = tabs
        # numpy cached; device conversion happens per use (converting inside
        # a jit trace and caching would leak tracers — same rule as _tw)
        return jnp.asarray(tabs[0]), jnp.asarray(tabs[1])

    def _transform(self, x: jax.Array, forward: bool) -> jax.Array:
        """Stockham radix-2 DIF: natural order in, natural order out.

        x: [..., 16, N] limb-major; batch dims transform independently.
        Stage (n, s) with m = n/2: element (i < m, j < s) pairs lanes
        i*s + j and (m+i)*s + j — the two contiguous lane halves — and the
        interleave writes top/bot back at block granularity s.

        Off the pallas path the log N stages run SHAPE-CONSTANT under ONE
        fori_loop (stage twiddles and the interleave become per-stage lane
        gathers): the butterfly graph is traced once instead of log N times,
        which matters because XLA:CPU compile costs ~1 s per traced
        Montgomery multiply.
        """
        df = self.df
        N = self.n
        if N == 1:
            return x
        tw = self._table(forward)
        batch = x.shape[:-2]
        half = N // 2
        if not _use_pallas():
            IDX, IDXW = self._fori_idx()

            def body(st, x):
                a, b = x[..., :half], x[..., half:]
                wp = jnp.take(tw, IDXW[st], axis=-1)
                top = df._add(a, b)
                bot = df._mont_mul(df._sub(a, b), wp)
                cat = jnp.concatenate([top, bot], axis=-1)
                return jnp.take(cat, IDX[st], axis=-1)

            return jax.lax.fori_loop(0, self.log_n, body, x)
        n, s = N, 1
        while n > 1:
            m = n // 2
            a, b = x[..., :half], x[..., half:]
            # stage twiddles w^(p * N/n), p < m — strided slice of the table,
            # each repeated s times along lanes (broadcast + reshape)
            wp = tw[:, :: N // n][:, :m]  # [16, m]
            if s > 1:
                wp = jnp.broadcast_to(wp[:, :, None], (N_LIMBS, m, s)).reshape(
                    N_LIMBS, half
                )
            top, bot = _butterfly(df, a, b, wp)
            # interleave s-blocks: out[.., i*2s + parity*s + j] for parity 0/1
            stacked = jnp.stack(
                [top.reshape(batch + (N_LIMBS, m, s)), bot.reshape(batch + (N_LIMBS, m, s))],
                axis=-2,
            )  # [..., 16, m, 2, s]
            x = stacked.reshape(batch + (N_LIMBS, N))
            n, s = m, 2 * s
        return x

    def _body(self, x: jax.Array, forward: bool) -> jax.Array:
        """Un-jitted transform incl. the inverse 1/n scaling."""
        out = self._transform(x, forward)
        if not forward:
            out = self.df._mont_mul(out, self.n_inv_mont)
        return out

    def _mapped(self, x: jax.Array, forward: bool) -> jax.Array:
        """Run the transform over fixed-size column chunks (see NTT_CHUNK)."""
        batch = x.shape[:-2]
        tail = x.shape[-2:]
        B = 1
        for d in batch:
            B *= d
        xf = x.reshape((B,) + tail)
        pad = (-B) % NTT_CHUNK
        if pad:
            xf = jnp.pad(xf, ((0, pad), (0, 0), (0, 0)))
        body = (lambda c: self._transform(c, True)) if forward else (
            lambda c: self._transform(c, False)
        )
        out = jax.lax.map(body, xf.reshape((-1, NTT_CHUNK) + tail))
        return out.reshape((-1,) + tail)[:B].reshape(batch + tail)

    def forward(self, coeffs: jax.Array) -> jax.Array:
        """Evaluations at w^i (natural order) from coefficients. Montgomery in/out."""
        return self._fwd(coeffs)

    def inverse(self, evals: jax.Array) -> jax.Array:
        """Coefficients from evaluations, including the 1/n scaling."""
        out = self._bwd(evals)
        return self.df.mont_mul(out, self.n_inv_mont)

    # --- host-chunked batched entry points (compile-shared across callers) ---
    def _chunk_jit(self, forward: bool, b: int):
        key = (forward, b)
        fn = self._chunk_jits.get(key)
        if fn is None:
            fn = jax.jit(lambda c: self._body(c, forward))
            self._chunk_jits[key] = fn
        return fn

    def forward_cols(self, x: jax.Array) -> jax.Array:
        """[C, 16, n] -> [C, 16, n], host-chunked (call OUTSIDE jit)."""
        return dispatch_cols(x, self.CHUNK, lambda b: self._chunk_jit(True, b))

    def inverse_cols(self, x: jax.Array) -> jax.Array:
        return dispatch_cols(x, self.CHUNK, lambda b: self._chunk_jit(False, b))


def new_ntt(df: DeviceField, log_n: int):
    """NTT factory: four-step VMEM-kernel transform for large TPU domains
    (ops/ntt4.py), MXU digit-matmul for small TPU domains (ops/ntt_mxu.py),
    Stockham radix-2 elsewhere. All are bit-exact and API-compatible."""
    import os

    if (
        _use_pallas()
        and log_n >= 12
        and os.environ.get("HALO2_NO_FOURSTEP_NTT") != "1"
    ):
        from .ntt4 import FourStepNTT

        return FourStepNTT(df, log_n)
    if (
        _use_pallas()
        and log_n >= 6
        and os.environ.get("HALO2_NO_MXU_NTT") != "1"
    ):
        from .ntt_mxu import MxuNTT

        return MxuNTT(df, log_n)
    return NTT(df, log_n)


def _butterfly(df: DeviceField, a, b, w):
    """(a + b, (a - b) * w); fused pallas kernel on TPU, XLA elsewhere."""
    if _use_pallas():
        from .pallas_field import ntt_butterfly

        return ntt_butterfly(df, a, b, w)
    return df._add(a, b), df._mont_mul(df._sub(a, b), w)


class CosetNTT:
    """Evaluation over the coset g*H used for the quotient polynomial.

    halo2 evaluates the constraint polynomial on an extended domain shifted by
    the multiplicative generator (zeta in halo2's Domain). Scaling by powers of
    g is a single elementwise Montgomery multiply before/after the NTT.
    Batched over leading dims like NTT.
    """

    def __init__(self, df: DeviceField, log_n: int, shift: int):
        self.ntt = new_ntt(df, log_n)
        self.df = df
        p = df.field.p
        n = 1 << log_n
        self.shift_pows = pows_host(df, shift, n)
        self.shift_inv_pows = pows_host(df, pow(shift, p - 2, p), n)
        self._chunk_jits: dict = {}

    def forward(self, coeffs: jax.Array) -> jax.Array:
        """Evaluate poly at shift * w^i."""
        scaled = self.df.mont_mul(coeffs, self.shift_pows)
        return self.ntt.forward(scaled)

    def inverse(self, evals: jax.Array) -> jax.Array:
        coeffs = self.ntt.inverse(evals)
        return self.df.mont_mul(coeffs, self.shift_inv_pows)

    # --- host-chunked batched entry points -----------------------------------
    def _chunk_jit(self, forward: bool, b: int):
        key = (forward, b)
        fn = self._chunk_jits.get(key)
        if fn is None:
            if forward:
                fn = jax.jit(
                    lambda c: self.ntt._body(
                        self.df._mont_mul(c, self.shift_pows), True
                    )
                )
            else:
                fn = jax.jit(
                    lambda c: self.df._mont_mul(
                        self.ntt._body(c, False), self.shift_inv_pows
                    )
                )
            self._chunk_jits[key] = fn
        return fn

    def forward_cols(self, x: jax.Array) -> jax.Array:
        """[C, 16, n] coeffs -> coset evals, host-chunked (call OUTSIDE jit)."""
        chunk = getattr(self.ntt, "CHUNK", NTT_CHUNK)
        return dispatch_cols(x, chunk, lambda b: self._chunk_jit(True, b))

    def inverse_cols(self, x: jax.Array) -> jax.Array:
        chunk = getattr(self.ntt, "CHUNK", NTT_CHUNK)
        return dispatch_cols(x, chunk, lambda b: self._chunk_jit(False, b))
