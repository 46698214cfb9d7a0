"""Radix-2 NTT over a prime field, Stockham auto-sort formulation.

This is the backend FFT used by the prover for coefficient<->evaluation
conversion and extended-domain (coset) quotient computation — the role of the
radix-2 FFT inside `halo2-axiom`'s `create_proof` (SURVEY.md §2.9).

TPU-first shape choice: Stockham DIF avoids the bit-reversal permutation
entirely — every stage is a slice + butterfly (add/sub/mont_mul) + block
interleave on the flat LANE axis of limb-major ``[..., 16, N]`` tensors
(see ops/limbs.py for the layout rationale). Twiddles for all stages are
strided slices of one length-n/2 table, generated ON DEVICE by a log-depth
power scan (no O(n) host bigint loops). All transforms accept arbitrary
leading batch dims — the prover converts every column of a proof in ONE
dispatch ([C, 16, n] tensors), which matters doubly on remote-tunnel
backends where each dispatch costs a host round trip.

Multi-chip scaling: the leading stages split across devices and exchange
with all_to_all (four-step decomposition); see parallel/sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .limbs import N_LIMBS, DeviceField, _use_pallas


# Fixed column-chunk for batched transforms. All batched NTT calls are
# routed through a lax.map over [CHUNK, 16, n] blocks, so the (large,
# log n-stage) butterfly graph is traced/compiled ONCE per n — independent
# of how many columns a circuit has. Without this, every distinct column
# count is a separate multi-minute XLA compile of an unrolled 15-17 stage
# Montgomery graph (and a separate persistent-cache entry).
NTT_CHUNK = 8


class NTT:
    """NTT/INTT of size 2^log_n over df.field (which must have 2-adicity >= log_n).

    Operates on ``uint32[..., 16, n]`` Montgomery limb-major tensors; any
    leading batch dims are transformed independently in the same dispatch.
    """

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
        # twiddle tables are built EAGERLY (device power scan): building them
        # lazily inside a jit trace would cache tracers
        half = max(self.n // 2, 1)
        self._tw = {True: _pows_device(df, w, half), False: _pows_device(df, w_inv, half)}
        self.n_inv_mont = df.pack(self.n_inv)
        self._fwd = jax.jit(lambda x: self._mapped(x, True))
        self._bwd = jax.jit(lambda x: self._mapped(x, False))

    def _table(self, forward: bool) -> jax.Array:
        """[16, n/2] Montgomery twiddles w^k."""
        return self._tw[forward]

    def _transform(self, x: jax.Array, forward: bool) -> jax.Array:
        """Stockham radix-2 DIF: natural order in, natural order out.

        x: [..., 16, N] limb-major; batch dims transform independently.
        Stage (n, s) with m = n/2: element (i < m, j < s) pairs lanes
        i*s + j and (m+i)*s + j — the two contiguous lane halves — and the
        interleave writes top/bot back at block granularity s.
        """
        df = self.df
        N = self.n
        tw = self._table(forward)
        batch = x.shape[:-2]
        n, s = N, 1
        while n > 1:
            m = n // 2
            half = N // 2
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


def new_ntt(df: DeviceField, log_n: int):
    """NTT factory: MXU digit-matmul transform on TPU (ops/ntt_mxu.py),
    Stockham radix-2 elsewhere. Both are bit-exact and API-compatible."""
    import os

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


def _pows_device(df: DeviceField, root: int, m: int) -> jax.Array:
    """[16, m] Montgomery powers 1, root, ..., root^{m-1} via log-depth scan."""
    one = jnp.asarray(df.ONE_MONT)[:, None]
    if m == 1:
        return one
    base = jnp.broadcast_to(df.pack(root), (N_LIMBS, m))
    stacked = jnp.concatenate([one, base[:, :-1]], axis=1)
    return jax.jit(
        lambda v: jax.lax.associative_scan(df._mont_mul, v, axis=1)
    )(stacked)


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
        self.shift_pows = _pows_device(df, shift, n)
        self.shift_inv_pows = _pows_device(df, pow(shift, p - 2, p), n)

    def forward(self, coeffs: jax.Array) -> jax.Array:
        """Evaluate poly at shift * w^i."""
        scaled = self.df.mont_mul(coeffs, self.shift_pows)
        return self.ntt.forward(scaled)

    def inverse(self, evals: jax.Array) -> jax.Array:
        coeffs = self.ntt.inverse(evals)
        return self.df.mont_mul(coeffs, self.shift_inv_pows)
