"""Radix-2 NTT over a prime field, Stockham auto-sort formulation.

This is the backend FFT used by the prover for coefficient<->evaluation
conversion and extended-domain (coset) quotient computation — the role of the
radix-2 FFT inside `halo2-axiom`'s `create_proof` (SURVEY.md §2.9).

TPU-first shape choice: Stockham DIF avoids the bit-reversal permutation
entirely — every stage is a reshape + slice + butterfly (add/sub/mont_mul),
which XLA maps onto contiguous VPU work with no gathers. Twiddles for all
stages are strided slices of one length-n/2 table. Multi-chip scaling plan:
split the leading stages across devices and exchange with all_to_all (the
four-step decomposition); see parallel/ntt_sharded.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .limbs import N_LIMBS, DeviceField, _int_to_limbs


class NTT:
    """NTT/INTT of size 2^log_n over df.field (which must have 2-adicity >= log_n)."""

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

        # one twiddle table per direction: w^k (Montgomery form) for k < n/2
        half = self.n // 2
        R = df.R

        def table(root):
            tw = np.zeros((max(half, 1), N_LIMBS), dtype=np.uint32)
            cur = 1
            for k in range(max(half, 1)):
                tw[k] = _int_to_limbs((cur * R) % p)
                cur = cur * root % p
            return jnp.asarray(tw)

        self.tw_fwd = table(w)
        self.tw_inv = table(w_inv)
        self.n_inv_mont = df.pack(self.n_inv)
        self._fwd = jax.jit(lambda x: self._transform(x, True))
        self._bwd = jax.jit(lambda x: self._transform(x, False))

    def _transform(self, x: jax.Array, forward: bool) -> jax.Array:
        """Stockham radix-2 DIF: natural order in, natural order out."""
        df = self.df
        N = self.n
        tw = self.tw_fwd if forward else self.tw_inv
        x = x.reshape(N, 1, N_LIMBS)
        n, s = N, 1
        while n > 1:
            m = n // 2
            a, b = x[:m], x[m:]
            # stage twiddles w^(p * N/n), p < m — a strided slice of the table
            wp = tw[:: N // n][:m]  # [m, N_LIMBS]
            top = df._add(a, b)
            bot = df._mont_mul(df._sub(a, b), wp[:, None, :])
            x = jnp.concatenate([top[:, None], bot[:, None]], axis=1).reshape(m, 2 * s, N_LIMBS)
            n, s = m, 2 * s
        return x.reshape(N, N_LIMBS)

    def forward(self, coeffs: jax.Array) -> jax.Array:
        """Evaluations at w^i (natural order) from coefficients. Montgomery in/out."""
        return self._fwd(coeffs)

    def inverse(self, evals: jax.Array) -> jax.Array:
        """Coefficients from evaluations, including the 1/n scaling."""
        out = self._bwd(evals)
        return self.df.mont_mul(out, self.n_inv_mont)


class CosetNTT:
    """Evaluation over the coset g*H used for the quotient polynomial.

    halo2 evaluates the constraint polynomial on an extended domain shifted by
    the multiplicative generator (zeta in halo2's Domain). Scaling by powers of
    g is a single elementwise Montgomery multiply before/after the NTT.
    """

    def __init__(self, df: DeviceField, log_n: int, shift: int):
        self.ntt = NTT(df, log_n)
        self.df = df
        p = df.field.p
        n = 1 << log_n
        R = df.R
        pw = np.zeros((n, N_LIMBS), dtype=np.uint32)
        cur = 1
        for i in range(n):
            pw[i] = _int_to_limbs((cur * R) % p)
            cur = cur * shift % p
        self.shift_pows = jnp.asarray(pw)
        shift_inv = pow(shift, p - 2, p)
        pwi = np.zeros((n, N_LIMBS), dtype=np.uint32)
        cur = 1
        for i in range(n):
            pwi[i] = _int_to_limbs((cur * R) % p)
            cur = cur * shift_inv % p
        self.shift_inv_pows = jnp.asarray(pwi)

    def forward(self, coeffs: jax.Array) -> jax.Array:
        """Evaluate poly at shift * w^i."""
        scaled = self.df.mont_mul(coeffs, self.shift_pows)
        return self.ntt.forward(scaled)

    def inverse(self, evals: jax.Array) -> jax.Array:
        coeffs = self.ntt.inverse(evals)
        return self.df.mont_mul(coeffs, self.shift_inv_pows)
