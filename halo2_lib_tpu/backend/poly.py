"""Polynomial domain for the PlonKish prover: NTT-backed ops over bn254 Fr.

The role of halo2's `EvaluationDomain`: coefficient <-> Lagrange conversions,
extended-coset evaluation for the quotient polynomial, vanishing-poly division
and Lagrange-basis helpers. Vector math runs on device (JAX uint32-limb
Montgomery, limb-major [..., 16, B] — see ops/limbs.py + ops/ntt.py); scalar
helpers are exact host ints.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.limbs import DeviceField, ints_to_limbs_T, limbs_to_ints, N_LIMBS
from ..ops.ntt import NTT, CosetNTT, new_ntt
from ..utils.fields import FR_BN254

# coset shift for the extended domain (any non-subgroup element; halo2 uses
# zeta * g — we use the multiplicative generator)
COSET_SHIFT = 7
# default extension factor: quotient degree < (cs_degree - 1) * n with
# cs_degree = 4 -> 4n. Constraint systems of higher degree (the q_lookup
# single-column case has a degree-2 lookup input -> cs_degree 5) pass a
# larger factor, exactly like halo2's EvaluationDomain(cs.degree(), k).
EXT_FACTOR = 4


@lru_cache(maxsize=16)
def _domain(k: int, ext_factor: int) -> "Domain":
    return Domain(k, ext_factor)


def domain(k: int, ext_factor: int = EXT_FACTOR) -> "Domain":
    return _domain(k, ext_factor)


class Domain:
    def __init__(self, k: int, ext_factor: int = EXT_FACTOR):
        assert ext_factor & (ext_factor - 1) == 0 and ext_factor >= 2
        self.k = k
        self.n = 1 << k
        self.ext_factor = ext_factor
        self.F = FR_BN254
        self.df = DeviceField(FR_BN254)
        self.ntt = new_ntt(self.df, k)
        self.k_ext = k + (ext_factor.bit_length() - 1)
        self.n_ext = 1 << self.k_ext
        self.coset_ntt = CosetNTT(self.df, self.k_ext, COSET_SHIFT)
        self.omega = self.ntt.omega
        self.omega_inv = self.ntt.omega_inv
        # 1 / Z_H on the extended coset: Z_H(g w_ext^i) = g^n w_ext^{n i} - 1
        p = self.F.p
        g_n = pow(COSET_SHIFT, self.n, p)
        w_ext_n = pow(self.coset_ntt.ntt.omega, self.n, p)  # primitive ext_factor-th root
        vals = []
        cur = g_n
        for i in range(ext_factor):
            vals.append((cur - 1) % p)
            cur = cur * w_ext_n % p
        inv_vals = [pow(v, -1, p) for v in vals]
        # pattern repeats with period ext_factor across the ext points
        full = [inv_vals[i % ext_factor] for i in range(self.n_ext)]
        self.zh_inv_ext = self.pack(full)

    # --- packing -------------------------------------------------------------
    def pack(self, values: list[int]) -> jax.Array:
        """ints -> Montgomery limb-major tensor [16, len]."""
        p = self.F.p
        mont = [(int(v) << 256) % p for v in values]
        return jnp.asarray(ints_to_limbs_T(mont))

    def unpack(self, arr) -> list[int]:
        p = self.F.p
        rinv = pow(1 << 256, -1, p)
        a = np.asarray(jax.device_get(arr))
        a = np.moveaxis(a.reshape(-1, N_LIMBS, a.shape[-1]), 1, 2).reshape(-1, N_LIMBS)
        return [(v * rinv) % p for v in limbs_to_ints(a)]

    # --- conversions -----------------------------------------------------------
    def lagrange_to_coeff(self, evals: jax.Array) -> jax.Array:
        """values on H -> coefficients (device IFFT)."""
        return self.ntt.inverse(evals)

    def coeff_to_lagrange(self, coeffs: jax.Array) -> jax.Array:
        return self.ntt.forward(coeffs)

    def coeff_to_extended(self, coeffs: jax.Array) -> jax.Array:
        """coeffs (len n) -> evals on the 4n coset g*H_ext."""
        padded = jnp.zeros((N_LIMBS, self.n_ext), dtype=jnp.uint32).at[
            :, : coeffs.shape[-1]
        ].set(coeffs)
        return self.coset_ntt.forward(padded)

    def extended_to_coeff(self, evals: jax.Array) -> jax.Array:
        return self.coset_ntt.inverse(evals)

    def divide_by_vanishing(self, ext_evals: jax.Array) -> jax.Array:
        """Multiply extended evals by 1/Z_H (exact when divisible)."""
        return self.df.mont_mul(ext_evals, self.zh_inv_ext)

    # --- device elementwise ---------------------------------------------------------
    def mul(self, a, b):
        return self.df.mont_mul(a, b)

    def add(self, a, b):
        return self.df.add(a, b)

    def sub(self, a, b):
        return self.df.sub(a, b)

    def rotate_ext(self, ext_evals: jax.Array, rotation: int) -> jax.Array:
        """Rotation by w^rotation on the n-domain = roll by ext_factor * rotation."""
        return jnp.roll(ext_evals, -self.ext_factor * rotation, axis=-1)

    def const_ext(self, c: int) -> jax.Array:
        """Constant c broadcast over the extended domain."""
        return jnp.broadcast_to(self.pack([c]), (N_LIMBS, self.n_ext))

    def const_h(self, c: int) -> jax.Array:
        """Constant c broadcast over the base domain H."""
        return jnp.broadcast_to(self.pack([c]), (N_LIMBS, self.n))

    # --- jitted scan helpers (eager associative_scan dispatches every level's
    # primitives one by one — catastrophic on remote backends) ----------------
    def prefix_prod(self, x: jax.Array) -> jax.Array:
        """Inclusive Montgomery prefix product along the lane axis (jitted)."""
        if not hasattr(self, "_prefix_prod_jit"):
            self._prefix_prod_jit = jax.jit(
                lambda v: jax.lax.associative_scan(self.df._mont_mul, v, axis=v.ndim - 1)
            )
        return self._prefix_prod_jit(x)

    def pows_of(self, x_mont: jax.Array, m: int) -> jax.Array:
        """[16, m] powers 1, x, ..., x^{m-1} from a Montgomery scalar [16, 1]
        (jitted log-depth scan)."""
        if not hasattr(self, "_pows_jit"):
            one_np = self.df.ONE_MONT  # numpy: convert INSIDE the traced body.
            # (jnp.asarray here would produce a tracer when pows_of is first
            # called inside an enclosing jit trace; caching that tracer in the
            # closure leaks it into every later call.)

            def _pows(xm, m):
                one = jnp.asarray(one_np)[:, None]
                base = jnp.broadcast_to(xm.reshape(N_LIMBS, 1), (N_LIMBS, m))
                stacked = jnp.concatenate([one, base[:, :-1]], axis=1)
                return jax.lax.associative_scan(self.df._mont_mul, stacked, axis=1)

            self._pows_jit = jax.jit(_pows, static_argnums=1)
        return self._pows_jit(x_mont, m)

    # --- device scalar-power helpers ------------------------------------------------
    def omega_pows_dev(self) -> jax.Array:
        """[16, n] Montgomery values of the domain points w^i (cached; host
        power chain — see ops/ntt.py pows_host for why not a device scan)."""
        if not hasattr(self, "_omega_pows_dev"):
            from ..ops.ntt import pows_host

            self._omega_pows_dev = pows_host(self.df, self.omega, self.n)
        return self._omega_pows_dev

    def pows_dev(self, x: int, m: int) -> jax.Array:
        """[16, m] powers 1, x, ..., x^{m-1} via a jitted log-depth scan."""
        return self.pows_of(self.pack([x]), m)

    def eval_many_at(self, coeff_stack: jax.Array, x: int) -> list[int]:
        """Evaluate a stack of coeff polys [m, 16, n] at scalar x; host ints out."""
        xp = self.pows_dev(x, coeff_stack.shape[-1])
        prods = self.df.mont_mul(coeff_stack, xp[None])
        # log-depth sum over the lane axis
        s = prods
        while s.shape[-1] > 1:
            half = s.shape[-1] // 2
            red = self.df.add(s[..., :half], s[..., half : 2 * half])
            if s.shape[-1] % 2:
                red = jnp.concatenate(
                    [self.df.add(red[..., :1], s[..., -1:]), red[..., 1:]], axis=-1
                )
            s = red
        return self.unpack(s)

    # --- host scalar helpers -------------------------------------------------------
    def eval_coeffs_host(self, coeffs: list[int], x: int) -> int:
        """Horner evaluation with exact ints."""
        p = self.F.p
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        return acc

    def lagrange_evals_host(self, indices: list[int], x: int) -> dict[int, int]:
        """L_i(x) = (w^i / n) * (x^n - 1) / (x - w^i) for the given rows."""
        p = self.F.p
        xn = pow(x, self.n, p)
        zh = (xn - 1) % p
        n_inv = pow(self.n, -1, p)
        out = {}
        for i in indices:
            wi = pow(self.omega, i, p)
            out[i] = wi * n_inv % p * zh % p * pow((x - wi) % p, -1, p) % p
        return out

    def l0_host(self, x: int) -> int:
        return self.lagrange_evals_host([0], x)[0]
