"""KZG structured reference string (ParamsKZG) + polynomial commitments.

Role of halo2-axiom's `ParamsKZG::<Bn256>::{setup, read, write}` and
`utils::fs::gen_srs` (SURVEY.md §2.9, utils/mod.rs:399-443): a powers-of-tau
SRS over bn254 generated from a seeded RNG and cached on disk under
`params/kzg_bn254_{k}.srs` (env `PARAMS_DIR` respected).

TPU-first commitment design: like halo2's ParamsKZG we keep BOTH bases —
`g` (monomial, tau^i G) and `g_lagrange` (L_i(tau) G). Columns arriving in
evaluation (Lagrange) form commit directly against `g_lagrange` with NO IFFT;
coefficient-form polynomials (quotient pieces, SHPLONK openings) use `g`.
All commitments go through the batched device MSM (ops/ec_device.py
msm_many_device): a whole transcript phase's columns are one dispatch.

SRS generation itself is a device kernel: all n points `tau^i * G` (and the
Lagrange-basis points) are produced by one batched MSB-first double-and-add
over the bit rows of the scalar matrix, not n sequential scalar muls.
"""

from __future__ import annotations

import os
import random

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.ec_device import DeviceCurve, msm_device, msm_many_device
from ..ops.limbs import N_LIMBS, DeviceField
from ..utils.curves import BN254_G1, BN254_G2
from ..utils.fields import FR_BN254

# Column-chunk width for the shared commit jit (see ParamsKZG.commit_columns).
COMMIT_CHUNK = 8

_SRS_MAGIC_V1 = b"H2TPUSRS"
_SRS_MAGIC_V2 = b"H2TPUSR2"  # v2: adds the Lagrange basis
_SRS_MAGIC = b"H2TPUSR3"  # v3: tau drawn from ChaCha20Rng(seed 0), like the reference


def _params_dir() -> str:
    return os.environ.get("PARAMS_DIR", os.path.join(os.getcwd(), "params"))


def _batch_inv_host(vals: list[int], p: int) -> list[int]:
    """Montgomery-trick batch inversion with exact host ints."""
    n = len(vals)
    pref = [1] * (n + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % p
    inv_all = pow(pref[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pref[i] * inv_all % p
        inv_all = inv_all * vals[i] % p
    return out


def _lagrange_scalars(tau: int, k: int) -> list[int]:
    """L_i(tau) = omega^i (tau^n - 1) / (n (tau - omega^i)) for i < n."""
    p = FR_BN254.p
    n = 1 << k
    w = FR_BN254.nth_root_of_unity(k)
    wi = [1] * n
    for i in range(1, n):
        wi[i] = wi[i - 1] * w % p
    zh = (pow(tau, n, p) - 1) % p
    n_inv = pow(n, -1, p)
    denoms = [(tau - x) % p for x in wi]
    invs = _batch_inv_host(denoms, p)
    scale = zh * n_inv % p
    return [wi[i] * scale % p * invs[i] % p for i in range(n)]


class ParamsKZG:
    """Powers-of-tau SRS: g[i] = tau^i G1, g_lagrange[i] = L_i(tau) G1,
    g2, s_g2 = tau G2."""

    def __init__(self, k: int, g: list, g_lagrange: list, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self.g = g
        self.g_lagrange = g_lagrange
        self.g2 = g2
        self.s_g2 = s_g2
        self._dc: DeviceCurve | None = None
        self._packed = None
        self._packed_affine = None
        self._lag_affine = None
        self._commit_jits: dict = {}

    # --- setup ----------------------------------------------------------------
    @staticmethod
    def setup(k: int, seed: int | None = None) -> "ParamsKZG":
        """Generate the powers-of-tau SRS.

        With the default seed, tau is drawn EXACTLY as the reference's
        `ParamsKZG::<Bn256>::setup(k, ChaCha20Rng::from_seed(Default))`
        draws it (utils/mod.rs:441, one `Fr::random` from the zero seed) —
        so the group elements g[i] = tau^i G match a Rust-generated SRS
        point-for-point. Pass an int seed for a throwaway test SRS.
        """
        if seed is None:
            from ..utils.chacha import reference_srs_tau

            tau = reference_srs_tau()
        else:
            rng = random.Random(("kzg-srs", seed, k).__repr__())
            tau = rng.randrange(1, FR_BN254.p)
        n = 1 << k
        # scalars tau^0..tau^{n-1}
        taus = [1] * n
        for i in range(1, n):
            taus[i] = taus[i - 1] * tau % FR_BN254.p
        g = _batch_g1_mul(taus)
        g_lagrange = _batch_g1_mul(_lagrange_scalars(tau, k))
        g2 = BN254_G2.g
        s_g2 = BN254_G2.mul(g2, tau)
        return ParamsKZG(k, g, g_lagrange, g2, s_g2)

    # --- disk cache -------------------------------------------------------------
    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(_SRS_MAGIC)
            f.write(self.k.to_bytes(4, "little"))
            for basis in (self.g, self.g_lagrange):
                for pt in basis:
                    f.write(pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little"))
            for pt in (self.g2, self.s_g2):
                (x, y) = pt
                for c in (x[0], x[1], y[0], y[1]):
                    f.write(c.to_bytes(32, "little"))

    @staticmethod
    def read(path: str) -> "ParamsKZG":
        with open(path, "rb") as f:
            data = f.read()
        if data[:8] in (_SRS_MAGIC_V1, _SRS_MAGIC_V2):
            raise ValueError("stale SRS file format; regenerate")
        assert data[:8] == _SRS_MAGIC, "bad SRS file"
        k = int.from_bytes(data[8:12], "little")
        n = 1 << k
        off = 12
        bases = []
        for _ in range(2):
            pts = []
            for _ in range(n):
                x = int.from_bytes(data[off : off + 32], "little")
                y = int.from_bytes(data[off + 32 : off + 64], "little")
                pts.append((x, y))
                off += 64
            bases.append(pts)
        pts2 = []
        for _ in range(2):
            cs = [int.from_bytes(data[off + 32 * i : off + 32 * (i + 1)], "little") for i in range(4)]
            pts2.append(((cs[0], cs[1]), (cs[2], cs[3])))
            off += 128
        return ParamsKZG(k, bases[0], bases[1], pts2[0], pts2[1])

    # --- commitments ---------------------------------------------------------------
    def device_curve(self) -> DeviceCurve:
        if self._dc is None:
            self._dc = DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)
        return self._dc

    def packed_bases(self):
        if self._packed is None:
            self._packed = self.device_curve().pack_points(self.g)
        return self._packed

    def affine_bases(self):
        """(Ax, Ay) monomial bases for msm_many_device."""
        if self._packed_affine is None:
            self._packed_affine = self.device_curve().pack_points_affine(self.g)
        return self._packed_affine

    def affine_lagrange_bases(self):
        """(Ax, Ay) Lagrange bases for msm_many_device."""
        if self._lag_affine is None:
            self._lag_affine = self.device_curve().pack_points_affine(self.g_lagrange)
        return self._lag_affine

    def _commit_chunk_jit(self, fr_df, m: int, window_bits: int):
        """One jitted `[b, 16, m] columns + bases -> [b, 33] packed affine`
        executable per (m, window_bits), shared by every chunk size via the
        leading-axis shape (chunk widths are pow2-bucketed by the caller)."""
        key = (m, window_bits)
        fn = self._commit_jits.get(key)
        if fn is None:
            dc = self.device_curve()
            df = dc.df
            n_srs = self.n

            def body(chunk, Ax, Ay):
                digits = window_digits(fr_df, chunk, window_bits)
                if m < n_srs:
                    digits = jnp.pad(digits, ((0, 0), (0, 0), (0, n_srs - m)))
                X, Y, Z = msm_many_device(dc, (Ax, Ay), digits, window_bits, True)
                inf = df.is_zero(Z)  # [b]
                zinv = df._batch_inv(Z)
                zi2 = df._mont_mul(zinv, zinv)
                ax = df._mont_mul(X, zi2)
                ay = df._mont_mul(Y, df._mont_mul(zi2, zinv))
                # [b, 33]: x limbs | y limbs | inf flag
                return jnp.concatenate(
                    [
                        df._from_mont(ax),
                        df._from_mont(ay),
                        inf.astype(jnp.uint32)[None, :],
                    ],
                    axis=0,
                ).transpose(1, 0)

            fn = jax.jit(body)
            self._commit_jits[key] = fn
        return fn

    def commit_columns(self, fr_df, vals_mont, bases, window_bits: int = 8):
        """[C, 16, m] Montgomery columns -> packed uint32[C, 33] canonical
        affine commitments (x limbs | y limbs | inf flag) over C.

        Dispatched from the host in COMMIT_CHUNK-column chunks: every chunk
        of every caller (keygen, all prover stages, both bases — Lagrange /
        monomial, passed as runtime args) reuses ONE compiled Pippenger MSM
        per (m, window_bits, chunk size). Inlining a column-count-specialized
        MSM copy into each stage jit was the bulk of the cold-compile bill,
        and even a lax.map-over-chunks design recompiled the whole MSM for
        every distinct chunk COUNT. The packed single-array result keeps the
        host fetch to ONE transfer (each device->host round trip costs
        ~30 ms on tunneled backends)."""
        from ..ops.ntt import dispatch_cols

        C = vals_mont.shape[0]
        if C == 0:
            return jnp.zeros((0, 33), jnp.uint32)
        fn = self._commit_chunk_jit(fr_df, vals_mont.shape[2], window_bits)
        return dispatch_cols(
            vals_mont, COMMIT_CHUNK, lambda b: (lambda v: fn(v, bases[0], bases[1]))
        )

    def commit_many_inside(self, fr_df, vals_mont, lagrange: bool, window_bits: int = 8, bases=None):
        """Traceable batched commitment: [C, 16, m] Montgomery column values
        (evaluation form if `lagrange`, else coefficients) -> [C] Jacobian
        points ([16, C] coords). Safe to call inside a larger jit (no host
        sync). Uses the no-doubling mixed add (SRS bases are distinct).

        Pass `bases` explicitly when calling from inside another jit —
        fetching them here would bake them into the caller's executable as
        compile-time constants."""
        C, _, m = vals_mont.shape
        digits = window_digits(fr_df, vals_mont, window_bits)  # [C, W, m]
        if m < self.n:
            digits = jnp.pad(digits, ((0, 0), (0, 0), (0, self.n - m)))
        A = bases if bases is not None else (
            self.affine_lagrange_bases() if lagrange else self.affine_bases()
        )
        return msm_many_device(self.device_curve(), A, digits, window_bits, True)

    def commit(self, coeffs: list[int], window_bits: int = 8):
        """Commit to a polynomial in coefficient form: MSM(g, coeffs) -> affine point."""
        assert len(coeffs) <= self.n
        dc = self.device_curve()
        P = self.packed_bases()
        if len(coeffs) < self.n:
            coeffs = list(coeffs) + [0] * (self.n - len(coeffs))
        digits = dc.pack_scalars(coeffs, window_bits)
        out = msm_device(dc, P, digits, window_bits)
        return dc.unpack_points(out)[0]

    def commit_lagrange(self, evals: list[int], window_bits: int = 8):
        """Commit to a polynomial given by its evaluations on H (no IFFT)."""
        assert len(evals) <= self.n
        dc = self.device_curve()
        P = dc.pack_points(self.g_lagrange)
        if len(evals) < self.n:
            evals = list(evals) + [0] * (self.n - len(evals))
        digits = dc.pack_scalars(evals, window_bits)
        out = msm_device(dc, P, digits, window_bits)
        return dc.unpack_points(out)[0]

    def commit_dev(self, coeffs_dev, fr_df, window_bits: int = 8):
        """Commit from a device Montgomery coeff tensor [16, m], m <= n."""
        out = self.commit_many_inside(fr_df, coeffs_dev[None], False, window_bits)
        dc = self.device_curve()
        return dc.unpack_points(out)[0]

    def commit_many(self, polys: list[list[int]], window_bits: int = 8) -> list:
        return [self.commit(p, window_bits) for p in polys]


def window_digits(fr_df: DeviceField, vals_mont, window_bits: int = 8):
    """[..., 16, m] Montgomery scalars -> int32[..., W, m] window digits.

    Pure device math (traceable): one from_mont plus shift/mask per window.
    `window_bits` must divide the 16-bit limb width.
    """
    assert 16 % window_bits == 0, "window_bits must divide the limb width"
    per_limb = 16 // window_bits
    mask = (1 << window_bits) - 1
    num_windows = -(-254 // window_bits)
    canon = fr_df._from_mont(vals_mont)  # [..., 16, m]
    outs = []
    for w in range(num_windows):
        limb = canon[..., w // per_limb, :]
        shift = (w % per_limb) * window_bits
        outs.append(((limb >> shift) & mask).astype(jnp.int32))
    return jnp.stack(outs, axis=-2)  # [..., W, m]


def _batch_g1_mul(scalars: list[int]):
    """[s * G1 for s in scalars] via device batched double-and-add."""
    n = len(scalars)
    dc = DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)
    nbits = FR_BN254.num_bits
    bits = np.zeros((nbits, n), dtype=bool)
    for i, s in enumerate(scalars):
        s = int(s) % FR_BN254.p
        for b in range(nbits):
            bits[b, i] = (s >> (nbits - 1 - b)) & 1  # MSB first
    bits = jnp.asarray(bits)
    G = dc.pack_points([BN254_G1.g] * n)

    @jax.jit
    def run(bits):
        acc = dc.identity((n,))

        def step(acc, brow):
            acc = dc._double(acc)
            added = dc._add(acc, G)
            acc = dc.select(brow, added, acc)
            return acc, None

        acc, _ = jax.lax.scan(step, acc, bits)
        return acc

    return dc.unpack_points(run(bits))


def gen_srs(k: int) -> ParamsKZG:
    """Read-or-create `params/kzg_bn254_{k}.srs` (utils/mod.rs:437-443)."""
    path = os.path.join(_params_dir(), f"kzg_bn254_{k}.srs")
    if os.path.exists(path):
        try:
            return ParamsKZG.read(path)
        except ValueError:
            pass  # stale v1 file: regenerate below
    params = ParamsKZG.setup(k)
    params.write(path)
    return params
