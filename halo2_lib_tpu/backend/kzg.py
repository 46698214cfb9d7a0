"""KZG structured reference string (ParamsKZG) + polynomial commitments.

Role of halo2-axiom's `ParamsKZG::<Bn256>::{setup, read, write}` and
`utils::fs::gen_srs` (SURVEY.md §2.9, utils/mod.rs:399-443): a powers-of-tau
SRS over bn254 generated from a seeded RNG and cached on disk under
`params/kzg_bn254_{k}.srs` (env `PARAMS_DIR` respected).

Unlike halo2 we keep only the monomial basis: columns are IFFT'd on device
(cheap NTT over Fr) and committed with the device Pippenger MSM — the
TPU-natural split (commit = one big MSM on the MXU-adjacent VPU path).

SRS generation itself is a device kernel: all n points `tau^i * G` are
produced by one batched MSB-first double-and-add over the bit rows of the
scalar matrix (254 fully-vectorized steps), not n sequential scalar muls.
"""

from __future__ import annotations

import os
import random

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.ec_device import DeviceCurve, msm_device
from ..ops.limbs import N_LIMBS, DeviceField
from ..utils.curves import BN254_G1, BN254_G2
from ..utils.fields import FR_BN254

_SRS_MAGIC = b"H2TPUSRS"


def _params_dir() -> str:
    return os.environ.get("PARAMS_DIR", os.path.join(os.getcwd(), "params"))


class ParamsKZG:
    """Powers-of-tau SRS: g[i] = tau^i * G1, g2, s_g2 = tau * G2."""

    def __init__(self, k: int, g: list, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self.g = g
        self.g2 = g2
        self.s_g2 = s_g2
        self._dc: DeviceCurve | None = None
        self._packed = None

    # --- setup ----------------------------------------------------------------
    @staticmethod
    def setup(k: int, seed: int = 0) -> "ParamsKZG":
        """Generate from tau drawn from a seeded RNG (reference: ChaCha20 seed 0)."""
        rng = random.Random(("kzg-srs", seed, k).__repr__())
        tau = rng.randrange(1, FR_BN254.p)
        n = 1 << k
        # scalars tau^0..tau^{n-1}
        taus = np.empty(n, dtype=object)
        cur = 1
        for i in range(n):
            taus[i] = cur
            cur = cur * tau % FR_BN254.p
        g = _batch_g1_mul(list(taus))
        g2 = BN254_G2.g
        s_g2 = BN254_G2.mul(g2, tau)
        return ParamsKZG(k, g, g2, s_g2)

    # --- disk cache -------------------------------------------------------------
    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(_SRS_MAGIC)
            f.write(self.k.to_bytes(4, "little"))
            for pt in self.g:
                f.write(pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little"))
            for pt in (self.g2, self.s_g2):
                (x, y) = pt
                for c in (x[0], x[1], y[0], y[1]):
                    f.write(c.to_bytes(32, "little"))

    @staticmethod
    def read(path: str) -> "ParamsKZG":
        with open(path, "rb") as f:
            data = f.read()
        assert data[:8] == _SRS_MAGIC, "bad SRS file"
        k = int.from_bytes(data[8:12], "little")
        n = 1 << k
        off = 12
        g = []
        for _ in range(n):
            x = int.from_bytes(data[off : off + 32], "little")
            y = int.from_bytes(data[off + 32 : off + 64], "little")
            g.append((x, y))
            off += 64
        pts2 = []
        for _ in range(2):
            cs = [int.from_bytes(data[off + 32 * i : off + 32 * (i + 1)], "little") for i in range(4)]
            pts2.append(((cs[0], cs[1]), (cs[2], cs[3])))
            off += 128
        return ParamsKZG(k, g, pts2[0], pts2[1])

    # --- commitments ---------------------------------------------------------------
    def device_curve(self) -> DeviceCurve:
        if self._dc is None:
            self._dc = DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)
        return self._dc

    def packed_bases(self):
        if self._packed is None:
            self._packed = self.device_curve().pack_points(self.g)
        return self._packed

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

    def commit_dev(self, coeffs_dev, fr_df, window_bits: int = 8):
        """Commit from a device Montgomery-limb coeff tensor [m, 16], m <= n.

        Window digits are extracted on device from the canonical 16-bit limbs
        (one shift+mask per window) — no host round trip before the MSM.
        Requires window_bits dividing 16.
        """
        assert 16 % window_bits == 0, "window_bits must divide the limb width"
        dc = self.device_curve()
        P = self.packed_bases()
        m = coeffs_dev.shape[0]
        num_windows = -(-254 // window_bits)

        if not hasattr(self, "_digits_jit"):
            per_limb = 16 // window_bits
            mask = (1 << window_bits) - 1

            def _digits(canon):
                outs = []
                for w in range(num_windows):
                    limb = canon[:, w // per_limb]
                    shift = (w % per_limb) * window_bits
                    outs.append(((limb >> shift) & mask).astype(jnp.int32))
                return jnp.stack(outs)  # [W, m]

            self._digits_jit = jax.jit(lambda c: _digits(fr_df.from_mont(c)))
        digits = self._digits_jit(coeffs_dev)
        if m < self.n:
            digits = jnp.pad(digits, ((0, 0), (0, self.n - m)))
        out = msm_device(dc, P, digits, window_bits)
        return dc.unpack_points(out)[0]

    def commit_many(self, polys: list[list[int]], window_bits: int = 8) -> list:
        return [self.commit(p, window_bits) for p in polys]


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
        return ParamsKZG.read(path)
    params = ParamsKZG.setup(k)
    params.write(path)
    return params
