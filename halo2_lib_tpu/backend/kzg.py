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

from ..ops.ec_device import DeviceCurve, msm_device, msm_many_device, msm_window_bits
from ..ops.limbs import N_LIMBS, DeviceField
from ..utils.curves import BN254_G1, BN254_G2, FQ2_BN254, BN254_G2_B
from ..utils.fields import FQ_BN254, FR_BN254

# Column-chunk width for the shared commit jit (see ParamsKZG.commit_columns).
COMMIT_CHUNK = 8

# Compile-light commit path for small columns: batched MSB-first
# double-and-add over the scalar bit rows costs ~8x the field multiplies of
# Pippenger but traces every EC op exactly ONCE — on a cold host the
# Pippenger executable is minutes of XLA compile (measured 270 s for the
# k=8 keygen dispatch on an 8-CPU mesh), which dominated the prover test
# tier and the multichip dryrun. At m <= this bound the runtime difference
# is milliseconds; the big-m benches keep the Pippenger kernel.
COMMIT_SIMPLE_MAX = int(os.environ.get("HALO2_COMMIT_SIMPLE_MAX", "1024"))

_SRS_MAGIC_V1 = b"H2TPUSRS"
_SRS_MAGIC_V2 = b"H2TPUSR2"  # v2: adds the Lagrange basis
_SRS_MAGIC = b"H2TPUSR3"  # v3: tau drawn from ChaCha20Rng(seed 0), like the reference


def _params_dir() -> str:
    return os.environ.get("PARAMS_DIR", os.path.join(os.getcwd(), "params"))


# --- halo2curves point encodings (Processed format) -------------------------
# Compressed G1: 32 bytes canonical x LE, y-parity in bit 255; identity =
# all-zero. Compressed G2: 64 bytes x.c0 || x.c1 LE, y.c0-parity in bit 511.
# (halo2curves-axiom new_curve_impl to_bytes/from_bytes.)


def _g1_compress(pt) -> bytes:
    if pt is None:
        return b"\x00" * 32
    raw = bytearray(pt[0].to_bytes(32, "little"))
    if pt[1] & 1:
        raw[31] |= 0x80
    return bytes(raw)


def _g1_decompress(raw: bytes):
    if raw == b"\x00" * 32:
        return None
    q = FQ_BN254.p
    sign = (raw[31] >> 7) & 1
    x = int.from_bytes(raw[:31] + bytes([raw[31] & 0x7F]), "little")
    if x >= q:
        raise ValueError("SRS: non-canonical G1 x")
    rhs = (x * x * x + BN254_G1.b) % q
    y = pow(rhs, (q + 1) // 4, q)
    if y * y % q != rhs:
        raise ValueError("SRS: G1 point not on curve")
    if (y & 1) != sign:
        y = q - y
    return (x, y)


def _g2_compress(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    (x, y) = pt
    raw = bytearray(x[0].to_bytes(32, "little") + x[1].to_bytes(32, "little"))
    if y[0] & 1:
        raw[63] |= 0x80
    return bytes(raw)


def _fq2_sqrt(a):
    """sqrt in Fq[u]/(u^2+1), q = 3 mod 4 (complex method); None if non-residue."""
    F = FQ_BN254
    q = F.p
    a0, a1 = a
    if a1 == 0:
        r = F.sqrt(a0)
        if r is not None:
            return (r, 0)
        r = F.sqrt((-a0) % q)  # a0 = -r^2 -> sqrt = r * u
        return None if r is None else (0, r)
    alpha = (a0 * a0 + a1 * a1) % q  # norm (u^2 = -1)
    delta = F.sqrt(alpha)
    if delta is None:
        return None
    inv2 = pow(2, -1, q)
    x0sq = (a0 + delta) * inv2 % q
    x0 = F.sqrt(x0sq)
    if x0 is None:
        x0sq = (a0 - delta) * inv2 % q
        x0 = F.sqrt(x0sq)
        if x0 is None:
            return None
    x1 = a1 * pow(2 * x0 % q, -1, q) % q
    return (x0, x1)


def _g2_decompress(raw: bytes):
    if raw == b"\x00" * 64:
        return None
    q = FQ_BN254.p
    sign = (raw[63] >> 7) & 1
    x0 = int.from_bytes(raw[:32], "little")
    x1 = int.from_bytes(raw[32:63] + bytes([raw[63] & 0x7F]), "little")
    if x0 >= q or x1 >= q:
        raise ValueError("SRS: non-canonical G2 x")
    f = FQ2_BN254
    x = (x0, x1)
    rhs = f.add(f.mul(f.square(x), x), BN254_G2_B)
    y = _fq2_sqrt(rhs)
    if y is None:
        raise ValueError("SRS: G2 point not on curve")
    if (y[0] & 1) != sign:
        y = f.neg(y)
    return (x, y)


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
    # On-disk format: halo2-axiom's `ParamsKZG::<Bn256>::write` (RawBytes),
    # byte-for-byte — `k` as u32 LE, then `g`, `g_lagrange` as 64-byte raw
    # points (x, y each 32 bytes LE in MONTGOMERY form, R = 2^256), then
    # `g2`, `s_g2` as 128-byte raw G2 points (x.c0, x.c1, y.c0, y.c1).
    # Files written by the reference's `gen_srs` load here and vice versa
    # (halo2-axiom kzg/commitment.rs write_custom; SerdeObject::write_raw
    # writes the internal Montgomery limbs). `read` additionally accepts
    # halo2's Processed format (32-byte compressed points, canonical form)
    # and this repo's legacy H2TPUSR3 container.

    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(self.to_halo2_bytes())

    def to_halo2_bytes(self, raw: bool = True) -> bytes:
        q = FQ_BN254.p
        out = bytearray(self.k.to_bytes(4, "little"))
        if raw:
            enc = lambda c: ((c << 256) % q).to_bytes(32, "little")
            for basis in (self.g, self.g_lagrange):
                for pt in basis:
                    out += enc(pt[0]) + enc(pt[1])
            for (x, y) in (self.g2, self.s_g2):
                out += enc(x[0]) + enc(x[1]) + enc(y[0]) + enc(y[1])
        else:  # Processed: compressed canonical points (halo2curves to_bytes)
            for basis in (self.g, self.g_lagrange):
                for pt in basis:
                    out += _g1_compress(pt)
            for pt in (self.g2, self.s_g2):
                out += _g2_compress(pt)
        return bytes(out)

    @staticmethod
    def from_halo2_bytes(data: bytes) -> "ParamsKZG":
        q = FQ_BN254.p
        k = int.from_bytes(data[:4], "little")
        if not (1 <= k <= 28):
            raise ValueError(f"SRS header: implausible k={k}")
        n = 1 << k
        raw_size = 4 + 2 * n * 64 + 2 * 128
        proc_size = 4 + 2 * n * 32 + 2 * 64
        if len(data) == raw_size:
            rinv = pow(1 << 256, -1, q)
            dec = lambda off: int.from_bytes(data[off : off + 32], "little") * rinv % q
            bases = []
            off = 4
            for _ in range(2):
                pts = []
                for _ in range(n):
                    pts.append((dec(off), dec(off + 32)))
                    off += 64
                bases.append(pts)
            pts2 = []
            for _ in range(2):
                cs = [dec(off + 32 * i) for i in range(4)]
                pts2.append(((cs[0], cs[1]), (cs[2], cs[3])))
                off += 128
        elif len(data) == proc_size:
            bases = []
            off = 4
            for _ in range(2):
                pts = []
                for _ in range(n):
                    pts.append(_g1_decompress(data[off : off + 32]))
                    off += 32
                bases.append(pts)
            pts2 = []
            for _ in range(2):
                pts2.append(_g2_decompress(data[off : off + 64]))
                off += 64
        else:
            raise ValueError("SRS file size matches neither RawBytes nor Processed")
        return ParamsKZG(k, bases[0], bases[1], pts2[0], pts2[1])

    @staticmethod
    def read(path: str) -> "ParamsKZG":
        with open(path, "rb") as f:
            data = f.read()
        if data[:8] in (_SRS_MAGIC_V1, _SRS_MAGIC_V2):
            raise ValueError("stale SRS file format; regenerate")
        if data[:8] == _SRS_MAGIC:  # legacy repo container
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
                cs = [
                    int.from_bytes(data[off + 32 * i : off + 32 * (i + 1)], "little")
                    for i in range(4)
                ]
                pts2.append(((cs[0], cs[1]), (cs[2], cs[3])))
                off += 128
            return ParamsKZG(k, bases[0], bases[1], pts2[0], pts2[1])
        return ParamsKZG.from_halo2_bytes(data)

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

    # --- native (C, threaded Pippenger) commitment path --------------------
    # The role of halo2-axiom's rayon-parallel commit MSMs. Two wins:
    #  * host-resident columns (witness ints) commit with ZERO device traffic
    #    and overlap the async device upload/to_mont of the same columns;
    #  * no XLA compile at all — the device MSM executable alone is minutes
    #    of cold XLA:CPU compile, which dominated the test tier and the
    #    multichip dryrun.

    def _native_msm(self):
        if os.environ.get("HALO2_HOST_MSM") == "0":
            return None
        from ..native import get_native

        nat = get_native()
        return nat if nat is not None and hasattr(nat, "msm_commit") else None

    def _host_msm_wanted(self, m: int, ncols: int = 1) -> bool:
        """Heuristic for DEVICE-resident columns: always on CPU backends
        (compile cost rules); elsewhere only when the device->host fetch is
        small (measured on the tunneled TPU: the native path beats the
        device MSM for single 2^15 columns — SHPLONK openings — but the
        multi-column z fetch loses by 2x)."""
        if self._native_msm() is None:
            return False
        if os.environ.get("HALO2_HOST_MSM") == "1":
            return True
        import jax

        if jax.default_backend() == "cpu":
            return True
        # Since the window-13 rework the device MSM beats fetch+native even
        # for single 2^15 columns (a 2 MB fetch costs ~70 ms at tunnel
        # bandwidth vs ~30 ms device); device-born columns stay on device.
        return ncols * m <= int(os.environ.get("HALO2_HOST_MSM_FETCH_MAX", "0"))

    def host_ints_commit_wanted(self, m: int) -> bool:
        """Host-resident int columns: no fetch needed, so the native path is
        preferred up to a size bound (threads overlap the async device
        upload of the same columns)."""
        if self._native_msm() is None:
            return False
        if os.environ.get("HALO2_HOST_MSM") == "1":
            return True
        return m <= int(os.environ.get("HALO2_HOST_MSM_INTS_MAX", "65536"))

    def _msm_base_blob(self, lagrange: bool) -> bytes:
        attr = "_base_blob_lag" if lagrange else "_base_blob_mono"
        blob = getattr(self, attr, None)
        if blob is None:
            nat = self._native_msm()
            pts = self.g_lagrange if lagrange else self.g
            xy = nat.pack_limbs16([c for pt in pts for c in pt])
            q = FQ_BN254.p
            blob = nat.msm_pack_bases(
                q.to_bytes(32, "little"),
                (pow(2, 512, q)).to_bytes(32, "little"),
                xy,
            )
            setattr(self, attr, blob)
        return blob

    def commit_host_ints(self, cols: list[list[int]], lagrange: bool):
        """Commit host int columns via the native threaded Pippenger.

        Returns uint32[C, 33] (x|y 16-bit limbs + inf flag), the same packed
        layout as commit_columns. None if the native engine is unavailable."""
        import numpy as np

        nat = self._native_msm()
        if nat is None:
            return None
        if not cols:
            return np.zeros((0, 33), dtype=np.uint32)
        m = len(cols[0])
        q = FQ_BN254.p
        scal = nat.pack_limbs16([v for col in cols for v in col])
        out = nat.msm_commit(
            q.to_bytes(32, "little"),
            (pow(2, 512, q)).to_bytes(32, "little"),
            self._msm_base_blob(lagrange),
            scal,
            m,
            len(cols),
            os.cpu_count() or 4,
        )
        return np.frombuffer(out, dtype="<u4").reshape(len(cols), 33)

    _FROM_MONT_JITS: dict = {}

    def _commit_host_tensor(self, fr_df, vals_mont, lagrange: bool):
        """Device Montgomery columns [C, 16, m] -> native commit (fetch +
        de-mont; used where the column was computed on device)."""
        import numpy as np

        import jax

        from ..ops.ntt import dispatch_cols

        nat = self._native_msm()
        key = fr_df.p_int
        fn = ParamsKZG._FROM_MONT_JITS.get(key)
        if fn is None:
            fn = jax.jit(fr_df._from_mont)
            ParamsKZG._FROM_MONT_JITS[key] = fn
        canon = dispatch_cols(vals_mont, COMMIT_CHUNK, lambda b: fn)
        arr = np.asarray(jax.device_get(canon))  # [C, 16, m] u32 canonical
        C, _, m = arr.shape
        scal = np.ascontiguousarray(arr.transpose(0, 2, 1)).astype("<u2").tobytes()
        q = FQ_BN254.p
        out = nat.msm_commit(
            q.to_bytes(32, "little"),
            (pow(2, 512, q)).to_bytes(32, "little"),
            self._msm_base_blob(lagrange),
            scal,
            m,
            C,
            os.cpu_count() or 4,
        )
        return np.frombuffer(out, dtype="<u4").reshape(C, 33)

    def _commit_chunk_jit(self, fr_df, m: int, window_bits: int):
        """One jitted `[b, 16, m] columns + bases -> [b, 33] packed affine`
        executable per (m, window_bits), shared by every chunk size via the
        leading-axis shape (chunk widths are pow2-bucketed by the caller).
        Small m dispatches the compile-light double-and-add kernel (see
        COMMIT_SIMPLE_MAX)."""
        key = (m, window_bits)
        fn = self._commit_jits.get(key)
        if fn is None:
            dc = self.device_curve()
            df = dc.df
            n_srs = self.n

            def pack_out(X, Y, Z):
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

            if m <= COMMIT_SIMPLE_MAX:

                def body(chunk, Ax, Ay):
                    b = chunk.shape[0]
                    Am = tuple(
                        jnp.broadcast_to(t[:, :m][None], (b, N_LIMBS, m))
                        for t in (Ax, Ay)
                    )
                    # [b, 254, m] bit digits, reversed to MSB-first scan rows
                    bits = window_digits(fr_df, chunk, 1)[:, ::-1, :]
                    xs = bits.transpose(1, 0, 2).astype(bool)  # [W, b, m]
                    acc = dc.identity((b, m))

                    def step(acc, brow):
                        acc = dc._double(acc)
                        added = dc._madd(acc, Am, False)
                        return dc.select(brow, added, acc), None

                    acc, _ = jax.lax.scan(step, acc, xs)
                    X, Y, Z = dc.tree_reduce(acc)  # [b, 16, 1]
                    return pack_out(*(jnp.swapaxes(t[..., 0], 0, 1) for t in (X, Y, Z)))

            else:

                def body(chunk, Ax, Ay):
                    digits = window_digits(fr_df, chunk, window_bits)
                    if m < n_srs:
                        digits = jnp.pad(digits, ((0, 0), (0, 0), (0, n_srs - m)))
                    X, Y, Z = msm_many_device(dc, (Ax, Ay), digits, window_bits, True)
                    return pack_out(X, Y, Z)

            fn = jax.jit(body)
            self._commit_jits[key] = fn
        return fn

    def commit_columns(self, fr_df, vals_mont, bases, window_bits: int | None = None):
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
        m = vals_mont.shape[2]
        window_bits = window_bits or msm_window_bits(m)
        lagrange = bases is self._lag_affine
        if (lagrange or bases is self._packed_affine) and self._host_msm_wanted(m, C):
            return self._commit_host_tensor(fr_df, vals_mont, lagrange)
        fn = self._commit_chunk_jit(fr_df, m, window_bits)
        return dispatch_cols(
            vals_mont, COMMIT_CHUNK, lambda b: (lambda v: fn(v, bases[0], bases[1]))
        )

    def commit_many_inside(self, fr_df, vals_mont, lagrange: bool, window_bits: int | None = None, bases=None):
        """Traceable batched commitment: [C, 16, m] Montgomery column values
        (evaluation form if `lagrange`, else coefficients) -> [C] Jacobian
        points ([16, C] coords). Safe to call inside a larger jit (no host
        sync). Uses the no-doubling mixed add (SRS bases are distinct).

        Pass `bases` explicitly when calling from inside another jit —
        fetching them here would bake them into the caller's executable as
        compile-time constants."""
        C, _, m = vals_mont.shape
        window_bits = window_bits or msm_window_bits(self.n)
        digits = window_digits(fr_df, vals_mont, window_bits)  # [C, W, m]
        if m < self.n:
            digits = jnp.pad(digits, ((0, 0), (0, 0), (0, self.n - m)))
        A = bases if bases is not None else (
            self.affine_lagrange_bases() if lagrange else self.affine_bases()
        )
        return msm_many_device(self.device_curve(), A, digits, window_bits, True)

    def commit(self, coeffs: list[int], window_bits: int | None = None):
        """Commit to a polynomial in coefficient form: MSM(g, coeffs) -> affine point."""
        assert len(coeffs) <= self.n
        window_bits = window_bits or msm_window_bits(self.n)
        dc = self.device_curve()
        P = self.packed_bases()
        if len(coeffs) < self.n:
            coeffs = list(coeffs) + [0] * (self.n - len(coeffs))
        digits = dc.pack_scalars(coeffs, window_bits)
        out = msm_device(dc, P, digits, window_bits)
        return dc.unpack_points(out)[0]

    def commit_lagrange(self, evals: list[int], window_bits: int | None = None):
        """Commit to a polynomial given by its evaluations on H (no IFFT)."""
        assert len(evals) <= self.n
        window_bits = window_bits or msm_window_bits(self.n)
        dc = self.device_curve()
        P = dc.pack_points(self.g_lagrange)
        if len(evals) < self.n:
            evals = list(evals) + [0] * (self.n - len(evals))
        digits = dc.pack_scalars(evals, window_bits)
        out = msm_device(dc, P, digits, window_bits)
        return dc.unpack_points(out)[0]

    def commit_dev(self, coeffs_dev, fr_df, window_bits: int | None = None):
        """Commit from a device Montgomery coeff tensor [16, m], m <= n."""
        out = self.commit_many_inside(fr_df, coeffs_dev[None], False, window_bits)
        dc = self.device_curve()
        return dc.unpack_points(out)[0]

    def commit_many(self, polys: list[list[int]], window_bits: int = 8) -> list:
        return [self.commit(p, window_bits) for p in polys]


def window_digits(fr_df: DeviceField, vals_mont, window_bits: int = 8):
    """[..., 16, m] Montgomery scalars -> int32[..., W, m] window digits.

    Pure device math (traceable): one from_mont plus shift/mask (and a
    cross-limb stitch for widths that don't divide 16) per window.
    """
    mask = (1 << window_bits) - 1
    num_windows = -(-254 // window_bits)
    canon = fr_df._from_mont(vals_mont)  # [..., 16, m]
    outs = []
    for w in range(num_windows):
        lo_bit = w * window_bits
        k, s = divmod(lo_bit, 16)
        d = canon[..., k, :] >> s
        if s + window_bits > 16 and k + 1 < N_LIMBS:
            d = d | (canon[..., k + 1, :] << (16 - s))
        outs.append((d & mask).astype(jnp.int32))
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
    """Read-or-create `params/kzg_bn254_{k}.srs` (utils/mod.rs:437-443).

    Files are read AND written in halo2-axiom's `ParamsKZG` serialization, so
    an SRS produced by the reference's `gen_srs` is a drop-in here and vice
    versa. Legacy repo-format files are migrated in place."""
    path = os.path.join(_params_dir(), f"kzg_bn254_{k}.srs")
    if os.path.exists(path):
        try:
            params = ParamsKZG.read(path)
            with open(path, "rb") as f:
                legacy = f.read(8) == _SRS_MAGIC
            if legacy:
                try:
                    params.write(path)  # migrate to the halo2 format
                except OSError:
                    pass  # read-only params dir: migration is optional
            return params
        except ValueError:
            pass  # stale v1 file: regenerate below
    params = ParamsKZG.setup(k)
    params.write(path)
    return params
