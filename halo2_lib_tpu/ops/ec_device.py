"""Device (JAX) elliptic-curve arithmetic: batched Jacobian G1 ops + MSM.

This is the TPU backend for the prover's KZG column commitments — the role of
Pippenger MSM inside `halo2-axiom`'s `create_proof` (SURVEY.md §2.9). Points
live in Jacobian coordinates as three limb-major `uint32[..., 16, B]`
Montgomery tensors (see ops/limbs.py); the identity is Z == 0.

All point ops are branch-free (every case computed, then `select`ed), so they
vmap/jit/shard cleanly. The MSM is Pippenger with sort + segmented-scan bucket
accumulation:
  * per window: bucket index per point, sort points by bucket,
    segmented scan (EC add monoid) in ONE fused pallas kernel -> bucket sums,
  * suffix-sum trick batched ACROSS windows (one lax.scan over 2^c steps
    with the window axis vectorized),
  * final window combine by repeated doubling.
This maps the O(N) work onto long vector ops (VPU-friendly) and keeps the
only sequential parts at O(2^c + c * num_windows) scalar-point ops.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.curves import ShortWeierstrass
from .limbs import LIMB_BITS, MASK, N_LIMBS, DeviceField, _int_to_limbs

# On TPU the fused pallas kernels (ops/pallas_field.py) replace the XLA
# limb math for big batches: dense limb-major VMEM blocks amortize grid and
# HBM round-trip overheads that dominate the op-by-op XLA path.
_USE_PALLAS = jax.default_backend() != "cpu" and os.environ.get("HALO2_NO_PALLAS") != "1"


def _eshape(t) -> tuple:
    """Element shape of a limb-major tensor (drop the limb axis)."""
    return t.shape[:-2] + t.shape[-1:]


class DeviceCurve:
    """Batched Jacobian arithmetic for y^2 = x^3 + b over df.field."""

    def __init__(self, df: DeviceField, curve: ShortWeierstrass):
        assert df.field == curve.base
        self.df = df
        self.curve = curve
        self.add = jax.jit(self._add)
        self.double = jax.jit(self._double)

    def _add(self, P1, P2):
        """Complete add; dispatches to the fused pallas kernel on TPU."""
        if _USE_PALLAS:
            from . import pallas_field

            return pallas_field.ec_add(self, P1, P2)
        return self._add_xla(P1, P2)

    def _double(self, P):
        if _USE_PALLAS:
            from . import pallas_field

            return pallas_field.ec_double(self, P)
        return self._double_xla(P)

    # --- packing -----------------------------------------------------------
    def pack_points(self, points) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Affine host points ((x, y) or None) -> Jacobian limb-major [16, n]."""
        from .limbs import ints_to_limbs_T

        p = self.df.p_int
        R = self.df.R
        xs = [0 if pt is None else (pt[0] * R) % p for pt in points]
        ys = [0 if pt is None else (pt[1] * R) % p for pt in points]
        zs = [0 if pt is None else R % p for pt in points]
        return (
            jnp.asarray(ints_to_limbs_T(xs)),
            jnp.asarray(ints_to_limbs_T(ys)),
            jnp.asarray(ints_to_limbs_T(zs)),
        )

    def unpack_points(self, P) -> list:
        """Jacobian limb-major tensors -> affine host points (None=identity)."""
        F = self.curve.base
        xs = self.df.unpack(P[0])
        ys = self.df.unpack(P[1])
        zs = self.df.unpack(P[2])
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(None)
                continue
            zinv = F.inv(z)
            zi2 = F.mul(zinv, zinv)
            out.append((F.mul(x, zi2), F.mul(y, F.mul(zi2, zinv))))
        return out

    def identity(self, shape=()) -> tuple:
        z = self.df.zero(shape)
        return (z, z, z)

    # --- point ops (branch-free) --------------------------------------------
    # Independent Montgomery multiplies are STACKED into single batched calls
    # (jnp.stack on a new leading axis): the field multiply dominates both the
    # XLA graph size (compile time scales with op count) and runtime, so an
    # EC add is 6 montmul calls, a double 3 — not 25 scalar-scheduled ones.

    def _double_xla(self, P):
        """dbl-2009-l (a = 0): 2M + 5S in 3 stacked montmul calls."""
        df = self.df
        X, Y, Z = P
        st = jnp.stack
        r1 = df._mont_mul(st([X, Y]), st([X, Y]))
        A, B = r1[0], r1[1]
        E = df._add(df._add(A, A), A)
        tXB = df._add(X, B)
        r2 = df._mont_mul(st([B, tXB, E]), st([B, tXB, E]))
        C, tXB2, F_ = r2[0], r2[1], r2[2]
        D = df._sub(df._sub(tXB2, A), C)
        D = df._add(D, D)
        X3 = df._sub(F_, df._add(D, D))
        r3 = df._mont_mul(st([E, Y]), st([df._sub(D, X3), Z]))
        C4 = df._add(df._add(C, C), df._add(C, C))
        Y3 = df._sub(r3[0], df._add(C4, C4))
        Z3 = df._add(r3[1], r3[1])
        return (X3, Y3, Z3)

    def _add_xla(self, P1, P2):
        """Complete add: add-2007-bl + doubling branch + case selects, with all
        independent multiplies batched (6 stacked montmul calls total)."""
        df = self.df
        X1, Y1, Z1 = P1
        X2, Y2, Z2 = P2
        st = jnp.stack

        # R1: squares
        r1 = df._mont_mul(st([Z1, Z2, X1, Y1]), st([Z1, Z2, X1, Y1]))
        Z1Z1, Z2Z2, A, B = r1[0], r1[1], r1[2], r1[3]
        # R2: cross products (+ doubling-branch C, YZ)
        r2 = df._mont_mul(st([X1, X2, Y1, Y2, B, Y1]), st([Z2Z2, Z1Z1, Z2, Z1, B, Z1]))
        U1, U2, t1, t2, C, YZ = (r2[i] for i in range(6))
        # R3: S1, S2 (+ doubling (X1+B)^2)
        tXB = df._add(X1, B)
        r3 = df._mont_mul(st([t1, t2, tXB]), st([Z2Z2, Z1Z1, tXB]))
        S1, S2, tXB2 = r3[0], r3[1], r3[2]

        H = df._sub(U2, U1)
        r_ = df._sub(S2, S1)
        rr = df._add(r_, r_)
        E = df._add(df._add(A, A), A)
        D = df._sub(df._sub(tXB2, A), C)
        D = df._add(D, D)
        zz = df._add(Z1, Z2)
        # R4: HH, F = E^2, rr^2, (Z1+Z2)^2
        r4 = df._mont_mul(st([H, E, rr, zz]), st([H, E, rr, zz]))
        HH, F_, rr2, zz2 = r4[0], r4[1], r4[2], r4[3]
        I = df._add(df._add(HH, HH), df._add(HH, HH))
        X3d = df._sub(F_, df._add(D, D))
        # R5: J = H*I, V = U1*I, Z3 = (zz2 - Z1Z1 - Z2Z2)*H, Ed = E*(D - X3d)
        zzsub = df._sub(df._sub(zz2, Z1Z1), Z2Z2)
        r5 = df._mont_mul(st([H, U1, zzsub, E]), st([I, I, H, df._sub(D, X3d)]))
        J, V, Z3, Ed = r5[0], r5[1], r5[2], r5[3]
        X3 = df._sub(df._sub(rr2, J), df._add(V, V))
        # R6: rr*(V - X3), S1*J
        r6 = df._mont_mul(st([rr, S1]), st([df._sub(V, X3), J]))
        S1J = r6[1]
        Y3 = df._sub(r6[0], df._add(S1J, S1J))
        # doubling-branch outputs
        C4 = df._add(df._add(C, C), df._add(C, C))
        Y3d = df._sub(Ed, df._add(C4, C4))
        Z3d = df._add(YZ, YZ)

        # special cases
        p1_inf = df.is_zero(Z1)
        p2_inf = df.is_zero(Z2)
        h_zero = df.is_zero(H)
        r_zero = df.is_zero(r_)
        is_double = h_zero & r_zero & ~p1_inf & ~p2_inf
        is_identity_out = h_zero & ~r_zero & ~p1_inf & ~p2_inf

        def sel(c, a, b):
            return jnp.where(c[..., None, :], a, b)

        X3 = sel(is_double, X3d, X3)
        Y3 = sel(is_double, Y3d, Y3)
        Z3 = sel(is_double, Z3d, Z3)
        Z3 = sel(is_identity_out, jnp.zeros_like(Z3), Z3)
        # P1 = O -> P2 ; P2 = O -> P1
        X3 = sel(p2_inf, X1, sel(p1_inf, X2, X3))
        Y3 = sel(p2_inf, Y1, sel(p1_inf, Y2, Y3))
        Z3 = sel(p2_inf, Z1, sel(p1_inf, Z2, Z3))
        return (X3, Y3, Z3)

    def select(self, cond, P, Q):
        """cond ? P : Q, cond shaped like the element dims."""
        c = cond[..., None, :]
        return tuple(jnp.where(c, a, b) for a, b in zip(P, Q))

    # --- mixed (Jacobian + affine) add ------------------------------------
    # The MSM bucket-accumulation scan always adds an ORIGINAL base point
    # (affine, Z=1) into a running Jacobian accumulator, so it uses
    # madd-2007-bl (11 muls; 17 with the doubling branch) instead of the
    # 23-mul complete add. Affine identity is encoded as the off-curve
    # sentinel (0, 0) (valid because b != 0 for our curves).

    def _madd(self, P1, A2, distinct: bool):
        if _USE_PALLAS:
            from . import pallas_field

            return pallas_field.ec_madd(self, P1, A2, distinct)
        return self._madd_xla(P1, A2, distinct)

    def _madd_xla(self, P1, A2, distinct: bool):
        """acc (Jacobian) + base (affine, (0,0)=identity) -> Jacobian.

        `distinct=True` skips the doubling branch: sound when no partial
        bucket sum can equal a base point — guaranteed for powers-of-tau SRS
        bases, where such a collision is a nontrivial discrete-log relation.
        """
        df = self.df
        X1, Y1, Z1 = P1
        x2, y2 = A2
        st = jnp.stack
        one = df.one_mont(_eshape(Z1))

        if distinct:
            Z1Z1 = df._mont_mul(Z1, Z1)
            r2 = df._mont_mul(st([x2, y2]), st([Z1Z1, Z1]))
            U2, t2 = r2[0], r2[1]
            H = df._sub(U2, X1)
            r3 = df._mont_mul(st([t2, H]), st([Z1Z1, H]))
            S2, HH = r3[0], r3[1]
        else:
            r1 = df._mont_mul(st([Z1, x2, y2]), st([Z1, x2, y2]))
            Z1Z1, A, B = r1[0], r1[1], r1[2]
            xB = df._add(x2, B)
            r2 = df._mont_mul(st([x2, y2, B, xB]), st([Z1Z1, Z1, B, xB]))
            U2, t2, C, xB2 = r2[0], r2[1], r2[2], r2[3]
            H = df._sub(U2, X1)
            E = df._add(df._add(A, A), A)
            r3 = df._mont_mul(st([t2, H, E]), st([Z1Z1, H, E]))
            S2, HH, F_ = r3[0], r3[1], r3[2]

        rr = df._sub(S2, Y1)
        rr = df._add(rr, rr)
        I = df._add(HH, HH)
        I = df._add(I, I)
        ZH = df._add(Z1, H)
        if distinct:
            r4 = df._mont_mul(st([H, X1, rr, ZH]), st([I, I, rr, ZH]))
            J, V, rr2, ZH2 = r4[0], r4[1], r4[2], r4[3]
        else:
            D = df._sub(df._sub(xB2, A), C)
            D = df._add(D, D)
            X3d = df._sub(F_, df._add(D, D))
            r4 = df._mont_mul(
                st([H, X1, rr, ZH, E]), st([I, I, rr, ZH, df._sub(D, X3d)])
            )
            J, V, rr2, ZH2, Ed = r4[0], r4[1], r4[2], r4[3], r4[4]
        X3 = df._sub(df._sub(rr2, J), df._add(V, V))
        Z3 = df._sub(df._sub(ZH2, Z1Z1), HH)
        r5 = df._mont_mul(st([rr, Y1]), st([df._sub(V, X3), J]))
        Y1J = r5[1]
        Y3 = df._sub(r5[0], df._add(Y1J, Y1J))

        p1_inf = df.is_zero(Z1)
        live = ~(df.is_zero(x2) & df.is_zero(y2))

        def sel(c, a, b):
            return jnp.where(c[..., None, :], a, b)

        if not distinct:
            # doubling branch: P1 == lifted (x2, y2)
            C4 = df._add(df._add(C, C), df._add(C, C))
            Y3d = df._sub(Ed, df._add(C4, C4))
            Z3d = df._add(y2, y2)
            is_double = live & ~p1_inf & df.is_zero(H) & df.is_zero(rr)
            X3 = sel(is_double, X3d, X3)
            Y3 = sel(is_double, Y3d, Y3)
            Z3 = sel(is_double, Z3d, Z3)
        # P1 = O -> lifted P2 ; P2 dead -> P1
        X3 = sel(p1_inf, x2, X3)
        Y3 = sel(p1_inf, y2, Y3)
        Z3 = sel(p1_inf, jnp.where(live[..., None, :], one, jnp.zeros_like(Z1)), Z3)
        X3 = sel(~live, X1, X3)
        Y3 = sel(~live, Y1, Y3)
        Z3 = sel(~live, Z1, Z3)
        return (X3, Y3, Z3)

    def pack_points_affine(self, points):
        """Host affine points ((x, y) or None) -> (Ax, Ay) limb-major [16, n]
        Montgomery, identity encoded as the (0, 0) sentinel. The Montgomery
        conversion runs on device (one to_mont dispatch, no host bigints)."""
        from .limbs import ints_to_limbs_T

        xs = [0 if pt is None else pt[0] for pt in points]
        ys = [0 if pt is None else pt[1] for pt in points]
        to_mont = jax.jit(self.df._to_mont)
        return (
            to_mont(jnp.asarray(ints_to_limbs_T(xs))),
            to_mont(jnp.asarray(ints_to_limbs_T(ys))),
        )

    # --- reductions -----------------------------------------------------------
    def tree_reduce(self, P):
        """Sum points along the LANE axis -> [..., 16, 1] coords.

        Small lane counts use recursive doubling under a fori_loop: ONE
        traced complete-add graph instead of log2(n) unrolled levels —
        XLA:CPU compile costs ~1 s per Montgomery-multiply instance, so an
        unrolled 10-level tree was ~200 s of compile by itself. The extra
        n log n vs n point-adds are microseconds at these sizes. Large lane
        counts keep the work-optimal halving tree."""
        X, Y, Z = P
        n = X.shape[-1]
        if n <= 4096:
            if n == 1:
                return (X, Y, Z)
            levels = (n - 1).bit_length()
            lanes = jnp.arange(n)

            def body(d, P):
                sh = jnp.int32(1) << d
                live = lanes + sh < n  # rolled-in wrap lanes are dead
                Q = tuple(
                    jnp.where(live, jnp.roll(t, -sh, axis=-1), 0) for t in P
                )
                return self._add(P, Q)

            X, Y, Z = jax.lax.fori_loop(0, levels, body, (X, Y, Z))
            return (X[..., :1], Y[..., :1], Z[..., :1])
        while n > 1:
            half = n // 2
            even = tuple(t[..., 0 : 2 * half : 2] for t in (X, Y, Z))
            odd = tuple(t[..., 1 : 2 * half : 2] for t in (X, Y, Z))
            s = self._add(even, odd)
            if n % 2:
                X = jnp.concatenate([s[0], X[..., -1:]], -1)
                Y = jnp.concatenate([s[1], Y[..., -1:]], -1)
                Z = jnp.concatenate([s[2], Z[..., -1:]], -1)
            else:
                X, Y, Z = s
            n = X.shape[-1]
        return (X, Y, Z)

    # --- MSM -------------------------------------------------------------------
    def pack_scalars(self, scalars: list[int], window_bits: int) -> jax.Array:
        """Scalars -> int32[num_windows, n] window digits (vectorized)."""
        r = self.curve.scalar.p
        nbits = r.bit_length()
        num_windows = -(-nbits // window_bits)
        n = len(scalars)
        nbytes = (num_windows * window_bits + 7) // 8
        buf = b"".join((int(s) % r).to_bytes(nbytes, "little") for s in scalars)
        bytes_arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, nbytes)
        if window_bits == 8:
            out = bytes_arr[:, :num_windows].T.astype(np.int32)
        else:
            # generic path: expand to bits then regroup
            bits = np.unpackbits(bytes_arr, axis=1, bitorder="little")
            bits = bits[:, : num_windows * window_bits].reshape(n, num_windows, window_bits)
            weights = (1 << np.arange(window_bits)).astype(np.int32)
            out = (bits * weights).sum(axis=2).T.astype(np.int32)
        return jnp.asarray(np.ascontiguousarray(out))

    def msm(self, points, scalars: list[int], window_bits: int = 8):
        """Full Pippenger MSM; host points/ints in, Jacobian point out."""
        P = self.pack_points(points)
        digits = self.pack_scalars(scalars, window_bits)
        return msm_device(self, P, digits, window_bits)


def _seg_scan(dc: DeviceCurve, X, Y, Z, flag, width: int | None = None):
    """Inclusive segmented EC-sum scan along the LANE axis.

    X/Y/Z: [..., 16, L]; `flag` [..., L] marks segment starts; elements never
    absorb sums across a start. Hillis-Steele under a fori_loop so the EC-add
    graph is traced ONCE. With `width`, every width-lane block is an
    independent scan (merged-lane layout: no per-block pad to the pallas
    512-lane floor)."""
    L = X.shape[-1]
    w = width or L
    idx = jnp.arange(L) % w
    levels = (w - 1).bit_length()

    def body(d, state):
        x, y, z, f = state
        shift = jnp.int32(1) << d
        px, py, pz = (jnp.roll(t, shift, axis=-1) for t in (x, y, z))
        pf = jnp.roll(f, shift, axis=-1)
        s = dc._add((x, y, z), (px, py, pz))
        # absorb only where this element hasn't hit a segment start and the
        # shifted neighbour is real (no wraparound)
        use = (~f) & (idx >= shift)
        um = use[..., None, :]
        x = jnp.where(um, s[0], x)
        y = jnp.where(um, s[1], y)
        z = jnp.where(um, s[2], z)
        f = f | (use & pf) | (idx < shift)
        return (x, y, z, f)

    x, y, z, _ = jax.lax.fori_loop(0, levels, body, (X, Y, Z, flag))
    return x, y, z


# Memory budget for one MSM group: point-slots live at once inside the
# bucket-accumulation scan (gathered packed bases 64 B + scan outputs 192 B
# per slot => 2^22 slots ~ 1.1 GB peak).
_MSM_GROUP_SLOTS = 1 << 22
# Kept as the bench/back-compat default; real callers should size the window
# by n via msm_window_bits.
MSM_WINDOW_BITS = 13


def msm_window_bits(n: int) -> int:
    """Pippenger window width c balancing mixed-add work (W(c) * n * 11
    muls, W = ceil(254/c)) against the 2^c-slot bucket reduction (~55 muls
    per slot across the weighted scan): wide windows only pay off once
    n >> 2^c."""
    if n >= 1 << 18:
        return 13
    if n >= 1 << 16:
        return 12
    if n >= 1 << 13:
        return 10
    return 8


def _scan_lanes(n: int) -> int:
    """Lanes of the bucket-accumulation scan: each of the R = n/CL steps is
    one [windows x CL] mixed add. Wider lanes amortize grid overhead but the
    lane-boundary carry fix costs ~log(CL)*CL complete adds per window, so
    CL shrinks with n."""
    if n >= 1 << 18:
        return 1024
    if n >= 1 << 14:
        return 256
    return 128


def _suffix_local(dc: DeviceCurve, Pt, CL2: int):
    """Within-window inclusive SUFFIX sums on merged lanes.

    Pt: (X, Y, Z) [..., 16, M] with M = k * CL2 — every CL2-lane block is an
    independent window; lane l absorbs lanes l..CL2-1 of its own block.
    Masked recursive doubling: log2(CL2) complete adds, full lane
    utilization (no per-window pad to the pallas 512-lane floor)."""
    M = Pt[0].shape[-1]
    l_loc = jnp.arange(M) % CL2

    def body(d, P):
        sh = jnp.int32(1) << d
        ok = l_loc + sh < CL2
        Q = tuple(jnp.where(ok, jnp.roll(t, -sh, axis=-1), 0) for t in P)
        return dc._add(P, Q)

    return jax.lax.fori_loop(0, max(CL2.bit_length() - 1, 1), body, Pt)


def _bucket_sums(dc: DeviceCurve, A, order, d_sorted, nbuckets: int, distinct: bool):
    """Bucket sums for a batch of windows via an O(n)-add segmented scan.

    A: (Ax, Ay) limb-major [16, nb] affine bases (Montgomery; (0,0) = identity).
    order/d_sorted: int32[Wb, n] sorted digit order per window.
    Returns (bX, bY, bZ) uint32[Wb, 16, nbuckets], identity where empty.

    Design: sorted points are laid out [lanes, R] (lane = contiguous chunk of
    the sorted order); the whole R-step scan of [Wb, lanes]-wide mixed adds
    runs inside ONE pallas kernel on TPU (bucket_scan; n total adds — not the
    n log n of a Hillis-Steele scan), lane-boundary carries are fixed by a
    small segmented scan across lanes, and bucket values are picked by
    binary-search gathers (TPU scatter would serialize; gathers are cheap).
    """
    Ax, Ay = A
    Wb, n = d_sorted.shape
    CL = _scan_lanes(n)
    while n % CL:
        CL //= 2
    R = n // CL

    seg_start = jnp.concatenate(
        [jnp.ones((Wb, 1), bool), d_sorted[:, 1:] != d_sorted[:, :-1]], axis=1
    )
    live = d_sorted > 0

    if _USE_PALLAS:
        # fused path: one PACKED lane-gather (2x16-bit limbs per u32 — the
        # random-lane gather is issue-bound, so packing doubles points/s),
        # then the whole R-step segmented scan in a single pallas kernel.
        from . import pallas_field

        Axy = jnp.concatenate(
            [
                Ax[: N_LIMBS // 2] | (Ax[N_LIMBS // 2 :] << 16),
                Ay[: N_LIMBS // 2] | (Ay[N_LIMBS // 2 :] << 16),
            ],
            axis=0,
        )  # [16, nb] packed: row j = limbs j | j+8
        # order_perm[w, r, l] = sorted position l*R + r
        order_perm = order.reshape(Wb, CL, R).transpose(0, 2, 1)
        g = jnp.take(Axy, order_perm.reshape(-1), axis=1).reshape(
            N_LIMBS, Wb, R, CL
        )
        live_perm = live.reshape(Wb, CL, R).transpose(0, 2, 1)
        g = jnp.where(live_perm[None], g, 0)
        axy = g.transpose(1, 2, 0, 3)  # [Wb, R, 16, CL] packed
        st = seg_start.reshape(Wb, CL, R).transpose(0, 2, 1).astype(jnp.int32)
        out = pallas_field.bucket_scan(dc, axy, st, CL, distinct)  # [Wb,R,48,CL]
        last = out[:, R - 1]  # [Wb, 48, CL]
        lastv = tuple(last[:, 16 * i : 16 * (i + 1), :] for i in range(3))
        sx = sy = sz = None
    else:
        lm = live[:, None, :]
        ax = jnp.where(lm, jnp.take(Ax, order, axis=1).swapaxes(0, 1), 0)  # [Wb,16,n]
        ay = jnp.where(lm, jnp.take(Ay, order, axis=1).swapaxes(0, 1), 0)
        # element (lane, r) = sorted position lane*R + r -> scan axis first
        ax_s = ax.reshape(Wb, N_LIMBS, CL, R).transpose(3, 0, 1, 2)  # [R,Wb,16,CL]
        ay_s = ay.reshape(Wb, N_LIMBS, CL, R).transpose(3, 0, 1, 2)
        st_s = seg_start.reshape(Wb, CL, R).transpose(2, 0, 1)  # [R, Wb, CL]

        ident = dc.identity((Wb, CL))

        def step(acc, inp):
            x2, y2, start = inp
            acc = dc.select(~start, acc, ident)
            o = dc._madd(acc, (x2, y2), distinct)
            return o, o

        _, stacked = jax.lax.scan(step, ident, (ax_s, ay_s, st_s))
        # [R, Wb, 16, CL] x3 -> global sorted order [Wb, 16, n]
        sx, sy, sz = (
            t.transpose(1, 2, 3, 0).reshape(Wb, N_LIMBS, n) for t in stacked
        )
        lastv = tuple(t[-1] for t in stacked)  # [Wb, 16, CL] x3

    # lane-boundary carries: inclusive segmented scan (across lanes) of each
    # lane's trailing-run sum, shifted right by one lane. Lanes of all Wb
    # windows merge into one axis (width=CL blocks) so narrow CL never pays
    # the pallas 512-lane pad.
    has_start = jnp.any(seg_start.reshape(Wb, CL, R), axis=2)  # [Wb, CL]
    lastm = tuple(t.transpose(1, 0, 2).reshape(N_LIMBS, Wb * CL) for t in lastv)
    cm = _seg_scan(dc, *lastm, has_start.reshape(Wb * CL), width=CL)
    cx, cy, cz = (t.reshape(N_LIMBS, Wb, CL).transpose(1, 0, 2) for t in cm)
    zero = jnp.zeros((Wb, N_LIMBS, 1), dtype=cx.dtype)
    cx, cy, cz = (jnp.concatenate([zero, t[..., :-1]], axis=-1) for t in (cx, cy, cz))

    # bucket b's lane-local sum sits at the LAST index of digit b; add the
    # lane carry iff b's run began before that lane
    targets = jnp.arange(1, nbuckets + 1)
    vs = jax.vmap(lambda row: jnp.searchsorted(row, targets, side="right"))
    vsl = jax.vmap(lambda row: jnp.searchsorted(row, targets, side="left"))
    last_idx = vs(d_sorted) - 1  # [Wb, nbuckets]
    first_idx = vsl(d_sorted)
    present = last_idx >= first_idx
    safe_idx = jnp.clip(last_idx, 0, n - 1)
    lane = safe_idx // R
    if _USE_PALLAS:
        # single-element gathers from the kernel's [Wb, R, 48, CL] layout,
        # arranged limb-major: vals[w, c, b] = out[w, idx_r[b], c, lane[b]]
        idx_r = safe_idx % R
        cols = jnp.arange(3 * N_LIMBS)
        lin = (idx_r[:, None, :] * (3 * N_LIMBS) + cols[None, :, None]) * CL + lane[
            :, None, :
        ]
        vals = jnp.take_along_axis(
            out.reshape(Wb, R * 3 * N_LIMBS * CL)[:, None, :],
            lin.reshape(Wb, 1, -1),
            axis=2,
        ).reshape(Wb, 3 * N_LIMBS, nbuckets)
        bX = vals[:, :N_LIMBS]
        bY = vals[:, N_LIMBS : 2 * N_LIMBS]
        bZ = vals[:, 2 * N_LIMBS :]
    else:
        gi = safe_idx[:, None, :]
        bX = jnp.take_along_axis(sx, gi, axis=2)
        bY = jnp.take_along_axis(sy, gi, axis=2)
        bZ = jnp.take_along_axis(sz, gi, axis=2)
    li = lane[:, None, :]
    carX = jnp.take_along_axis(cx, li, axis=2)
    carY = jnp.take_along_axis(cy, li, axis=2)
    carZ = jnp.take_along_axis(cz, li, axis=2)
    fixed = dc._add((bX, bY, bZ), (carX, carY, carZ))
    needs_carry = (first_idx < lane * R)[:, None, :]
    bX = jnp.where(needs_carry, fixed[0], bX)
    bY = jnp.where(needs_carry, fixed[1], bY)
    bZ = jnp.where(needs_carry, fixed[2], bZ)
    bZ = jnp.where(present[:, None, :], bZ, 0)
    return bX, bY, bZ


def _msm_from_digits(dc: DeviceCurve, A, digits: jax.Array, window_bits: int, distinct: bool):
    """Core MSM: affine bases + per-column window digits -> [16, C] Jacobian.

    digits: int32[C, W, n]. All C*W windows share one sort dispatch and are
    bucket-accumulated in memory-budgeted groups.
    """
    C, W, n = digits.shape
    nbuckets = (1 << window_bits) - 1
    flat = digits.reshape(C * W, n)
    order = jnp.argsort(flat, axis=1)
    d_sorted = jnp.take_along_axis(flat, order, axis=1)

    Wtot = C * W
    divs = [g for g in range(1, Wtot + 1) if Wtot % g == 0 and g * n <= _MSM_GROUP_SLOTS]
    # prefer groups divisible by the kernel's window block (4) so the scan
    # kernel keeps its widest shape
    good = [g for g in divs if g % 4 == 0] or divs or [1]
    group = max(good)
    if Wtot * n <= _MSM_GROUP_SLOTS:
        group = Wtot
    if group == Wtot:
        bX, bY, bZ = _bucket_sums(dc, A, order, d_sorted, nbuckets, distinct)
    else:
        og = order.reshape(Wtot // group, group, n)
        dg = d_sorted.reshape(Wtot // group, group, n)
        gb = jax.lax.map(
            lambda od: _bucket_sums(dc, A, od[0], od[1], nbuckets, distinct),
            (og, dg),
        )
        bX, bY, bZ = (t.reshape(Wtot, N_LIMBS, nbuckets) for t in gb)

    # weighted bucket reduction T_w = sum_b b * S_b, BLOCKED on MERGED
    # lanes: slot b-1 = r*CL2 + l, all windows' CL2-lane blocks side by side
    # in one [16, Wtot*CL2] axis (full lane utilization — per-window shapes
    # would pad every op to the pallas 512-lane floor). A descending
    # (acc, total) scan over the R2 slot-rows yields per-lane
    #   A_l = sum_r S'_{r,l}            (plain lane sums)
    #   tot_l = sum_r (r+1) * S'_{r,l}  (row-weighted lane sums)
    # and with the within-window suffix scan (_suffix_local):
    #   T = CL2*(TT - TA) + TS
    # where TA = suf(A)[0], TS = suf(suf(A))[0], TT = suf(tot)[0] — one
    # suffix pass doubles as the lane reduction (its lane-0 value). This
    # replaces the old 2*2^c-step sequential tail with 2*R2 + ~3 log2(CL2)
    # wide point ops, making wide windows affordable.
    CL2 = min(64, 1 << (max(nbuckets - 1, 1)).bit_length())
    R2 = -(-nbuckets // CL2)
    pad = R2 * CL2 - nbuckets
    M = Wtot * CL2
    S = tuple(
        jnp.pad(t, ((0, 0), (0, 0), (0, pad))).reshape(Wtot, N_LIMBS, R2, CL2)
        for t in (bX, bY, bZ)
    )
    # merged rows: xs[r] = [16, Wtot*CL2], lane = w*CL2 + l; rows descending
    S_rows = tuple(
        t.transpose(2, 1, 0, 3).reshape(R2, N_LIMBS, M)[::-1] for t in S
    )
    ident2 = dc.identity((M,))

    def wscan_step(carry, row):
        acc, tot = carry
        acc = dc._add(acc, row)
        tot = dc._add(tot, acc)
        return (acc, tot), None

    (A_l, tot_l), _ = jax.lax.scan(wscan_step, (ident2, ident2), S_rows)

    # one batched suffix pass over (A | tot), then a second over suf(A)
    both = tuple(jnp.concatenate([a, t], axis=-1) for a, t in zip(A_l, tot_l))
    suf1 = _suffix_local(dc, both, CL2)
    sufA = tuple(t[..., :M] for t in suf1)
    sufT = tuple(t[..., M:] for t in suf1)
    suf2 = _suffix_local(dc, sufA, CL2)
    TA = tuple(t[..., 0::CL2] for t in sufA)  # [16, Wtot]
    TT = tuple(t[..., 0::CL2] for t in sufT)
    TS = tuple(t[..., 0::CL2] for t in suf2)
    negTA = (TA[0], dc.df._neg(TA[1]), TA[2])
    D = dc._add(TT, negTA)
    for _ in range(CL2.bit_length() - 1):  # * CL2 (power of two)
        D = dc._double(D)
    totals3 = dc._add(D, TS)  # [16, Wtot]
    tX, tY, tZ = totals3

    # combine windows MSB-first across all C columns at once: lanes [w::W]
    def window_step(res, w):
        res = jax.lax.fori_loop(0, window_bits, lambda _, r: dc._double(r), res)
        Pw = tuple(
            jax.lax.dynamic_slice(t.reshape(N_LIMBS, C, W), (0, 0, w), (N_LIMBS, C, 1))[
                ..., 0
            ]
            for t in (tX, tY, tZ)
        )
        return dc._add(res, Pw), None

    res = dc.identity((C,))
    res, _ = jax.lax.scan(window_step, res, jnp.arange(W - 1, -1, -1))
    return res


@partial(jax.jit, static_argnums=(0, 3, 4))
def msm_many_device(
    dc: DeviceCurve, A, digits: jax.Array, window_bits: int, distinct: bool = False
):
    """Batched Pippenger MSM over shared affine bases.

    A: (Ax, Ay) limb-major uint32[16, n] Montgomery affine bases ((0,0) =
    identity). digits: int32[C, W, n] window digits for C independent scalar
    columns. Returns Jacobian (X, Y, Z), each uint32[16, C].

    `distinct=True` enables the no-doubling mixed add: only sound when
    bucket partial sums can never equal a base (powers-of-tau SRS bases).
    """
    return _msm_from_digits(dc, A, digits, window_bits, distinct)


@partial(jax.jit, static_argnums=(0, 3))
def msm_device(dc: DeviceCurve, P, digits: jax.Array, window_bits: int):
    """Pippenger on device. P: (X,Y,Z) uint32[16, n] with Z in {0, R} (affine
    lift or identity); digits: int32[W, n]. Returns one Jacobian point
    ([16, 1] coords)."""
    X, Y, Z = P
    inf = dc.df.is_zero(Z)[None, :]
    A = (jnp.where(inf, 0, X), jnp.where(inf, 0, Y))
    res = _msm_from_digits(dc, A, digits[None], window_bits, False)
    return tuple(t[:, :1] for t in res)
