"""Device (JAX) elliptic-curve arithmetic: batched Jacobian G1 ops + MSM.

This is the TPU backend for the prover's KZG column commitments — the role of
Pippenger MSM inside `halo2-axiom`'s `create_proof` (SURVEY.md §2.9). Points
live in Jacobian coordinates as three `uint32[..., 16]` Montgomery-limb
tensors (see ops/limbs.py); the identity is Z == 0.

All point ops are branch-free (every case computed, then `select`ed), so they
vmap/jit/shard cleanly. The MSM is Pippenger with sort + segmented-scan bucket
accumulation:
  * per window: bucket index per point, sort points by bucket,
    segmented associative scan (EC add monoid) -> bucket sums,
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
# limb math for big batches: limb-major VMEM layout uses all 128 lanes
# where the [..., 16] XLA layout wastes 112 of them.
_USE_PALLAS = jax.default_backend() != "cpu" and os.environ.get("HALO2_NO_PALLAS") != "1"


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
        """Affine host points ((x, y) or None) -> Jacobian limb tensors."""
        from .limbs import ints_to_limbs

        p = self.df.p_int
        R = self.df.R
        xs = [0 if pt is None else (pt[0] * R) % p for pt in points]
        ys = [0 if pt is None else (pt[1] * R) % p for pt in points]
        zs = [0 if pt is None else R % p for pt in points]
        return (
            jnp.asarray(ints_to_limbs(xs)),
            jnp.asarray(ints_to_limbs(ys)),
            jnp.asarray(ints_to_limbs(zs)),
        )

    def unpack_points(self, P) -> list:
        """Jacobian limb tensors -> affine host points (None for identity)."""
        X, Y, Z = (np.asarray(jax.device_get(t)) for t in P)
        flat = X.reshape(-1, N_LIMBS), Y.reshape(-1, N_LIMBS), Z.reshape(-1, N_LIMBS)
        F = self.curve.base
        xs = self.df.unpack(flat[0])
        ys = self.df.unpack(flat[1])
        zs = self.df.unpack(flat[2])
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
            return jnp.where(c[..., None], a, b)

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
        """cond ? P : Q, cond shaped like the batch dims."""
        c = cond[..., None]
        return tuple(jnp.where(c, a, b) for a, b in zip(P, Q))

    # --- reductions -----------------------------------------------------------
    def tree_reduce(self, P):
        """Sum points along the leading axis by halving (log N complete adds)."""
        X, Y, Z = P
        n = X.shape[0]
        while n > 1:
            half = n // 2
            even = (X[: 2 * half : 2], Y[: 2 * half : 2], Z[: 2 * half : 2])
            odd = (X[1 : 2 * half : 2], Y[1 : 2 * half : 2], Z[1 : 2 * half : 2])
            s = self._add(even, odd)
            if n % 2:
                X = jnp.concatenate([s[0], X[-1:]], 0)
                Y = jnp.concatenate([s[1], Y[-1:]], 0)
                Z = jnp.concatenate([s[2], Z[-1:]], 0)
            else:
                X, Y, Z = s
            n = X.shape[0]
        return (X[0], Y[0], Z[0])

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


def _seg_scan(dc: DeviceCurve, X, Y, Z, flag):
    """Inclusive segmented EC-sum scan along axis -2 (the axis before limbs).

    `flag` marks segment starts; elements never absorb sums across a start.
    Hillis-Steele under a fori_loop so the EC-add graph is traced ONCE
    (an unrolled scan would replicate ~10^2 ops per level into the XLA graph).
    """
    L = X.shape[-2]
    idx = jnp.arange(L)
    levels = (L - 1).bit_length()

    def body(d, state):
        x, y, z, f = state
        shift = jnp.int32(1) << d
        px, py, pz = (jnp.roll(t, shift, axis=-2) for t in (x, y, z))
        pf = jnp.roll(f, shift, axis=-1)
        s = dc._add((x, y, z), (px, py, pz))
        # absorb only where this element hasn't hit a segment start and the
        # shifted neighbour is real (no wraparound)
        use = (~f) & (idx >= shift)
        x = jnp.where(use[..., None], s[0], x)
        y = jnp.where(use[..., None], s[1], y)
        z = jnp.where(use[..., None], s[2], z)
        f = f | (use & pf) | (idx < shift)
        return (x, y, z, f)

    x, y, z, _ = jax.lax.fori_loop(0, levels, body, (X, Y, Z, flag))
    return x, y, z


@partial(jax.jit, static_argnums=(0, 3))
def msm_device(dc: DeviceCurve, P, digits: jax.Array, window_bits: int):
    """Pippenger on device. P: (X,Y,Z) uint32[n,16]; digits: int32[W, n]."""
    df = dc.df
    num_windows, n = digits.shape
    nbuckets = (1 << window_bits) - 1  # bucket 0 (digit 0) is dropped

    def window_buckets(wdigits):
        """Bucket sums for a batch of windows: wdigits int32[Wb, n] ->
        uint32[Wb, nbuckets, 16] x3. Natively batched over the window axis
        (no vmap) so the pallas EC kernels see one flat batch."""
        Wb = wdigits.shape[0]
        # sort points by digit, per window
        order = jnp.argsort(wdigits, axis=1)
        d_sorted = jnp.take_along_axis(wdigits, order, axis=1)
        Xs, Ys, Zs = (t[order] for t in P)  # [Wb, n, 16]
        # zero out digit-0 points (treat as identity)
        live = d_sorted > 0
        Zs = jnp.where(live[..., None], Zs, 0)

        seg_start = jnp.concatenate(
            [jnp.ones((Wb, 1), bool), d_sorted[:, 1:] != d_sorted[:, :-1]], axis=1
        )
        npts = d_sorted.shape[1]

        # Two-level segmented inclusive scan: reshape [n] -> [R, C] so the
        # full-width EC-add count drops from log2(n) to log2(C)+1, plus a
        # log2(R)-level carry scan on a C-times-smaller tensor.
        C = 16
        while npts % C:
            C //= 2
        R = npts // C
        x2, y2, z2 = (t.reshape(Wb, R, C, N_LIMBS) for t in (Xs, Ys, Zs))
        s2 = seg_start.reshape(Wb, R, C)
        ix, iy, iz = _seg_scan(dc, x2, y2, z2, s2)
        # carry into each row = trailing open-segment sum of the rows above,
        # via an exclusive segmented scan of the per-row trailing sums
        rf = jnp.any(s2, axis=2)
        cx, cy, cz = _seg_scan(dc, ix[:, :, -1], iy[:, :, -1], iz[:, :, -1], rf)
        zero = jnp.zeros((Wb, 1, N_LIMBS), dtype=cx.dtype)
        cx, cy, cz = (
            jnp.concatenate([zero, t[:, :-1]], axis=1) for t in (cx, cy, cz)
        )
        fix = dc._add(
            (ix, iy, iz),
            tuple(
                jnp.broadcast_to(t[:, :, None, :], (Wb, R, C, N_LIMBS))
                for t in (cx, cy, cz)
            ),
        )
        # an element absorbs the carry only while its row prefix has no start
        has_start = jnp.cumsum(s2.astype(jnp.int32), axis=2) > 0
        sx, sy, sz = (
            jnp.where(has_start[..., None], a, b).reshape(Wb, npts, N_LIMBS)
            for a, b in zip((ix, iy, iz), fix)
        )
        # bucket b's sum sits at the LAST index of digit b+1 in the sorted
        # order: binary-search it and GATHER (TPU scatter serializes; gather
        # of 255 rows is free)
        targets = jnp.arange(1, nbuckets + 1)
        last_idx = (
            jax.vmap(lambda row: jnp.searchsorted(row, targets, side="right"))(
                d_sorted
            )
            - 1
        )  # [Wb, nbuckets]
        safe_idx = jnp.clip(last_idx, 0, npts - 1)
        hit = jnp.take_along_axis(d_sorted, safe_idx, axis=1)
        present = (last_idx >= 0) & (hit == targets[None, :])
        bX = jnp.take_along_axis(sx, safe_idx[..., None], axis=1)
        bY = jnp.take_along_axis(sy, safe_idx[..., None], axis=1)
        bZ = jnp.where(
            present[..., None], jnp.take_along_axis(sz, safe_idx[..., None], axis=1), 0
        )
        return bX, bY, bZ

    # Window batching: process every window in one flat batch whenever the
    # temporaries fit (a few u32[W*n, 16] buffers, ~128MB at 2^21
    # point-windows); chunk through lax.map in groups beyond that.
    if num_windows * n <= (1 << 21):
        bX, bY, bZ = window_buckets(digits)  # [W, nbuckets, 16]
    else:
        group = 1
        for g in (8, 4, 2):
            if num_windows % g == 0 and g * n <= (1 << 21):
                group = g
                break
        grouped = digits.reshape(num_windows // group, group, n)
        gb = jax.lax.map(window_buckets, grouped)
        bX, bY, bZ = (t.reshape(num_windows, nbuckets, N_LIMBS) for t in gb)

    # suffix-sum trick, vectorized across windows:
    # acc_b = sum_{j >= b} S_j ; window_total = sum_b acc_b
    ident = dc.identity((num_windows,))

    def suffix_step(carry, bucket):
        acc, total = carry
        acc = dc._add(acc, bucket)
        total = dc._add(total, acc)
        return (acc, total), None

    buckets_rev = (bX[:, ::-1].swapaxes(0, 1), bY[:, ::-1].swapaxes(0, 1), bZ[:, ::-1].swapaxes(0, 1))
    (acc, totals), _ = jax.lax.scan(suffix_step, (ident, ident), buckets_rev)

    # combine windows MSB-first: res = ((W_top * 2^c + W_top-1) * 2^c + ...)
    def window_step(res, w):
        res = jax.lax.fori_loop(0, window_bits, lambda _, r: dc._double(r), res)
        Pw = (totals[0][w], totals[1][w], totals[2][w])
        return dc._add(res, Pw), None

    res = dc.identity(())
    res, _ = jax.lax.scan(window_step, res, jnp.arange(num_windows - 1, -1, -1))
    return res
