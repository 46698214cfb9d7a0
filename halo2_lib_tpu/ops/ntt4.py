"""Four-step (Bailey) NTT with VMEM-resident sub-transform kernels.

Replaces the per-stage dispatch NTT on the TPU path for large domains. The
radix-2 NTT is decomposed as N = A1 * A2 * ... * Ak (ascending factors, each
mid factor <= 256, base factor <= 512): level l runs ALL log2(Al) Stockham
stages of the length-Al sub-transform inside ONE pallas kernel while the
block lives in VMEM, with the four-step diagonal twiddle fused into the same
kernel. Between levels only cheap XLA transposes move data. This turns the
old  (2 HBM passes + 1 kernel launch) * log2(N)  schedule into  ~3 passes
per level (2-3 levels total), so the transform runs at the Montgomery-
multiply bound instead of the dispatch/HBM-glue bound.

Role: the radix-2 FFT inside `halo2-axiom`'s create_proof
(/root/reference — SURVEY.md §2.9); used by the prover's domain for
coefficient<->evaluation conversion and the extended-coset quotient.

Layout contract (ops/limbs.py): limb-major uint32[..., 16, N] Montgomery.
The sub-transform runs along a LEADING axis (rows), so every in-kernel
slice/stack/reshape is tile-granular; lanes carry the remaining factors and
the batch. Stage twiddles for the length-A kernel are one pre-broadcast
[A/2, 16, blk] VMEM-resident table; stage p's strided-repeat pattern is
rebuilt by leading-axis reshape/broadcast (free on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .limbs import N_LIMBS, DeviceField, ints_to_limbs_T
from .ntt import NTT, pows_host_ints
from . import pallas_field as pf

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

BLK_NTT = 128  # kernel lane-block (one tile width: no pad waste, small VMEM)
# Max sub-transform length: the unrolled Montgomery-multiply stages hold
# ~8 MB of live VMEM temporaries at A=128/blk=128; A=256 blew the 16 MB
# scoped-vmem limit (measured 16.51M on v5e).
A_MID = 128
A_BASE = 128
MIN_FOURSTEP = 4096  # below this the inherited per-stage path is fine


def _plan(n: int) -> list[int]:
    """Ascending factors, mids <= A_MID, last <= A_BASE, product n."""
    fs = []
    rem = n
    while rem > A_BASE:
        fs.append(A_MID)
        rem //= A_MID
    fs.append(rem)
    fs.sort()
    return fs


def _colntt_kernel(x_ref, tw_ref, *rest, with_mid: bool, A: int, blk: int, df):
    """All log2(A) Stockham DIF stages over the row axis, in VMEM.

    x block: [1]*lead + [A, 16, blk]; tw: [A/2, 16, blk] (value w_A^q at row
    q, broadcast along lanes); optional mid: [A, 16, blk] diagonal twiddle
    multiplied into the output (four-step step 2, fused)."""
    consts = pf._consts_for(df)
    nprime, p_rows, p17 = consts
    if with_mid:
        mid_ref, o_ref = rest
    else:
        (o_ref,) = rest
    x = x_ref[:].reshape(A, N_LIMBS, blk)
    tw = tw_ref[:]
    half = A // 2
    n_cur, s = A, 1
    while n_cur > 1:
        m = n_cur // 2
        a, b = x[:half], x[half:]
        # stage twiddles w^(p*s), p < m, each repeated s times along rows:
        # leading-axis strided select + broadcast (tile-granular, no shuffles)
        t = tw.reshape(m, s, N_LIMBS, blk)[:, :1]
        wp = jnp.broadcast_to(t, (m, s, N_LIMBS, blk)).reshape(half, N_LIMBS, blk)
        top = pf._add_f(a, b, p17)
        bot = pf._mont_mul_t(pf._sub_f(a, b, p_rows), wp, consts)
        x = jnp.stack(
            [top.reshape(m, s, N_LIMBS, blk), bot.reshape(m, s, N_LIMBS, blk)],
            axis=1,
        ).reshape(A, N_LIMBS, blk)
        n_cur, s = m, 2 * s
    if with_mid:
        x = pf._mont_mul_t(x, mid_ref[:], consts)
    o_ref[:] = x.reshape(o_ref.shape)


@functools.lru_cache(maxsize=None)
def _colntt_call(p_int: int, L: int, A: int, B: int, blk: int, with_mid: bool, interpret: bool):
    from ..utils.fields import PrimeField

    df = DeviceField(PrimeField(p_int, f"f{p_int % 100000}"))
    in_specs = [
        pl.BlockSpec((1, A, N_LIMBS, blk), lambda l, j: (l, 0, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((A // 2, N_LIMBS, blk), lambda l, j: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    if with_mid:
        in_specs.append(
            pl.BlockSpec((A, N_LIMBS, blk), lambda l, j: (0, 0, j), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_colntt_kernel, with_mid=with_mid, A=A, blk=blk, df=df),
        out_shape=jax.ShapeDtypeStruct((L, A, N_LIMBS, B), jnp.uint32),
        grid=(L, B // blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, A, N_LIMBS, blk), lambda l, j: (l, 0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )


class FourStepNTT(NTT):
    """NTT with four-step VMEM kernels on the TPU path (API of ops/ntt.NTT)."""

    def __init__(self, df: DeviceField, log_n: int, interpret: bool = False):
        self._interpret = interpret
        self._tables: dict = {}
        super().__init__(df, log_n)
        # huge domains dispatch column-by-column: the fixed 8-column chunk
        # would zero-pad a single 2^20 transform 8x (measured 482 ms vs the
        # ~60 ms compute)
        if log_n >= 18:
            self.CHUNK = 1
        self.factors = _plan(self.n) if self.n >= MIN_FOURSTEP else None
        if self.factors is not None:
            self._build_tables()

    # --- table construction (host int power chains, one-time per domain) ---
    def _build_tables(self):
        df = self.df
        p = df.field.p
        for forward in (True, False):
            root_n = self.omega if forward else self.omega_inv
            # per-kernel stage-twiddle tables, keyed by sub-length A
            tw = {}
            rem = self.n
            mids = []
            for li, A in enumerate(self.factors):
                # at level li the sub-problem length is `rem`, root w_rem
                w_rem = pow(root_n, self.n // rem, p)
                w_A = pow(w_rem, rem // A, p)
                if A not in tw and A > 1:
                    rows = ints_to_limbs_T(
                        [v * df.R % p for v in pows_host_ints(p, w_A, A // 2)]
                    )  # [16, A/2]
                    # pre-broadcast along the kernel lane block
                    t = np.broadcast_to(
                        rows.T[:, :, None], (A // 2, N_LIMBS, BLK_NTT)
                    )
                    tw[A] = jnp.asarray(np.ascontiguousarray(t))
                B = rem // A
                if li < len(self.factors) - 1:
                    # mid diagonal w_rem^(k1*b), k1 < A, b < B; the inverse
                    # transform folds the global 1/n into the FIRST level's
                    # mid (every element passes through it exactly once)
                    scale = 1 if forward or li > 0 else pow(self.n, p - 2, p)
                    rows = []
                    for k1 in range(A):
                        base = pow(w_rem, k1, p)
                        rows.append(
                            [v * scale % p * df.R % p for v in pows_host_ints(p, base, B)]
                        )
                    flat = [v for row in rows for v in row]
                    mid = ints_to_limbs_T(flat).T.reshape(A, B, N_LIMBS)
                    mids.append(jnp.asarray(np.ascontiguousarray(mid.transpose(0, 2, 1))))
                else:
                    mids.append(None)
                rem = B
            self._tables[forward] = (tw, mids)
        # single-level inverse has no mid to fold 1/n into: guarded in _body
        assert len(self.factors) >= 2 or self.n < MIN_FOURSTEP

    # --- kernel application -------------------------------------------------
    def _kern(self, xk, A, tw, mid):
        """xk: [L, A, 16, B] -> sub-NTT over axis 1 (+ fused mid multiply)."""
        L, _, _, B = xk.shape
        Bp = -(-B // BLK_NTT) * BLK_NTT
        if Bp != B:
            xk = jnp.pad(xk, ((0, 0), (0, 0), (0, 0), (0, Bp - B)))
            if mid is not None:
                mid = jnp.pad(mid, ((0, 0), (0, 0), (0, Bp - B)))
        args = [xk, tw] + ([mid] if mid is not None else [])
        out = pf._guard(
            _colntt_call(
                self.df.p_int, L, A, Bp, BLK_NTT, mid is not None, self._interpret
            )(*args)
        )
        return out[..., :B] if Bp != B else out

    def _rec(self, y, level, forward):
        """y: [L, 16, M] -> NTT along the flat lane axis (natural order)."""
        tw, mids = self._tables[forward]
        A = self.factors[level]
        L, _, M = y.shape
        if level == len(self.factors) - 1:
            # base: lanes become rows (THE four-step transpose)
            z = jnp.transpose(y, (2, 1, 0))  # [M, 16, L]
            z = self._kern(z[None], A, tw[A], None)[0]
            return jnp.transpose(z, (2, 1, 0))
        B = M // A
        z = y.reshape(L, N_LIMBS, A, B)
        z = jnp.transpose(z, (0, 2, 1, 3))  # [L, A, 16, B]
        z = self._kern(z, A, tw[A], mids[level]) if A > 1 else (
            pf.mont_mul(self.df, z, mids[level][None], self._interpret)
        )
        z = self._rec(z.reshape(L * A, N_LIMBS, B), level + 1, forward)
        z = z.reshape(L, A, N_LIMBS, B)
        z = jnp.transpose(z, (0, 2, 3, 1))  # [L, 16, B, A]: X[k2*A+k1]
        return z.reshape(L, N_LIMBS, A * B)

    # --- NTT API overrides --------------------------------------------------
    def _transform(self, x: jax.Array, forward: bool) -> jax.Array:
        if self.factors is None:
            return super()._transform(x, forward)
        lead = x.shape[:-2]
        L = 1
        for d in lead:
            L *= d
        y = x.reshape((L, N_LIMBS, self.n))
        y = self._rec(y, 0, forward)
        return y.reshape(lead + (N_LIMBS, self.n))

    def _body(self, x: jax.Array, forward: bool) -> jax.Array:
        out = self._transform(x, forward)
        if not forward and self.factors is None:
            out = self.df._mont_mul(out, self.n_inv_mont)
        return out

    def _mapped(self, x: jax.Array, forward: bool) -> jax.Array:
        # inverse 1/n is folded into the level-0 mid table; bypass the
        # parent's extra scaling by routing through _body
        batch = x.shape[:-2]
        tail = x.shape[-2:]
        B = 1
        for d in batch:
            B *= d
        xf = x.reshape((B,) + tail)
        out = self._body(xf, forward)
        return out.reshape(batch + tail)

    def inverse(self, evals: jax.Array) -> jax.Array:
        if self.factors is None:
            return super().inverse(evals)
        return self._bwd(evals)
