"""Mesh-sharded prover kernels: data-parallel MSM and all-to-all NTT.

The reference is a single-process rayon library (SURVEY.md §2.4); its TPU
equivalent is a `jax.sharding.Mesh` with XLA collectives over ICI:
  * MSM: points + scalar bits sharded over the `dp` axis; each device runs a
    local batched double-and-add accumulation, partial sums are all_gather'd
    (3 tiny limb tensors) and tree-combined on every device (replicated).
  * NTT: the four-step decomposition — view the length-N vector as [N1, N2]
    with columns sharded; local size-N1 NTTs, twiddle scaling, then an
    all_to_all transpose so the size-N2 NTTs are local again.

Tensors are limb-major uint32[..., 16, B] (ops/limbs.py). These run
identically on a virtual CPU mesh (tests / driver dry-run) and a real TPU
slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ec_device import DeviceCurve
from ..ops.limbs import N_LIMBS, DeviceField
from ..utils.fields import FR_BN254


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------

def sharded_msm(dc: DeviceCurve, points, scalars: list[int], mesh: Mesh):
    """MSM with points sharded across the mesh's first axis.

    Uses the compile-light batched double-and-add accumulation per shard
    (the Pippenger kernel in ops/ec_device.py is the single-chip fast path;
    fusing it with sharding is a later optimization).
    Returns the affine host point.
    """
    (axis,) = mesh.axis_names
    ndev = mesh.devices.size
    n = len(points)
    pad = (-n) % ndev
    points = list(points) + [None] * pad
    scalars = list(scalars) + [0] * pad
    Ppts = dc.pack_points(points)  # (X, Y, Z) uint32[16, n]
    nbits = dc.curve.scalar.num_bits
    bits = np.zeros((nbits, len(points)), dtype=bool)
    for i, s in enumerate(scalars):
        s = int(s) % dc.curve.scalar.p
        for b in range(nbits):
            bits[b, i] = (s >> (nbits - 1 - b)) & 1
    bits = jnp.asarray(bits)

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, None, None),
        check_rep=False,
    )
    def run(X, Y, Z, bits_shard):
        acc = dc.identity((X.shape[-1],))
        P0 = (X, Y, Z)

        # batched MSB-first double-and-add: acc_i = 2*acc_i + (bit ? P_i : O)
        def body(acc, brow):
            acc = dc._double(acc)
            added = dc._add(acc, P0)
            acc = dc.select(brow, added, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits_shard)
        # local tree reduce to one point, then all_gather across devices
        x, y, z = dc.tree_reduce(acc)  # [16, 1] each
        gx = jax.lax.all_gather(x, axis)  # [ndev, 16, 1]
        gy = jax.lax.all_gather(y, axis)
        gz = jax.lax.all_gather(z, axis)

        # combine the ndev partials (replicated work, tiny; fori keeps the
        # EC-add graph instantiated once)
        def comb(d, p):
            return dc._add(p, (gx[d], gy[d], gz[d]))

        px, py, pz = jax.lax.fori_loop(1, gx.shape[0], comb, (gx[0], gy[0], gz[0]))
        return jnp.stack([px, py, pz])  # [3, 16, 1]

    out = run(*Ppts, bits)
    out = jnp.asarray(out)
    return dc.unpack_points((out[0], out[1], out[2]))[0]


# ---------------------------------------------------------------------------
# sharded NTT (four-step decomposition)
# ---------------------------------------------------------------------------

class ShardedNTT:
    """Size-2^k NTT over Fr as [N1, N2] four-step with all_to_all transpose.

    Step 1 runs size-N1 NTTs with columns (N2) sharded; the all_to_all
    transpose re-shards rows so the size-N2 NTTs are local again.
    """

    def __init__(self, df: DeviceField, k: int, mesh: Mesh):
        from ..ops.ntt import NTT, pows_host

        self.df = df
        self.mesh = mesh
        (self.axis,) = mesh.axis_names
        self.k = k
        self.n = 1 << k
        k1 = k // 2
        self.n1 = 1 << k1
        self.n2 = 1 << (k - k1)
        self.ntt1 = NTT(df, k1)
        self.ntt2 = NTT(df, k - k1)
        # twiddle matrix W^(i*j), stored [n2, 16, n1] so the scale multiply
        # sees the limb axis at -2 (the limb-major contract of ops/limbs.py).
        pows = pows_host(df, df.field.nth_root_of_unity(k), self.n, device=False)
        ij = (
            np.arange(self.n2, dtype=np.int64)[:, None]
            * np.arange(self.n1, dtype=np.int64)[None, :]
        ) % self.n
        tw = pows[:, ij.reshape(-1)].reshape(N_LIMBS, self.n2, self.n1)
        self.twiddle = jnp.asarray(np.ascontiguousarray(tw.transpose(1, 0, 2)))

    def forward(self, coeffs):
        """coeffs [16, n] -> evals in natural order [16, n]."""
        df = self.df
        mesh = self.mesh
        axis = self.axis
        n1, n2 = self.n1, self.n2

        # matrix view: a[:, i1, i2], i = i1 * n2 + i2 (row-major)
        A = coeffs.reshape(N_LIMBS, n1, n2)

        @jax.jit
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, axis), P(axis, None, None)),
            out_specs=P(None, axis, None),
            check_rep=False,
        )
        def step(a, tw):
            # step 1: size-n1 NTT along axis 1 (columns are local); keep the
            # column-leading [n2/d, 16, n1] layout (limbs at -2) for step 2
            b = self.ntt1._transform(a.transpose(2, 0, 1), True)
            # step 2: twiddle scale (tw shard is [n2/d, 16, n1])
            b = df._mont_mul(b, tw).transpose(1, 2, 0)  # -> [16, n1, n2/d]
            # step 3: transpose via all_to_all: [16, n1, n2/d] -> [16, n1/d, n2]
            b = jax.lax.all_to_all(b, axis, split_axis=1, concat_axis=2, tiled=True)
            # step 4: size-n2 NTT along axis 2 (rows are local)
            c = self.ntt2._transform(b.transpose(1, 0, 2), True).transpose(1, 0, 2)
            return c

        out = step(A, self.twiddle)
        # out[:, k1, k2] = X[k2 * n1 + k1] (transposed index order)
        return out.transpose(0, 2, 1).reshape(N_LIMBS, self.n)


def sharded_ntt_step(df: DeviceField, k: int, mesh: Mesh, coeffs):
    """One sharded forward NTT; returns evals [16, n] (natural order)."""
    sn = ShardedNTT(df, k, mesh)
    return sn.forward(coeffs)
