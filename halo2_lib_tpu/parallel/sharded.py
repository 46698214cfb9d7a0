"""Mesh-sharded prover kernels: data-parallel MSM and all-to-all NTT.

The reference is a single-process rayon library (SURVEY.md §2.4); its TPU
equivalent is a `jax.sharding.Mesh` with XLA collectives over ICI:
  * MSM: points + scalar digits sharded over the `dp` axis; each device runs a
    local batched double-and-add accumulation, partial sums are all_gather'd
    (3 tiny limb tensors) and tree-combined on every device (replicated).
  * NTT: the four-step decomposition — view the length-N vector as [N1, N2]
    with columns sharded; local size-N1 NTTs, twiddle scaling, then an
    all_to_all transpose so the size-N2 NTTs are local again.

These run identically on a virtual CPU mesh (tests / driver dry-run) and a
real TPU slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ec_device import DeviceCurve
from ..ops.limbs import N_LIMBS, DeviceField, _int_to_limbs
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
    Ppts = dc.pack_points(points)
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
        in_specs=(P(None, axis, None), P(None, axis, None), P(None, axis, None), P(None, axis)),
        out_specs=P(None, None, None),
        check_rep=False,
    )
    def run(X, Y, Z, bits_shard):
        m = X.shape[1]
        acc = dc.identity((m,))
        P0 = (X[0], Y[0], Z[0])

        # batched MSB-first double-and-add: acc_i = 2*acc_i + (bit ? P_i : O)
        def body(acc, brow):
            acc = dc._double(acc)
            added = dc._add(acc, P0)
            acc = dc.select(brow, added, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc, bits_shard)
        # local tree reduce to one point, then all_gather across devices
        x, y, z = acc
        while x.shape[0] > 1:
            half = x.shape[0] // 2
            rem = x.shape[0] - 2 * half
            s = dc._add((x[:half], y[:half], z[:half]), (x[half : 2 * half], y[half : 2 * half], z[half : 2 * half]))
            if rem:
                x = jnp.concatenate([s[0], x[2 * half :]], 0)
                y = jnp.concatenate([s[1], y[2 * half :]], 0)
                z = jnp.concatenate([s[2], z[2 * half :]], 0)
            else:
                x, y, z = s
        gx = jax.lax.all_gather(x[0], axis)  # [ndev, 16]
        gy = jax.lax.all_gather(y[0], axis)
        gz = jax.lax.all_gather(z[0], axis)
        # combine the ndev partials (replicated work, tiny; fori keeps the
        # EC-add graph instantiated once)
        def comb(d, p):
            return dc._add(p, (gx[d], gy[d], gz[d]))

        px, py, pz = jax.lax.fori_loop(1, gx.shape[0], comb, (gx[0], gy[0], gz[0]))
        return jnp.stack([px, py, pz])[None]

    # X/Y/Z: [n, 16] -> add leading singleton so in_spec can shard axis 1
    X, Y, Z = (t[None] for t in Ppts)
    out = run(X, Y, Z, bits)
    out = np.asarray(jax.device_get(out))[0]
    return dc.unpack_points((out[0], out[1], out[2]))[0]


# ---------------------------------------------------------------------------
# sharded NTT (four-step decomposition)
# ---------------------------------------------------------------------------

class ShardedNTT:
    """Size-2^k NTT over Fr as [N1, N2] four-step with all_to_all transpose.

    N1 = number of devices * local rows? Here we choose N1 = n_devices-sized
    blocks: columns sharded for step 1, rows sharded after the transpose.
    """

    def __init__(self, df: DeviceField, k: int, mesh: Mesh):
        from ..ops.ntt import NTT

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
        # twiddle matrix W^(i*j) for i < n1, j < n2 (Montgomery form)
        p = df.field.p
        w = df.field.nth_root_of_unity(k)
        R = df.R
        tw = np.zeros((self.n1, self.n2, N_LIMBS), dtype=np.uint32)
        for i in range(self.n1):
            wi = pow(w, i, p)
            cur = 1
            for j in range(self.n2):
                tw[i, j] = _int_to_limbs((cur * R) % p)
                cur = cur * wi % p
        self.twiddle = jnp.asarray(tw)

    def forward(self, coeffs):
        """coeffs [n, 16] -> evals in natural order [n, 16]."""
        df = self.df
        mesh = self.mesh
        axis = self.axis
        n1, n2 = self.n1, self.n2

        # matrix view: a[i1, i2], i = i1 * n2 + i2 (row-major)
        A = coeffs.reshape(n1, n2, N_LIMBS)

        @jax.jit
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, axis, None), P(None, axis, None)),
            out_specs=P(axis, None, None),
            check_rep=False,
        )
        def step(a, tw):
            # step 1: size-n1 NTT along axis 0 (columns are local)
            b = jax.vmap(lambda v: self.ntt1._transform(v, True), in_axes=1, out_axes=1)(a)
            # step 2: twiddle scale W^{k1 * i2}
            b = df._mont_mul(b, tw)
            # step 3: transpose via all_to_all: [n1, n2/d] -> [n1/d, n2]
            b = jax.lax.all_to_all(b, axis, split_axis=0, concat_axis=1, tiled=True)
            # step 4: size-n2 NTT along axis 1 (rows are local)
            c = jax.vmap(lambda v: self.ntt2._transform(v, True), in_axes=0, out_axes=0)(b)
            return c

        out = step(A, self.twiddle)
        # out[k1, k2] = X[k2 * n1 + k1] (transposed index order)
        return out.reshape(n1, n2, N_LIMBS).transpose(1, 0, 2).reshape(self.n, N_LIMBS)


def sharded_ntt_step(df: DeviceField, k: int, mesh: Mesh, coeffs):
    """One sharded forward NTT; returns evals [n, 16] (natural order)."""
    sn = ShardedNTT(df, k, mesh)
    return sn.forward(coeffs)
