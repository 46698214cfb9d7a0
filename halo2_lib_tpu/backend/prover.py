"""create_proof: the PlonKish KZG prover (SHPLONK multiopen, Blake2b FS).

Role of halo2-axiom's `create_proof::<KZGCommitmentScheme, ProverSHPLONK,
Challenge255, _, Blake2bWrite, _>` (SURVEY.md §2.9, §3.3).

TPU-first execution structure: the prover is organised around the
Fiat-Shamir phases. Each phase between two transcript squeezes is ONE
fused jitted dispatch — batched column math, batched NTTs, and ONE batched
multi-column MSM — so a proof costs ~8 device round trips total instead of
hundreds (each round trip is ~30 ms over a remote-tunnel backend, and any
bulk host<->device traffic is far worse). Columns in evaluation form commit
directly against the Lagrange-basis SRS (no per-column IFFT on the commit
path); coefficient-form polynomials (quotient pieces, SHPLONK openings) use
the monomial basis. Witness columns upload ONCE as uint16 limb tensors.

Per-proving-key device state (fixed/sigma/selector/table columns in
Lagrange, coefficient and extended-coset form, plus domain constants) is
computed once and cached on the ProvingKey (`_runtime`).

Protocol phases (must mirror verifier.py exactly):
  vk hash + instances -> advice commitments -> theta -> lookup permuted
  commitments -> beta, gamma -> permutation + lookup Z commitments -> random
  poly -> y -> quotient pieces -> x -> evals -> SHPLONK(v, w; H; u; Q).
"""

from __future__ import annotations

import os as _os
import random as _random
import time as _time

import numpy as np

import jax
import jax.numpy as jnp

from ..gates.circuit import BaseCircuitBuilder, PhysicalCircuit
from ..ops.limbs import N_LIMBS, ints_to_limbs
from ..utils.fields import FR_BN254
from .keygen import BLINDING_FACTORS, DELTA, ProvingKey
from .kzg import ParamsKZG
from .poly import domain as get_domain
from .protocol import (
    P,
    compress_host,
    group_queries,
    lagrange_interpolate,
    lookup_instances,
    perm_chunks,
    point_values,
    poly_eval,
    query_plan,
    quotient_pieces,
    usable_row_count,
    vanishing_poly,
)
from .transcript import Blake2bWrite

_DEBUG = _os.environ.get("HALO2_PROVER_DEBUG") == "1"


def _stage(label: str, t0: float) -> float:
    now = _time.time()
    if _DEBUG:
        import sys as _sys

        print(f"[prover] {label}: {now - t0:.2f}s", file=_sys.stderr, flush=True)
    return now


def _pad(col: list[int], n: int) -> list[int]:
    return list(col) + [0] * (n - len(col))


def _blind(col: list[int], n: int, rng) -> list[int]:
    """Fill the last BLINDING_FACTORS rows with random values (zk blinding)."""
    out = _pad(col, n)
    for r in range(n - BLINDING_FACTORS, n):
        out[r] = rng.randrange(P)
    return out


def _permute_pair_np(a_vals, s_vals, u: int, n: int, rng):
    """Vectorized permute_expression_pair for u64-range values (the common
    range-lookup case: everything < 2^lookup_bits). Byte-identical output to
    the exact-int path below, including halo2's leftover ordering (each
    distinct table value's remaining copies in FIRST-OCCURRENCE order)."""
    a, s = a_vals, s_vals
    a_sorted = np.sort(a)
    new_mask = np.ones(u, dtype=bool)
    new_mask[1:] = a_sorted[1:] != a_sorted[:-1]
    a_uniq = a_sorted[new_mask]
    # table multiset in first-occurrence order
    vals, first_idx, counts = np.unique(s, return_index=True, return_counts=True)
    order = np.argsort(first_idx, kind="stable")
    vals, counts = vals[order], counts[order]
    consumed = np.isin(vals, a_uniq)
    # every distinct input value must exist in the table
    if not np.isin(a_uniq, vals).all():
        missing = a_uniq[~np.isin(a_uniq, vals)][0]
        raise ValueError(f"lookup failure: value {missing} not in table")
    leftovers = np.repeat(vals, counts - consumed.astype(np.int64))
    s_out = np.where(new_mask, a_sorted, 0)
    s_out[~new_mask] = leftovers[: (~new_mask).sum()]
    a_p = _blind([int(v) for v in a_sorted], n, rng)
    s_p = _blind([int(v) for v in s_out], n, rng)
    return a_p, s_p


def _permute_pair(a_vals: list[int], s_vals: list[int], u: int, n: int, rng):
    """halo2 permute_expression_pair: sort input; align table (lookup/prover.rs)."""
    try:
        a64 = np.asarray(a_vals[:u], dtype=np.int64)
        s64 = np.asarray(s_vals[:u], dtype=np.int64)
    except OverflowError:
        a64 = s64 = None  # full-width values: exact-int path below
    if a64 is not None and len(a64) == u and (a64 >= 0).all() and (s64 >= 0).all():
        return _permute_pair_np(a64, s64, u, n, rng)
    a_sorted = sorted(a_vals[:u])
    s_multiset: dict[int, int] = {}
    for v in s_vals[:u]:
        s_multiset[v] = s_multiset.get(v, 0) + 1
    s_out: list[int | None] = [None] * u
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            cnt = s_multiset.get(v, 0)
            if cnt == 0:
                raise ValueError(f"lookup failure: value {v} not in table")
            s_multiset[v] = cnt - 1
            s_out[i] = v
    leftovers = []
    for v, c in s_multiset.items():
        leftovers.extend([v] * c)
    it = iter(leftovers)
    for i in range(u):
        if s_out[i] is None:
            s_out[i] = next(it)
    a_p = _blind(a_sorted, n, rng)
    s_p = _blind([int(v) for v in s_out], n, rng)
    return a_p, s_p


def _u16_cols(cols: list[list[int]], n: int) -> np.ndarray:
    """Host int columns -> uint16[C, n, 16] canonical limb tensor (compact
    upload format: half the bytes of the uint32 device layout). Uses the
    native C packer when available (~10x over per-int to_bytes for the
    mostly-full-width field elements of real witness columns)."""
    if not cols:
        return np.zeros((0, n, N_LIMBS), dtype=np.uint16)
    flat: list[int] = []
    for c in cols:
        assert len(c) == n
        flat.extend(c)
    from ..native import get_native

    nat = get_native()
    if nat is not None and hasattr(nat, "pack_limbs16"):
        buf = nat.pack_limbs16(flat)
        return np.frombuffer(buf, dtype="<u2").reshape(len(cols), n, N_LIMBS)
    return ints_to_limbs(flat).astype(np.uint16).reshape(len(cols), n, N_LIMBS)


_LAG_JITS: dict = {}


def _lag_from_u16(df, cols_u16):
    """uint16[C, n, 16] uploaded columns -> uint32[C, 16, n] Montgomery-
    Lagrange, dispatched in host chunks so ONE executable per (field, n,
    chunk size) is shared by keygen and every prover stage (advice, dyn,
    permuted, ...) regardless of the column count."""
    from ..ops.ntt import dispatch_cols

    C, n, _ = cols_u16.shape
    if C == 0:
        return jnp.zeros((0, N_LIMBS, n), jnp.uint32)

    def jit_for(b):
        key = (df.p_int, n, b)
        fn = _LAG_JITS.get(key)
        if fn is None:
            fn = jax.jit(
                lambda c: df._to_mont(c.astype(jnp.uint32).transpose(0, 2, 1))
            )
            _LAG_JITS[key] = fn
        return fn

    return dispatch_cols(cols_u16, 8, jit_for)


def _row_sharder(mesh):
    """Shard the row axis n of column tensors over the mesh's first axis.
    Uploaded u16 tensors are [C, n, 16] (rows at -2); device limb-major
    tensors are [C, 16, n] (rows at -1) — shard whichever axis is the large
    power-of-two one. The stage jits then run SPMD: XLA's partitioner
    propagates the sharding through to_mont/NTT/MSM/expression graphs and
    inserts the collectives (all_gather/psum/collective_permute) where
    columns mix — the 'annotate shardings, let XLA insert collectives'
    recipe. n = 2^k is always divisible by the mesh size."""
    if mesh is None:
        return lambda t: t
    from jax.sharding import NamedSharding, PartitionSpec

    ax = mesh.axis_names[0]

    def shard(t):
        ndev = mesh.devices.size
        if t.ndim < 2:
            return t
        row_ax = -2 if t.shape[-2] > t.shape[-1] else -1
        if t.shape[row_ax] % ndev == 0 and t.shape[row_ax] >= ndev:
            spec = [None] * t.ndim
            spec[row_ax] = ax
            return jax.device_put(t, NamedSharding(mesh, PartitionSpec(*spec)))
        return t

    return shard


class ProverRuntime:
    """Per-(params, pk) device state + jitted FS-phase stage functions."""

    def __init__(self, params: ParamsKZG, pk: ProvingKey, mesh=None):
        self.params = params
        self.pk = pk
        self.mesh = mesh
        self.shard = _row_sharder(mesh)
        vk = pk.vk
        self.vk = vk
        self.k = vk.k
        self.n = 1 << vk.k
        self.u = usable_row_count(self.n)
        self.dom = get_domain(vk.k)
        self.df = self.dom.df
        n, u, dom, df = self.n, self.u, self.dom, self.df

        # --- per-pk device tables (one-time) -------------------------------
        t0 = _time.time()
        _tt = t0
        ncols = len(vk.perm_columns)
        self.nchunks = len(perm_chunks(ncols))

        fixed_host = {
            "sel": pk.selectors,
            "fix": pk.fixed_cols,
            "dynen": pk.dynen_cols,
            "qlookup": [pk.q_lookup_col] if pk.q_lookup_col is not None else [],
            "table": [pk.table_col] if pk.table_col is not None else [],
        }
        # domain constants ride the same table pipeline as the pk columns:
        # l0/llast/lact (Lagrange selectors) and X (whose Lagrange form on H
        # is simply w^i) are appended as extra columns, so their extended-
        # coset forms come out of the SAME chunked NTT dispatches — no
        # separate compiles.
        from ..ops.ntt import pows_host_ints

        l0 = [0] * n
        l0[0] = 1
        llast = [0] * n
        llast[u] = 1
        lact = [1 if r < u else 0 for r in range(n)]
        xlag = pows_host_ints(FR_BN254.p, dom.omega, n)
        fixed_host["const"] = [l0, llast, lact, xlag]
        const_names = {"const0": "l0", "const1": "llast", "const2": "lact", "const3": "xpoly"}
        # challenge-pin selectors L_row: DERIVED from the vk like l0/llast —
        # one-hot Lagrange columns riding the same NTT pipeline, but never
        # committed (the verifier computes L_row(x) in closed form)
        for i, (_c, _fc, row) in enumerate(vk.challenge_pins):
            pin = [0] * n
            pin[row] = 1
            const_names[f"const{len(fixed_host['const'])}"] = f"pinrow{i}"
            fixed_host["const"].append(pin)

        stacked = []
        self._tbl_index: dict[str, int] = {}
        for fam, cols in fixed_host.items():
            for i, c in enumerate(cols):
                name = f"{fam}{i}" if fam != "table" else "table"
                self._tbl_index[const_names.get(name, name)] = len(stacked)
                stacked.append(_pad(c, n))
        # sigma columns arrive as a device Montgomery tensor from keygen
        for ci in range(ncols):
            self._tbl_index[f"sigma{ci}"] = len(stacked) + ci
        tbl_u16 = self.shard(jnp.asarray(_u16_cols(stacked, n)))
        sigma_mont = self.shard(pk.perm_values)
        _tt = _stage("rt: pk u16 packing", _tt)

        # chunked host dispatches — every stage below reuses executables
        # shared with keygen and the proof-time column pipelines
        lag_cols = _lag_from_u16(df, tbl_u16)
        self.tbl_lag = jnp.concatenate([lag_cols, sigma_mont], axis=0)
        self.tbl_coeff = dom.ntt.inverse_cols(self.tbl_lag)
        self.tbl_ext = dom.coset_ntt.forward_cols(_pad_coeff(self.tbl_coeff, dom.n_ext))
        jax.block_until_ready(self.tbl_ext)
        _tt = _stage("rt: pk table prep (to_mont+NTTs)", _tt)

        tix = self._tbl_index
        # All per-pk device state is passed to the stage jits as ARGUMENTS
        # (a pytree dict): closure-captured concrete arrays would become
        # compile-time constants baked into (and hashed with) every stage
        # executable — slow compiles and bloated cache entries.
        self.tables = {
            "lag": self.tbl_lag,
            "coeff": self.tbl_coeff,
            "ext": self.tbl_ext,
            "l0_e": self.tbl_ext[tix["l0"]],
            "llast_e": self.tbl_ext[tix["llast"]],
            "lact_e": self.tbl_ext[tix["lact"]],
            "x_poly_e": self.tbl_ext[tix["xpoly"]],
            "omega": dom.omega_pows_dev(),
            "zh_inv": dom.zh_inv_ext,
            "lagA": params.affine_lagrange_bases(),
            "monoA": params.affine_bases(),
        }
        _tt = _stage("rt: base packing", _tt)

        self._stages: dict[str, object] = {}
        if _DEBUG:
            _stage("runtime init", t0)

    def jit(self, name: str, fn):
        if name not in self._stages:
            self._stages[name] = jax.jit(fn)
        return self._stages[name]


def _pad_coeff(coeff, n_ext):
    """[..., 16, n] coeffs -> zero-padded [..., 16, n_ext]."""
    pad = [(0, 0)] * coeff.ndim
    pad[-1] = (0, n_ext - coeff.shape[-1])
    return jnp.pad(coeff, pad)


def _host_points(dc, got) -> list:
    """Packed device commitments uint32[C, 33] (x|y|inf) -> host affine
    points (None = identity). ONE device->host transfer."""
    from ..ops.limbs import limbs_to_ints

    packed = np.asarray(jax.device_get(got)).reshape(-1, 33)
    xs = limbs_to_ints(packed[:, :N_LIMBS])
    ys = limbs_to_ints(packed[:, N_LIMBS : 2 * N_LIMBS])
    return [None if i else (x, y) for x, y, i in zip(xs, ys, packed[:, 32])]


def _tree_sum(df, stack):
    """Field sum along axis 0 of [m, ..., 16, B] (log-depth)."""
    s = stack
    while s.shape[0] > 1:
        half = s.shape[0] // 2
        red = df._add(s[:half], s[half : 2 * half])
        if s.shape[0] % 2:
            red = jnp.concatenate([df._add(red[:1], s[-1:]), red[1:]], axis=0)
        s = red
    return s[0]


def _tree_sum_lanes(df, t):
    """Field sum along the LANE axis of [..., 16, B] -> [..., 16, 1]."""
    s = t
    while s.shape[-1] > 1:
        half = s.shape[-1] // 2
        red = df._add(s[..., :half], s[..., half : 2 * half])
        if s.shape[-1] % 2:
            red = jnp.concatenate(
                [df._add(red[..., :1], s[..., -1:]), red[..., 1:]], axis=-1
            )
        s = red
    return s


def _tree_prod(df, stack):
    """Field product along axis 0 of [m, ..., 16, B] (log-depth)."""
    s = stack
    while s.shape[0] > 1:
        half = s.shape[0] // 2
        red = df._mont_mul(s[:half], s[half : 2 * half])
        if s.shape[0] % 2:
            red = jnp.concatenate([df._mont_mul(red[:1], s[-1:]), red[1:]], axis=0)
        s = red
    return s[0]


def _flatten_lookup_cols(builder, t: int, nlookup: int) -> list[list[int]]:
    """Only the lookup-advice columns of phase t (the gate-advice columns
    were already flattened elsewhere, e.g. by the phase-0 pipeline)."""
    lm = builder.lookup_manager[t]
    lk: list[list[int]] = [[] for _ in range(nlookup)]
    if lm.total_rows() > 0 and nlookup > 0:
        from ..core.cells import assigned_to_int

        for i, cell_tuple in enumerate(lm.iter_rows()):
            lk[i % nlookup].append(assigned_to_int(cell_tuple[0].value, builder.field))
        lm.assigned = True
    return lk


def _flatten_prover_phase(builder, t: int, ncols: int, nlookup: int, usable_rows: int):
    """Flatten phase t of a builder for PROVING (no copy constraints needed).

    Returns (advice column int lists, lookup column int lists). Used by the
    multi-phase path where later-phase witnesses only exist after the earlier
    phase challenges were squeezed (halo2 challenge phases).
    """
    builder.core.touch(t)
    pm = builder.core.phase_manager[t]
    if builder.witness_gen_only():
        assert pm.break_points is not None, "break points not set for prover"
        fp = pm.flatten_witnesses(ncols, pm.break_points)
    else:
        fp = pm.flatten_with_constraints(ncols, usable_rows)
    adv = [fp.columns[i] if i < len(fp.columns) else [] for i in range(ncols)]
    return adv, _flatten_lookup_cols(builder, t, nlookup)


def _selfcheck_h(
    vk, pk, dom, u, advice_vals, lookup_vals, dyn_vals, instance_vals,
    permuted_host, allz_lag, insts, host_col, theta, beta, gamma,
):
    """HALO2_PROVER_SELFCHECK=1: re-verify every argument family pointwise on
    H with exact host ints (fault localization for 'quotient degree
    overflow' — names the first violated family and row)."""
    n = 1 << vk.k
    ncols = len(vk.perm_columns)
    chunks = perm_chunks(ncols)
    nchunks = len(chunks)
    ninst = len(insts)
    z_all = dom.unpack(allz_lag)
    zs = [z_all[j * n : (j + 1) * n] for j in range(nchunks + ninst + 1)]
    sigma = dom.unpack(pk.perm_values)
    sig = [sigma[c * n : (c + 1) * n] for c in range(ncols)]

    def col_vals(cr):
        if cr.kind == "advice":
            return _pad(advice_vals[cr.index], n)
        if cr.kind == "lookup":
            return _pad(lookup_vals[cr.index], n)
        if cr.kind == "fixed":
            return pk.fixed_cols[cr.index]
        if cr.kind == "instance":
            return instance_vals[cr.index]
        if cr.kind == "dynadv":
            return dyn_vals[cr.index]
        raise ValueError(cr.kind)

    vals = [col_vals(cr) for cr in vk.perm_columns]
    fails = []
    # permutation chunks
    for j, (s, e) in enumerate(chunks):
        z = zs[j]
        if z[0] != (1 if j == 0 else zs[j - 1][u]):
            fails.append(f"permz{j} start row0")
        for r in range(u):
            left = z[(r + 1) % n]
            right = z[r]
            for ci in range(s, e):
                if ci >= ncols:
                    continue
                left = left * ((vals[ci][r] + beta * sig[ci][r] + gamma) % P) % P
                bd = beta * pow(DELTA, ci, P) % P
                right = right * ((vals[ci][r] + bd * pow(dom.omega, r, P) + gamma) % P) % P
            if left != right:
                fails.append(f"permz{j} row {r}")
                break
    # lookups
    for li, (inp, tbl) in enumerate(insts):
        a_in = compress_host([host_col(lb) for lb in inp], theta, u)
        t_in = compress_host([host_col(lb) for lb in tbl], theta, u)
        a_p = permuted_host[2 * li]
        s_p = permuted_host[2 * li + 1]
        zl = zs[nchunks + li]
        if zl[0] != 1:
            fails.append(f"lk{li} z row0 != 1")
        if zl[u] * zl[u] % P != zl[u]:
            fails.append(f"lk{li} z last not bool")
        if (a_p[0] - s_p[0]) % P != 0:
            fails.append(f"lk{li} e4 row0")
        for r in range(u):
            left = zl[(r + 1) % n] * ((a_p[r] + beta) % P) % P * ((s_p[r] + gamma) % P) % P
            right = zl[r] * ((a_in[r] + beta) % P) % P * ((t_in[r] + gamma) % P) % P
            if left != right:
                fails.append(f"lk{li} e3 row {r}")
                break
            d = (a_p[r] - s_p[r]) % P
            prev = a_p[r - 1] if r else a_p[n - 1]
            if d and (a_p[r] - prev) % P != 0:
                fails.append(f"lk{li} e5 row {r}")
                break
    import sys as _sys

    msg = "; ".join(fails) if fails else "all argument families hold on H"
    print(f"[prover selfcheck] {msg}", file=_sys.stderr, flush=True)


def create_proof(
    params: ParamsKZG,
    pk: ProvingKey,
    builder_or_circuit,
    instances: list[list[int]] | None = None,
    seed: int = 0,
    phase_fns: dict | None = None,
    mesh=None,
    phase0=None,
) -> bytes:
    """Generate a proof.

    `phase_fns`: optional {phase t >= 1: fn(builder, challenges)} witness
    closures for halo2-style challenge phases — fn is called AFTER the
    phase-(t-1) advice commitments, with `challenges` the list of phase
    challenges squeezed so far, and must append the phase-t witnesses to the
    builder (reference: challenges usable after FirstPhase/SecondPhase,
    flex_gate/mod.rs:63-67; the squeeze itself lives in halo2-axiom's
    create_proof). Requires passing a builder, not a synthesized circuit.
    """
    vk = pk.vk
    k = vk.k
    n = 1 << k
    u = usable_row_count(n)
    rng = _random.Random(("create-proof-blinding", seed).__repr__())
    _t = _time.time()

    builder = None
    if phase_fns or phase0 is not None:
        assert isinstance(builder_or_circuit, BaseCircuitBuilder), (
            "phase_fns/phase0 require a builder"
        )
        builder = builder_or_circuit
        circuit = None
        if instances is None:
            instances = []
    elif isinstance(builder_or_circuit, BaseCircuitBuilder):
        circuit: PhysicalCircuit = builder_or_circuit.synthesize()
    else:
        circuit = builder_or_circuit
    if instances is None:
        instances = circuit.instances

    rt: ProverRuntime = getattr(pk, "_runtime", None)
    if rt is None or rt.params is not params or rt.mesh is not mesh:
        rt = ProverRuntime(params, pk, mesh)
        pk._runtime = rt
    _shard = rt.shard
    dom, df = rt.dom, rt.df
    dc = params.device_curve()
    na, nl, ncols = vk.num_advice, vk.num_lookup, len(vk.perm_columns)
    nchunks = rt.nchunks
    na_p = vk.num_advice_per_phase or [na]
    nl_p = vk.num_lookup_per_phase or [nl]
    nphases = max(len(na_p), 1)
    insts = lookup_instances(vk)  # range + dynamic lookup instances
    ninst = len(insts)
    nd = 2 * sum(vk.dyn_key_cols)  # dedicated dynamic-lookup advice columns

    # label -> (source, index) for the runtime column stacks
    # (runtime order: advice, lookup, dyn advice, instance, permuted pairs,
    # permutation z, lookup z, random)
    o_adv, o_lk = 0, na
    o_dyn = na + nl
    o_inst = o_dyn + nd
    o_perm = o_inst + vk.num_instance
    o_permz = o_perm + 2 * ninst
    o_lkz = o_permz + nchunks
    o_rand = o_lkz + ninst

    def _src(label):
        if isinstance(label, tuple):  # ("prod", e1, e2) expression
            return ("prod", _src(label[1]), _src(label[2]))
        if label.startswith("adv"):
            return ("rt", o_adv + int(label[3:]))
        if label.startswith("lkcol"):
            return ("rt", o_lk + int(label[5:]))
        if label.startswith("dynen"):
            return ("tbl", rt._tbl_index[label])
        if label.startswith("dyn"):
            return ("rt", o_dyn + int(label[3:]))
        if label.startswith("permz"):
            return ("rt", o_permz + int(label[5:]))
        if label.startswith("lk") and label.endswith("_zl"):
            return ("rt", o_lkz + int(label[2:-3]))
        if label.startswith("lk") and label.endswith("_a"):
            return ("rt", o_perm + 2 * int(label[2:-2]))
        if label.startswith("lk") and label.endswith("_s"):
            return ("rt", o_perm + 2 * int(label[2:-2]) + 1)
        if label == "random":
            return ("rt", o_rand)
        if label == "h":
            return ("h", 0)
        return ("tbl", rt._tbl_index[label])

    inst_srcs = [
        ([_src(lb) for lb in inp], [_src(lb) for lb in tbl]) for inp, tbl in insts
    ]

    instance_vals = [_pad(col, n) for col in instances]
    while len(instance_vals) < vk.num_instance:
        instance_vals.append([0] * n)

    # --- transcript init: vk absorbed as a scalar, halo2's
    # vk.hash_into(transcript) (common_scalar of transcript_repr) -----------
    tr = Blake2bWrite()
    tr.common_scalar(vk.transcript_repr())
    for col in instances:
        for v in col:
            tr.common_scalar(v)
    _t = _stage("setup", _t)

    # === advice commitments, one dispatch per challenge phase ==============
    # Phase t's gate-advice + lookup-advice columns commit together; the
    # phase-t challenge is squeezed before phase t+1's witnesses are
    # generated. Phase 0's dispatch also carries the instance columns
    # (converted to Montgomery-Lagrange form, not committed).
    T = rt.tables
    challenges: list[int] = []
    advice_vals: list[list[int]] = []
    lookup_vals: list[list[int]] = []
    phase_lags = []  # per phase: lag tensor [na_t + nl_t (+ inst), n, 16]
    inst_lag = None

    def _phase_cols(t: int) -> tuple[list[list[int]], list[list[int]]]:
        ncols_t = na_p[t] if t < len(na_p) else 0
        nlk_t = nl_p[t] if t < len(nl_p) else 0
        if circuit is not None:
            fp = circuit.phases[t] if t < len(circuit.phases) else None
            adv = [
                fp.columns[i] if fp and i < len(fp.columns) else [] for i in range(ncols_t)
            ]
            lkc = circuit.lookup_cols[t] if t < len(circuit.lookup_cols) else []
            lk = [lkc[j] if j < len(lkc) else [] for j in range(nlk_t)]
            return adv, lk
        return _flatten_prover_phase(builder, t, ncols_t, nlk_t, u)

    for t in range(nphases):
        if t > 0 and phase_fns and phase_fns.get(t) is not None:
            phase_fns[t](builder, list(challenges))
        if t == 0 and phase0 is not None:
            # phase-0 advice was flattened/blinded/uploaded/committed DURING
            # witness generation (backend/pipeline.py). Skip the advice
            # blinding draws so the rng stream stays byte-identical, then
            # handle only the lookup-advice + instance columns here.
            assert mesh is None and circuit is None
            adv_t = phase0.advice_cols
            for _ in range(len(adv_t) * BLINDING_FACTORS):
                rng.randrange(P)
            lk_t = _flatten_lookup_cols(builder, 0, nl_p[0] if nl_p else 0)
            lk_t = [_blind(col, n, rng) for col in lk_t]
            advice_vals.extend(adv_t)
            lookup_vals.extend(lk_t)
            ncommit = len(adv_t) + len(lk_t)
            rest = lk_t + instance_vals
            parts = list(phase0.u16_parts)
            if rest:
                parts.append(jnp.asarray(_u16_cols(rest, n)))
            cols_u16 = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            lag_t = _lag_from_u16(df, cols_u16)
            com_rows = list(phase0.commit_rows)
            if lk_t:
                lkc = params.commit_host_ints(lk_t, True)
                com_rows.extend(lkc)
            com1 = np.stack(com_rows)
        else:
            adv_t, lk_t = _phase_cols(t)
            adv_t = [_blind(col, n, rng) for col in adv_t]
            lk_t = [_blind(col, n, rng) for col in lk_t]
            advice_vals.extend(adv_t)
            lookup_vals.extend(lk_t)
            ncommit = len(adv_t) + len(lk_t)
            cols = adv_t + lk_t + (instance_vals if t == 0 else [])
            cols_u16 = _shard(jnp.asarray(_u16_cols(cols, n)))

            # device upload + to_mont dispatches ASYNC; the native threaded
            # Pippenger commits the same host ints concurrently (kzg.py)
            lag_t = _lag_from_u16(df, cols_u16)
            if params.host_ints_commit_wanted(n):
                com1 = params.commit_host_ints(cols[:ncommit], True)
            else:
                com1 = params.commit_columns(df, lag_t[:ncommit], T["lagA"])
        for pt in _host_points(dc, com1):
            tr.write_point(pt)
        if t == 0:
            inst_lag = lag_t[ncommit:]
        phase_lags.append((lag_t[: len(adv_t)], lag_t[len(adv_t) : ncommit]))
        if t < nphases - 1:
            challenges.append(tr.squeeze_challenge())

    if nphases == 1:
        adv_lag, lk_lag = phase_lags[0]
    else:
        cat = lambda xs: (
            jnp.concatenate(xs, axis=0)
            if len(xs) > 1
            else (xs[0] if xs else jnp.zeros((0, N_LIMBS, n), jnp.uint32))
        )
        adv_lag = cat([a for a, _ in phase_lags])
        lk_lag = cat([l for _, l in phase_lags])

    # dynamic-lookup dedicated advice columns (committed after phase advice)
    dyn_vals: list[list[int]] = []
    if circuit is not None:
        for s in circuit.dyn_sets:
            for col in s["key_cols"] + s["table_cols"]:
                dyn_vals.append(_blind(col, n, rng))
    elif builder is not None and builder.dyn_lookup_manager is not None:
        for s in builder.dyn_lookup_manager.resolve_columns(builder.field, True):
            for col in s["key_cols"] + s["table_cols"]:
                dyn_vals.append(_blind(col, n, rng))
    assert len(dyn_vals) == nd, "dyn lookup columns don't match the proving key"
    if nd:
        dyn_u16 = _shard(jnp.asarray(_u16_cols(dyn_vals, n)))

        dyn_lag = _lag_from_u16(df, dyn_u16)
        if params.host_ints_commit_wanted(n):
            comd = params.commit_host_ints(dyn_vals, True)
        else:
            comd = params.commit_columns(df, dyn_lag, T["lagA"])
        for pt in _host_points(dc, comd):
            tr.write_point(pt)
    else:
        dyn_lag = jnp.zeros((0, N_LIMBS, n), jnp.uint32)
    _t = _stage("advice commits", _t)

    theta = tr.squeeze_challenge()  # lookup input/table compression

    # === phase 2: lookup permuted columns ==================================
    def _host_col(label):
        if isinstance(label, tuple):
            return (label[0], _host_col(label[1]), _host_col(label[2]))
        if label.startswith("lkcol"):
            return lookup_vals[int(label[5:])]
        if label.startswith("dynen"):
            return pk.dynen_cols[int(label[5:])]
        if label.startswith("dyn"):
            return dyn_vals[int(label[3:])]
        if label.startswith("adv"):
            return advice_vals[int(label[3:])]
        if label == "qlookup0":
            return pk.q_lookup_col
        if label == "table":
            return pk.table_col
        raise ValueError(label)

    permuted_host = []
    for inp_labels, tbl_labels in insts:
        a_comp = compress_host([_host_col(lb) for lb in inp_labels], theta, u)
        s_comp = compress_host([_host_col(lb) for lb in tbl_labels], theta, u)
        a_p, s_p = _permute_pair(a_comp, s_comp, u, n, rng)
        permuted_host.extend([a_p, s_p])
    perm_u16 = _shard(jnp.asarray(_u16_cols(permuted_host, n)))

    permuted_lag = _lag_from_u16(df, perm_u16)
    if params.host_ints_commit_wanted(n):
        com2 = params.commit_host_ints(permuted_host, True)
    else:
        com2 = params.commit_columns(df, permuted_lag, T["lagA"])
    for pt in _host_points(dc, com2):
        tr.write_point(pt)
    _t = _stage("lookup permuted", _t)

    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()

    # === phase 3: permutation + lookup grand products + random poly ========
    # host scalars for the identity side: beta * delta^ci
    beta_deltas = [beta * pow(DELTA, ci, P) % P for ci in range(ncols)]
    # blinding rows for the z columns and the random column (in one upload)
    zblind = [[rng.randrange(P) for _ in range(n - u - 1)] for _ in range(nchunks + ninst)]
    random_lag_vals = [rng.randrange(P) for _ in range(n)]
    # scal layout: [theta, beta, gamma, beta*delta^0, ...]
    scal3 = dom.pack([theta, beta, gamma] + beta_deltas)
    zb_u16 = jnp.asarray(_u16_cols(zblind, n - u - 1)) if zblind else jnp.zeros((0, n - u - 1, N_LIMBS), jnp.uint16)
    rand_u16 = _shard(jnp.asarray(_u16_cols([random_lag_vals], n)))

    row_lt_u = (jnp.arange(n) < u)[None, :]  # broadcast over [16, n] rows
    tix = rt._tbl_index

    def _perm_value_stack(T, adv_lag, lk_lag, dyn_lag, inst_lag):
        # column order MUST match keygen._perm_columns (halo2's
        # enable_equality order: fixed, advice, lookup, instance, dyn)
        parts = []
        if vk.num_fixed:
            parts.append(jnp.stack([T["lag"][tix[f"fix{i}"]] for i in range(vk.num_fixed)]))
        if na:
            parts.append(adv_lag)
        if nl:
            parts.append(lk_lag)
        if vk.num_instance:
            parts.append(inst_lag)
        if nd:
            parts.append(dyn_lag)
        return jnp.concatenate(parts, axis=0) if parts else jnp.zeros((0, N_LIMBS, n), jnp.uint32)

    def _compressed_stacks(get_tensor, theta_t, shape_tail):
        """Per-instance theta-compressed (input, table) tensors [ninst, ...]."""
        a_list, s_list = [], []
        for srcs_in, srcs_tbl in inst_srcs:

            def resolve(src):
                if src[0] == "prod":
                    return df._mont_mul(resolve(src[1]), resolve(src[2]))
                return get_tensor(src)

            def fold(srcs):
                acc = None
                for src in srcs:
                    tsr = resolve(src)
                    acc = tsr if acc is None else df._add(df._mont_mul(acc, theta_t), tsr)
                return acc

            a_list.append(fold(srcs_in))
            s_list.append(fold(srcs_tbl))
        if not a_list:
            z = jnp.zeros((0, N_LIMBS) + shape_tail, jnp.uint32)
            return z, z
        return jnp.stack(a_list), jnp.stack(s_list)

    def _grand_products(ratio):
        """ratio [C, 16, n] (rows >= u already 1) -> (z exclusive, incl)."""
        incl = jax.lax.associative_scan(df._mont_mul, ratio, axis=ratio.ndim - 1)
        one = df.one_mont((ratio.shape[0], 1))
        z = jnp.concatenate([one, incl[..., :-1]], axis=-1)
        return z, incl

    def s3(T, adv_lag, lk_lag, dyn_lag, inst_lag, permuted_lag, scal, zb_u16, rand_u16):
        beta_c = scal[:, 1:2]  # [16, 1] broadcast scalars
        gamma_c = scal[:, 2:3]
        zb = df._to_mont(zb_u16.astype(jnp.uint32).transpose(0, 2, 1))
        rand_lag = df._to_mont(rand_u16.astype(jnp.uint32).transpose(0, 2, 1))
        zcols = []
        if ncols:
            sigma_lag = jnp.stack([T["lag"][tix[f"sigma{ci}"]] for ci in range(ncols)])
            vals = _perm_value_stack(T, adv_lag, lk_lag, dyn_lag, inst_lag)  # [ncols,16,n]
            bd = jnp.swapaxes(scal[:, 3:], 0, 1)[:, :, None]  # [ncols, 16, 1]
            id_side = df._add(df._add(vals, df._mont_mul(T["omega"][None], bd)), gamma_c)
            sig_side = df._add(df._add(vals, df._mont_mul(sigma_lag, beta_c)), gamma_c)
            # chunk products (pad to nchunks * PERM_CHUNK with ones)
            width = perm_chunks(ncols)[0][1] - perm_chunks(ncols)[0][0]
            total = nchunks * width
            onepad = df.one_mont((total - ncols, n))
            id_p = jnp.concatenate([id_side, onepad], 0).reshape(nchunks, width, N_LIMBS, n)
            sig_p = jnp.concatenate([sig_side, onepad], 0).reshape(nchunks, width, N_LIMBS, n)
            numer = _tree_prod(df, id_p.swapaxes(0, 1))
            denom = _tree_prod(df, sig_p.swapaxes(0, 1))
            inv = df._batch_inv(denom)
            ratio = df._mont_mul(numer, inv)
            ratio = jnp.where(row_lt_u[None], ratio, df.one_mont((nchunks, n)))
            z, incl = _grand_products(ratio)
            # chain chunks: scale_j = prod_{j' < j} z_{j'}[u]
            ends = incl[..., u - 1 : u] if u > 0 else df.one_mont((nchunks, 1))
            scale_incl = jax.lax.associative_scan(df._mont_mul, ends, axis=0)
            scale = jnp.concatenate([df.one_mont((1, 1)), scale_incl[:-1]], axis=0)
            z = jnp.where(row_lt_u[None] | (jnp.arange(n) == u)[None, None, :],
                          df._mont_mul(z, scale), z)
            z = z.at[..., u + 1 :].set(zb[:nchunks])
            zcols.append(z)
        if ninst:
            runtime_pre = jnp.concatenate([adv_lag, lk_lag, dyn_lag, inst_lag], axis=0)

            def get_lag(src):
                kind, idx = src
                assert kind in ("rt", "tbl")
                return runtime_pre[idx] if kind == "rt" else T["lag"][idx]

            a_in, t_in = _compressed_stacks(get_lag, scal[:, 0:1], (n,))
            a_p = permuted_lag[0::2]
            s_p = permuted_lag[1::2]
            numer = df._mont_mul(df._add(a_in, beta_c), df._add(t_in, gamma_c))
            denom = df._mont_mul(df._add(a_p, beta_c), df._add(s_p, gamma_c))
            inv = df._batch_inv(denom)
            ratio = df._mont_mul(numer, inv)
            ratio = jnp.where(row_lt_u[None], ratio, df.one_mont((ninst, n)))
            zl, _ = _grand_products(ratio)
            zl = zl.at[..., u + 1 :].set(zb[nchunks:])
            zcols.append(zl)
        return jnp.concatenate(zcols + [rand_lag], axis=0) if zcols else rand_lag

    allz_lag = rt.jit("s3", s3)(
        T, adv_lag, lk_lag, dyn_lag, inst_lag, permuted_lag, scal3, zb_u16, rand_u16
    )
    if _os.environ.get("HALO2_PROVER_SELFCHECK") == "1":
        _selfcheck_h(
            vk, pk, dom, u, advice_vals, lookup_vals, dyn_vals, instance_vals,
            permuted_host, allz_lag, insts, _host_col, theta, beta, gamma,
        )
    com3 = params.commit_columns(df, allz_lag, T["lagA"])
    # overlap: the quotient's NTT batch depends only on the columns (not on
    # y), so dispatch it NOW — it runs on device while the z-commit MSM
    # finishes and the host blocks on the commitment fetch below
    runtime_lag = jnp.concatenate(
        [adv_lag, lk_lag, dyn_lag, inst_lag, permuted_lag, allz_lag], axis=0
    )
    runtime_coeffs = dom.ntt.inverse_cols(runtime_lag)
    runtime_ext = dom.coset_ntt.forward_cols(_pad_coeff(runtime_coeffs, dom.n_ext))
    for pt in _host_points(dc, com3):
        tr.write_point(pt)
    permz_lag = allz_lag[:nchunks]
    lkz_lag = allz_lag[nchunks : nchunks + ninst]
    rand_lag = allz_lag[nchunks + ninst :]
    _t = _stage("grand products", _t)

    y = tr.squeeze_challenge()

    # === phase 4: quotient on the extended coset ===========================
    K_gates = na
    K_chal = len(vk.challenge_pins)
    K_perm = (2 + (nchunks - 1) + nchunks) if nchunks else 0
    K_lk = 5 * ninst
    K = K_gates + K_chal + K_perm + K_lk
    chal_dev = dom.pack([challenges[c] for c, _, _ in vk.challenge_pins] or [0])

    # The quotient work is split into the batched NTT conversions (chunked
    # host dispatches sharing executables with every other caller) and one
    # expressions jit (s4b): one fused graph was so large that compile (and
    # on XLA:CPU even compile-cache serialization) fell over.
    def s4b(T, ext, scal, ych, chal_dev):
        ne = dom.n_ext
        o = 0
        adv_e, o = ext[o : o + na], o + na
        lk_e, o = ext[o : o + nl], o + nl
        dyn_e, o = ext[o : o + nd], o + nd
        inst_e, o = ext[o : o + vk.num_instance], o + vk.num_instance
        perm_e, o = ext[o : o + 2 * ninst], o + 2 * ninst
        permz_e, o = ext[o : o + nchunks], o + nchunks
        lkz_e, o = ext[o : o + ninst], o + ninst

        beta_e = scal[:, 1:2]
        gamma_e = scal[:, 2:3]
        one_e = df.one_mont((ne,))
        exprs = []

        def rot(t, r):
            return jnp.roll(t, -4 * r, axis=-1)

        # 1. gates
        if na:
            sel_e = jnp.stack([T["ext"][tix[f"sel{i}"]] for i in range(na)])
            g = df._sub(
                df._add(adv_e, df._mont_mul(rot(adv_e, 1), rot(adv_e, 2))),
                rot(adv_e, 3),
            )
            gate_e = df._mont_mul(sel_e, g)
            exprs.extend(gate_e[i] for i in range(na))

        # 1b. challenge pins: L_row_i * (advice_col - challenge) — the pin
        # selector is the derived one-hot Lagrange column, not a vk column
        for i, (_c, flat_col, _row) in enumerate(vk.challenge_pins):
            q_e = T["ext"][tix[f"pinrow{i}"]]
            diff = df._sub(adv_e[flat_col], jnp.broadcast_to(chal_dev[:, i : i + 1], (N_LIMBS, ne)))
            exprs.append(df._mont_mul(q_e, diff))

        # 2. permutation
        if nchunks:
            exprs.append(df._mont_mul(T["l0_e"], df._sub(one_e, permz_e[0])))
            zl = permz_e[-1]
            exprs.append(df._mont_mul(T["llast_e"], df._sub(df._mont_mul(zl, zl), zl)))
            for j in range(1, nchunks):
                zprev_rot = rot(permz_e[j - 1], u)
                exprs.append(df._mont_mul(T["l0_e"], df._sub(permz_e[j], zprev_rot)))

            # same order as _perm_value_stack / keygen._perm_columns
            parts = []
            if vk.num_fixed:
                parts.append(jnp.stack([T["ext"][tix[f"fix{i}"]] for i in range(vk.num_fixed)]))
            if na:
                parts.append(adv_e)
            if nl:
                parts.append(lk_e)
            if vk.num_instance:
                parts.append(inst_e)
            if nd:
                parts.append(dyn_e)
            vals_e = jnp.concatenate(parts, axis=0)  # [ncols, 16, ne]
            sigma_e = jnp.stack([T["ext"][tix[f"sigma{ci}"]] for ci in range(ncols)])
            bd = jnp.swapaxes(scal[:, 3:], 0, 1)[:, :, None]  # [ncols, 16, 1]
            left_f = df._add(df._add(vals_e, df._mont_mul(sigma_e, beta_e)), gamma_e)
            right_f = df._add(
                df._add(vals_e, df._mont_mul(T["x_poly_e"][None], bd)), gamma_e
            )
            width = perm_chunks(ncols)[0][1] - perm_chunks(ncols)[0][0]
            total = nchunks * width
            onep = df.one_mont((total - ncols, ne))
            lf = jnp.concatenate([left_f, onep], 0).reshape(nchunks, width, N_LIMBS, ne)
            rf = jnp.concatenate([right_f, onep], 0).reshape(nchunks, width, N_LIMBS, ne)
            left = df._mont_mul(rot(permz_e, 1), _tree_prod(df, lf.swapaxes(0, 1)))
            right = df._mont_mul(permz_e, _tree_prod(df, rf.swapaxes(0, 1)))
            chunk_e = df._mont_mul(T["lact_e"][None], df._sub(left, right))
            exprs.extend(chunk_e[j] for j in range(nchunks))

        # 3. lookups (theta-compressed input/table expressions per instance)
        if ninst:
            runtime_pre_e = jnp.concatenate([adv_e, lk_e, dyn_e, inst_e], axis=0)

            def get_ext(src):
                kind, idx = src
                return runtime_pre_e[idx] if kind == "rt" else T["ext"][idx]

            a_in_e, t_in_e = _compressed_stacks(get_ext, scal[:, 0:1], (ne,))
            a_p_e = perm_e[0::2]
            s_p_e = perm_e[1::2]
            l0b = T["l0_e"][None]
            llb = T["llast_e"][None]
            lab = T["lact_e"][None]
            e1 = df._mont_mul(l0b, df._sub(df.one_mont((ninst, ne)), lkz_e))
            e2 = df._mont_mul(llb, df._sub(df._mont_mul(lkz_e, lkz_e), lkz_e))
            left = df._mont_mul(
                df._mont_mul(rot(lkz_e, 1), df._add(a_p_e, beta_e)),
                df._add(s_p_e, gamma_e),
            )
            right = df._mont_mul(
                df._mont_mul(lkz_e, df._add(a_in_e, beta_e)),
                df._add(t_in_e, gamma_e),
            )
            e3 = df._mont_mul(lab, df._sub(left, right))
            diff = df._sub(a_p_e, s_p_e)
            e4 = df._mont_mul(l0b, diff)
            e5 = df._mont_mul(
                df._mont_mul(lab, diff), df._sub(a_p_e, rot(a_p_e, -1))
            )
            for j in range(ninst):
                exprs.extend([e1[j], e2[j], e3[j], e4[j], e5[j]])

        assert len(exprs) == K
        stack = jnp.stack(exprs)  # [K, 16, ne]
        ypows = dom.pows_of(ych, K)[:, ::-1]  # y^{K-1} ... y^0, [16, K]
        ycol = jnp.swapaxes(ypows, 0, 1)[:, :, None]  # [K, 16, 1]
        acc = _tree_sum(df, df._mont_mul(stack, ycol))
        return df._mont_mul(acc, T["zh_inv"])

    ych = dom.pack([y])
    # runtime_lag / runtime_coeffs / runtime_ext were dispatched before the
    # z-commitment fetch (overlap); only s4b below depends on y
    if _os.environ.get("HALO2_PROVER_SELFCHECK") == "2":
        # pipeline fault localization: every runtime/table column must
        # round-trip ext -> coeffs (degree < n) -> lag identically
        import sys as _sys

        for name, lag_t, ext_t in (
            ("runtime", runtime_lag, runtime_ext),
            ("tables", rt.tbl_lag, rt.tbl_ext),
        ):
            back_coeff = dom.coset_ntt.inverse_cols(ext_t)
            top = np.asarray(jax.device_get(back_coeff[..., n:]))
            lag_back = dom.ntt.forward_cols(back_coeff[..., :n])
            a = np.asarray(jax.device_get(lag_back))
            b = np.asarray(jax.device_get(lag_t))
            for ci in range(a.shape[0]):
                msgs = []
                if top[ci].any():
                    msgs.append("degree >= n")
                if (a[ci] != b[ci]).any():
                    bad = int(np.argwhere((a[ci] != b[ci]).any(0))[0][0])
                    msgs.append(f"lag roundtrip mismatch at row {bad}")
                if msgs:
                    print(
                        f"[prover selfcheck2] {name} col {ci}: {'; '.join(msgs)}",
                        file=_sys.stderr,
                        flush=True,
                    )
    h_ext = rt.jit("s4b", s4b)(T, runtime_ext, scal3, ych, chal_dev)
    h_coeffs = dom.coset_ntt.inverse_cols(h_ext[None])[0]
    # quotient pieces: j = cs_degree - 1 (halo2 quotient_poly_degree). The
    # q_lookup case has a degree-2 lookup input (q * a), so its lookup
    # constraint is degree 5 and h has degree up to 4n - 5 -> FOUR pieces
    # (still exactly representable on the 4n coset).
    npieces = quotient_pieces(vk)
    # deg h <= cs_degree*(n-1) - n = npieces*n - cs_degree (cs_degree =
    # npieces + 1), so the top (cs_degree - 1) coefficients of the pieces
    # must vanish too — checking from npieces*n - npieces keeps this guard
    # live even when npieces equals the coset extension factor (where the
    # plain [npieces*n:] slice is empty and the assert was vacuous).
    top_zero = jnp.all(h_coeffs[:, npieces * n - npieces :] == 0)
    h_pieces = h_coeffs[:, : npieces * n].reshape(N_LIMBS, npieces, n).transpose(1, 0, 2)
    com4 = params.commit_columns(df, h_pieces, T["monoA"])
    # degree guard BEFORE the commitments enter the transcript: a quotient
    # overflow must abort the proof, not leave a half-written transcript
    # (the device sync it forces overlaps the commit MSM already in flight)
    assert bool(top_zero), "quotient degree overflow"
    for pt in _host_points(dc, com4):
        tr.write_point(pt)
    _t = _stage("quotient", _t)

    x = tr.squeeze_challenge()
    pts = point_values(x, k)
    plan = query_plan(vk)

    # === phase 5: evals ====================================================
    point_list = sorted({pl for _, pls in plan for pl in pls})
    by_point = {pl: [lb for lb, pls in plan if pl in pls] for pl in point_list}

    # h(x) combine scalars computed on host (tiny)
    xc = pow(x, n, P)
    h_scal = dom.pack([pow(xc, i, P) for i in range(npieces)])  # [npieces, 16]

    def _h_comb_fn(h_pieces, h_scal):
        hcol = jnp.swapaxes(h_scal, 0, 1)[:, :, None]  # [npieces, 16, 1]
        return _tree_sum(df, df._mont_mul(h_pieces, hcol))

    h_comb = rt.jit("hcomb", _h_comb_fn)(h_pieces, h_scal)

    def s5_fn(T, runtime_coeffs, h_comb, pt_scalars):
        evals_out = []
        for pi, pl in enumerate(point_list):
            labels = by_point[pl]
            stack = []
            for lb in labels:
                src, idx = _src(lb)
                if src == "rt":
                    stack.append(runtime_coeffs[idx])
                elif src == "h":
                    stack.append(h_comb)
                else:
                    stack.append(T["coeff"][idx])
            stack = jnp.stack(stack)  # [L, 16, n]
            xp = dom.pows_of(pt_scalars[:, pi : pi + 1], n)  # [16, n]
            vals = _tree_sum_lanes(df, df._mont_mul(stack, xp[None]))  # [L, 16, 1]
            evals_out.append(df._from_mont(vals))
        return evals_out

    pt_scalars = dom.pack([pts[pl] for pl in point_list])
    eval_tensors = rt.jit("s5", s5_fn)(T, runtime_coeffs, h_comb, pt_scalars)
    from ..ops.limbs import limbs_to_ints

    evals: dict[str, dict[str, int]] = {lb: {} for lb, _ in plan}
    for pi, pl in enumerate(point_list):
        vals = limbs_to_ints(np.asarray(jax.device_get(eval_tensors[pi]))[:, :, 0])
        for lb, v in zip(by_point[pl], vals):
            evals[lb][pl] = v
    for label, pts_labels in plan:
        for pl in pts_labels:
            tr.write_scalar(evals[label][pl])
    _t = _stage("evals", _t)

    # === phase 6: SHPLONK h_open ===========================================
    v = tr.squeeze_challenge()
    w_ch = tr.squeeze_challenge()
    groups = group_queries(plan)

    # host: per-group v-RLC'd evals and low-degree interpolants r_j
    g_evals = []
    r_coeffs_per_group = []
    for pts_labels, labels in groups:
        ge = {pl: 0 for pl in pts_labels}
        vpow = 1
        for label in labels:
            for pl in pts_labels:
                ge[pl] = (ge[pl] + vpow * evals[label][pl]) % P
            vpow = vpow * v % P
        g_evals.append(ge)
        pvals = [pts[pl] for pl in pts_labels]
        r_coeffs_per_group.append(lagrange_interpolate(pvals, [ge[pl] for pl in pts_labels]))

    # device scalars: per group v-powers, w-powers, r coeffs, point values
    max_labels = max(len(labels) for _, labels in groups)
    max_pts = max(len(pls) for pls, _ in groups)
    vpow_mat = []
    r_mat = []
    s_mat = []
    wpows = []
    wp = 1
    for gi, (pts_labels, labels) in enumerate(groups):
        vp = [pow(v, i, P) for i in range(len(labels))] + [0] * (max_labels - len(labels))
        vpow_mat.extend(vp)
        r = r_coeffs_per_group[gi]
        r_mat.extend(list(r) + [0] * (max_pts - len(r)))
        s_mat.extend([pts[pl] for pl in pts_labels] + [1] * (max_pts - len(pts_labels)))
        wpows.append(wp)
        wp = wp * w_ch % P
    ngroups = len(groups)
    vpow_dev = dom.pack(vpow_mat)  # [ngroups * max_labels, 16]
    r_dev = dom.pack(r_mat)
    s_dev = dom.pack(s_mat)
    w_dev = dom.pack(wpows)
    npts_per_group = [len(pls) for pls, _ in groups]

    # lagrange forms needed per group (from runtime lag tensors + pk tables)
    group_label_srcs = [
        [_src(lb) for lb in labels] for _, labels in groups
    ]

    h_lag = dom.ntt.forward_cols(h_comb[None])[0]

    def s6(T, runtime_lag, h_lag, vpow_dev, r_dev, s_dev, w_dev):
        W = T["omega"]  # [16, n]
        g_forms = []
        for gi, srcs in enumerate(group_label_srcs):
            stack = []
            for src, idx in srcs:
                if src == "rt":
                    stack.append(runtime_lag[idx])
                elif src == "h":
                    stack.append(h_lag)
                else:
                    stack.append(T["lag"][idx])
            stack = jnp.stack(stack)  # [L, 16, n]
            vp = vpow_dev[:, gi * max_labels : gi * max_labels + len(srcs)]
            vcol = jnp.swapaxes(vp, 0, 1)[:, :, None]  # [L, 16, 1]
            g = _tree_sum(df, df._mont_mul(stack, vcol))
            g_forms.append(g)
        gstack = jnp.stack(g_forms)  # [ngroups, 16, n]

        # r_j on H (Horner, deg < max_pts) and Z_{S_j} on H
        r_on_h = []
        zs_on_h = []
        for gi in range(ngroups):
            r = r_dev[:, gi * max_pts : (gi + 1) * max_pts]  # [16, max_pts]
            acc = jnp.broadcast_to(r[:, -1:], (N_LIMBS, n))
            for d in range(max_pts - 2, -1, -1):
                acc = df._add(df._mont_mul(acc, W), r[:, d : d + 1])
            r_on_h.append(acc)
            s = s_dev[:, gi * max_pts : (gi + 1) * max_pts]
            zs = df._sub(W, jnp.broadcast_to(s[:, 0:1], (N_LIMBS, n)))
            for d in range(1, npts_per_group[gi]):
                zs = df._mont_mul(zs, df._sub(W, jnp.broadcast_to(s[:, d : d + 1], (N_LIMBS, n))))
            zs_on_h.append(zs)
        r_stack = jnp.stack(r_on_h)
        zs_stack = jnp.stack(zs_on_h)
        inv_zs = df._batch_inv(zs_stack)
        num = df._sub(gstack, r_stack)
        wcol = jnp.swapaxes(w_dev, 0, 1)[:, :, None]  # [ngroups, 16, 1]
        terms = df._mont_mul(df._mont_mul(num, inv_zs), wcol)
        h_open = _tree_sum(df, terms)
        return gstack, h_open

    gstack, h_open_lag = rt.jit("s6", s6)(
        T, runtime_lag, h_lag, vpow_dev, r_dev, s_dev, w_dev
    )
    h_open_coeffs = dom.ntt.inverse_cols(h_open_lag[None])[0]
    com6 = params.commit_columns(df, h_open_coeffs[None], T["monoA"])
    tr.write_point(_host_points(dc, com6)[0])

    u_ch = tr.squeeze_challenge()

    # === phase 7: SHPLONK q ===============================================
    all_points = sorted({pts[pl] for plan_pts, _ in groups for pl in plan_pts})
    zt_u = poly_eval(vanishing_poly(all_points), u_ch)
    scale_list = []
    ru_list = []
    wp = 1
    for gi, (pts_labels, _) in enumerate(groups):
        pvals = [pts[pl] for pl in pts_labels]
        others = [pt for pt in all_points if pt not in pvals]
        z_other_u = poly_eval(vanishing_poly(others), u_ch)
        scale_list.append(wp * z_other_u % P)
        ru_list.append(poly_eval(r_coeffs_per_group[gi], u_ch))
        wp = wp * w_ch % P
    scale_dev = dom.pack(scale_list)
    ru_dev = dom.pack(ru_list)
    ztu_dev = dom.pack([zt_u])
    uch_dev = dom.pack([u_ch])

    def s7(T, gstack, h_open_lag, scale_dev, ru_dev, ztu_dev, uch_dev):
        W = T["omega"]
        rucol = jnp.swapaxes(ru_dev, 0, 1)[:, :, None]  # [ngroups, 16, 1]
        sccol = jnp.swapaxes(scale_dev, 0, 1)[:, :, None]
        terms = df._mont_mul(df._sub(gstack, rucol), sccol)
        L_acc = _tree_sum(df, terms)
        L_acc = df._sub(L_acc, df._mont_mul(h_open_lag, ztu_dev))
        inv_xu = df._batch_inv(df._sub(W, jnp.broadcast_to(uch_dev, (N_LIMBS, n))))
        return df._mont_mul(L_acc, inv_xu)

    q_evals = rt.jit("s7", s7)(T, gstack, h_open_lag, scale_dev, ru_dev, ztu_dev, uch_dev)
    q_coeffs = dom.ntt.inverse_cols(q_evals[None])[0]
    com7 = params.commit_columns(df, q_coeffs[None], T["monoA"])
    tr.write_point(_host_points(dc, com7)[0])
    _t = _stage("shplonk", _t)
    return tr.finalize()
