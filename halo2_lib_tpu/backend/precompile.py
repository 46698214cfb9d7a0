"""Parallel warm-up of shape-shared prover executables (HALO2_PRECOMPILE=1).

Cold-start cost on a remote-compile TPU backend is dominated by XLA
compiles encountered SERIALLY as the first proof walks its Fiat-Shamir
phases. Most hot executables are shape-keyed and shared across stages
(batched NTT chunks, the commit MSM, u16 upload conversion, batch
inversion), so they can be compiled CONCURRENTLY up front: each warm-up
thread dispatches a throwaway call, and compiles overlap to whatever
degree the compile service allows. The per-proof stage jits (s3..s7 in
backend/prover.py) still compile on the first proof — they close over the
circuit shape — but they are a minority of the serial wall.

Driver usage: bench.py calls `warm_prover(params, pk)` before the e2e
warm-up when HALO2_PRECOMPILE=1.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def warm_prover(params, pk, mesh=None, max_workers: int | None = None) -> int:
    """Concurrently compile the shared executables for (params, pk).

    Returns the number of warm-up tasks dispatched. Safe to call multiple
    times (compilation caches make repeats cheap)."""
    from ..ops.limbs import N_LIMBS
    from .prover import ProverRuntime, _lag_from_u16

    rt = getattr(pk, "_runtime", None)
    if rt is None or rt.params is not params or rt.mesh is not mesh:
        rt = ProverRuntime(params, pk, mesh)
        pk._runtime = rt
    dom, df = rt.dom, rt.df
    n = rt.n
    ne = dom.n_ext

    def _sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            np.asarray(jax.device_get(leaves[0].ravel()[:1]))

    z8n = jnp.zeros((8, N_LIMBS, n), jnp.uint32)
    z1e = jnp.zeros((1, N_LIMBS, ne), jnp.uint32)
    z8e = jnp.zeros((8, N_LIMBS, ne), jnp.uint32)
    zu16 = np.zeros((8, n, N_LIMBS), np.uint16)
    zc = jnp.zeros((8, N_LIMBS, n), jnp.uint32)

    tasks = [
        lambda: _sync(dom.ntt.forward_cols(z8n)),
        lambda: _sync(dom.ntt.inverse_cols(z8n)),
        lambda: _sync(dom.coset_ntt.forward_cols(z8e)),
        lambda: _sync(dom.coset_ntt.inverse_cols(z8e)),
        lambda: _sync(dom.coset_ntt.inverse_cols(z1e)),
        lambda: _sync(_lag_from_u16(df, zu16)),
        lambda: _sync(params.commit_columns(df, zc, rt.tables["lagA"])),
        lambda: _sync(params.commit_columns(df, zc, rt.tables["monoA"])),
        lambda: _sync(df._batch_inv(jnp.zeros((2, N_LIMBS, n), jnp.uint32))),
    ]
    workers = max_workers or min(len(tasks), (os.cpu_count() or 4) * 2)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(t) for t in tasks]
        for f in futs:
            f.result()
    return len(tasks)


def maybe_warm(params, pk, mesh=None) -> bool:
    """Env-gated entry: warms iff HALO2_PRECOMPILE=1."""
    if os.environ.get("HALO2_PRECOMPILE") != "1":
        return False
    warm_prover(params, pk, mesh)
    return True
