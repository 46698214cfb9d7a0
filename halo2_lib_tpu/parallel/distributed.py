"""Multi-host mesh construction behind `jax.distributed`.

The reference has NO distributed backend (single-process rayon,
SURVEY.md §5); the TPU-native equivalent is a process-spanning
`jax.sharding.Mesh`: `jax.distributed.initialize` connects the hosts, the
mesh's leading (DCN) axis spans processes, and the trailing (ICI) axis spans
each host's local chips. All prover collectives (row-sharded stage jits,
psum MSM reductions, all_to_all NTT transposes — parallel/sharded.py) then
ride ICI within a host and DCN across hosts automatically via pjit/shard_map
partitioning.

Single-host environments (this repo's CI, the driver dry-run) take the
same code path with zero processes to join: `init_distributed()` is a no-op
unless the HALO2_DIST_* env triple is set, and `make_global_mesh` degrades
to the local-device mesh.

Env contract (one setting per process):
  HALO2_DIST_COORD   coordinator address host:port (process 0's address)
  HALO2_DIST_NPROCS  total process count
  HALO2_DIST_PROCID  this process's index (0-based)
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

_initialized = False


def init_distributed() -> bool:
    """Join the multi-host job iff the HALO2_DIST_* env triple is present.

    Returns True when running multi-process (after a successful
    `jax.distributed.initialize`), False for the single-process path.
    Idempotent: safe to call from every entry point.
    """
    global _initialized
    coord = os.environ.get("HALO2_DIST_COORD")
    nprocs = os.environ.get("HALO2_DIST_NPROCS")
    procid = os.environ.get("HALO2_DIST_PROCID")
    if not (coord and nprocs and procid):
        return False
    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nprocs),
            process_id=int(procid),
        )
        _initialized = True
    return True


def make_global_mesh(ici_axis: str = "dp", dcn_axis: str = "hosts") -> Mesh:
    """Process-spanning mesh: [hosts (DCN), local devices (ICI)].

    Multi-process: a 2D mesh whose rows are processes — shard_map/pjit
    partitioners then place inter-row collectives on DCN and intra-row ones
    on ICI. Single-process: a 1D mesh over the local devices (identical to
    `sharded.make_mesh`), so every caller is mesh-shape agnostic.
    """
    init_distributed()
    devs = jax.devices()
    nproc = jax.process_count()
    if nproc <= 1:
        return Mesh(np.array(devs), (ici_axis,))
    per_host = len(devs) // nproc
    grid = np.empty((nproc, per_host), dtype=object)
    for d in devs:
        grid[d.process_index][d.id % per_host] = d
    return Mesh(grid, (dcn_axis, ici_axis))


def flat_axes(mesh: Mesh) -> tuple[str, ...]:
    """The mesh's axis names, for PartitionSpecs that shard rows over every
    axis at once (single- and multi-host meshes alike)."""
    return tuple(mesh.axis_names)
