"""Persistent XLA compilation cache setup.

Why this matters here more than in a typical JAX program: the prover's hot
path is built from large fused stage graphs plus Mosaic (pallas) kernels, and
on the TPU backends we target a single Mosaic EC-add kernel costs ~10-25 s to
compile. A cold `create_proof` triggers a few dozen of them; with the
persistent cache they are paid once per machine, ever. (The reference library
has the same shape of cost in `cargo build` — amortized by the cargo target
dir; this is our equivalent.)

CPU caveat: XLA:CPU AOT cache entries compiled on a machine with different
CPU features can load miscompiled code (cpu_aot_loader feature mismatch ->
wrong numerics). The cache dir is therefore keyed by a CPU-feature
fingerprint and defaults to a machine-local location.

Env knobs:
  HALO2_TPU_JAX_CACHE=<dir>  explicit cache dir
  HALO2_NO_CACHE=1           disable entirely
"""

from __future__ import annotations

import hashlib
import os

_DONE = False


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = [line for line in f if line.startswith("flags")][0]
    except Exception:
        flags = os.uname().machine
    # Key by the requested platform set too: under remote-compile backends
    # (axon) even XLA:CPU entries are compiled on the service's machine, whose
    # LLVM target features differ from this host's — sharing a dir with pure
    # CPU sessions loads foreign AOT code (cpu_aot_loader feature mismatch).
    flags += "|" + os.environ.get("JAX_PLATFORMS", "")
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def enable_persistent_cache() -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    global _DONE
    if _DONE or os.environ.get("HALO2_NO_CACHE") == "1":
        return
    _DONE = True
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # respect an explicitly configured cache (e.g. test conftest)

        path = os.environ.get("HALO2_TPU_JAX_CACHE")
        # Decide the platform from the jax CONFIG first: a harness that forces
        # CPU via jax.config.update("jax_platforms", "cpu") (conftest, the
        # multichip dryrun) must NOT inherit the TPU cache dir its ambient
        # JAX_PLATFORMS env would select — those entries were compiled by a
        # remote service whose LLVM target features differ from this host's,
        # and XLA:CPU will load them as (potentially miscompiled) AOT code.
        platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if not path and ("tpu" in platforms or "axon" in platforms):
            # TPU runs default to a repo-local cache: TPU executables are
            # keyed by (module, compiler version, topology) — host CPU flags
            # are irrelevant — so entries warmed in one session serve every
            # later run on the same TPU generation (including CI/bench runs
            # in fresh containers). Stale entries simply miss.
            # The subdir is TPU-ONLY by construction (CPU sessions land in
            # the fingerprinted local dir below): XLA:CPU AOT entries must
            # never ride the repo to another machine (see README there).
            repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            path = os.path.join(repo, "params", "xla_cache", "tpu-v1")
        if not path:
            base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
            path = os.path.join(base, "halo2_lib_tpu", f"xla_{_host_fingerprint()}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass
