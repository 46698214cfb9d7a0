"""Test config: force JAX onto a virtual 8-device CPU mesh.

The environment preloads jax at interpreter startup (axon sitecustomize), so
setting JAX_PLATFORMS via os.environ here is too late. Backends initialize
lazily, so `jax.config.update` still works. Tests always run on CPU —
real-TPU benchmarking happens through bench.py, not the test suite.
"""

import os

_AMBIENT_PLATFORMS = os.environ.get("JAX_PLATFORMS", "")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Machine-local compile cache for test speed. Deliberately under /tmp (not
# $HOME): XLA:CPU AOT cache entries compiled on a different machine can load
# miscompiled code (cpu_aot_loader feature-mismatch -> wrong numerics), and
# /tmp never travels between machines. Production runs stay cache-free
# unless HALO2_TPU_JAX_CACHE is set explicitly.
def _host_fingerprint() -> str:
    """CPU-feature fingerprint: AOT cache entries loaded on a host with
    different CPU features can miscompute (cpu_aot_loader SIGILL warning).
    Includes the ambient platform request: a process that ever loaded a TPU
    plugin (libtpu sets +prefer-no-scatter/-gather target features) writes
    AOT entries incompatible with plain-CPU sessions on the SAME machine."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = [l for l in f if l.startswith("flags")][0]
    except Exception:
        flags = os.uname().machine
    flags += "|" + _AMBIENT_PLATFORMS + "|cpu-only-session"
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


_cache = f"/tmp/halo2_lib_tpu_test_xla_cache_{_host_fingerprint()}"
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
# Cache WRITES are opt-in: XLA:CPU's executable serialization
# (put_executable_and_time) segfaults sporadically under the 8-virtual-
# device setup — observed on shard_map executables and, rarely, on plain
# multi-second compiles mid-suite. A cold run crashing at 40% is far worse
# than a cold run being slow, so the default suite never writes; local
# iteration can accept the risk with HALO2_TEST_CACHE_WRITES=1 to get warm
# reruns. Reads stay enabled either way.
if os.environ.get("HALO2_TEST_CACHE_WRITES") == "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
