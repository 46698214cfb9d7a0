"""halo2_lib_tpu — a TPU-native halo2 (PlonKish/KZG) proving library in JAX/Pallas.

Brand-new implementation with the capabilities of axiom-crypto/halo2-lib
(reference layout documented in SURVEY.md). The library has three tiers:

1. ``core`` / ``gates`` / ``circuit``: the vertical-gate eDSL — virtual Contexts,
   GateChip/RangeChip op library, lookup + copy-constraint managers, circuit
   auto-configuration. Witness generation is exact big-int arithmetic on host;
   flattening produces dense tensors.
2. ``ops`` / ``backend``: the proving backend — limb-packed Montgomery field
   kernels (JAX/XLA, batch-vectorized for TPU VPU/MXU), radix-2 NTT, Pippenger
   MSM, KZG commitment + SHPLONK opening, Blake2b transcript, and a device
   MockProver (gate stencil + permutation + lookup checks as tensor programs).
3. ``bigint`` / ``fields`` / ``ecc`` / ``poseidon`` / ``safe_types``: the gadget
   stack — CRT-limb non-native arithmetic, emulated Fp/Fp2/Fp12, EC ops, MSM
   gadgets, ECDSA, BN254 pairing, Poseidon, SafeTypes.

Reference parity notes cite files as ``halo2-base/src/...:line`` meaning the
same-named path in the upstream Rust repo.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes — OPT-IN via
    HALO2_TPU_JAX_CACHE=<dir>.

    Off by default: XLA:CPU caches AOT executables keyed without the exact
    host CPU features, so a cache written on one machine can load
    miscompiled (e.g. AVX512-using) code on another — observed here as a
    one-off wrong proof alongside ``cpu_aot_loader.cc`` feature-mismatch
    errors. Remote (axon) backends ignore the local cache anyway.
    """
    cache_dir = _os.environ.get("HALO2_TPU_JAX_CACHE")
    if not cache_dir:
        return
    try:
        import jax

        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()


def __getattr__(name):
    """Lazy top-level re-exports of the main user-facing API."""
    _exports = {
        "BaseCircuitBuilder": ("halo2_lib_tpu.gates.circuit", "BaseCircuitBuilder"),
        "RangeCircuitBuilder": ("halo2_lib_tpu.gates.circuit", "RangeCircuitBuilder"),
        "BaseCircuitParams": ("halo2_lib_tpu.gates.circuit", "BaseCircuitParams"),
        "CircuitBuilderStage": ("halo2_lib_tpu.gates.circuit", "CircuitBuilderStage"),
        "MockProver": ("halo2_lib_tpu.backend.mock", "MockProver"),
        "GateChip": ("halo2_lib_tpu.gates.flex_gate", "GateChip"),
        "RangeChip": ("halo2_lib_tpu.gates.range", "RangeChip"),
        "Context": ("halo2_lib_tpu.core.context", "Context"),
        "gen_srs": ("halo2_lib_tpu.backend.kzg", "gen_srs"),
        "ParamsKZG": ("halo2_lib_tpu.backend.kzg", "ParamsKZG"),
        "keygen": ("halo2_lib_tpu.backend.keygen", "keygen"),
        "create_proof": ("halo2_lib_tpu.backend.prover", "create_proof"),
        "verify_proof": ("halo2_lib_tpu.backend.verifier", "verify_proof"),
        "base_test": ("halo2_lib_tpu.utils.testing", "base_test"),
    }
    if name in _exports:
        import importlib

        module, attr = _exports[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'halo2_lib_tpu' has no attribute {name!r}")
