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

# Persistent XLA/Mosaic compilation cache, ON by default (HALO2_NO_CACHE=1 to
# opt out). A cold prover pays ~10-25 s of Mosaic compile per EC kernel
# variant; the cache makes that a once-per-machine cost (verified effective on
# the remote axon TPU backend: 11 s -> 5 s second-process EC-add). The cache
# dir is keyed by a CPU-feature fingerprint because XLA:CPU AOT entries from a
# different host can load miscompiled code (cpu_aot_loader feature mismatch).
from .utils.cache import enable_persistent_cache as _enable_persistent_cache

_enable_persistent_cache()


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
