from .fields import (
    PrimeField,
    FR_BN254,
    FQ_BN254,
    FQ2_NONRESIDUE,
    FP_SECP256K1,
    FQ_SECP256K1,
)
from .misc import (
    bit_length,
    log2_ceil,
    decompose_int,
    decompose_fe,
    decompose_fe_to_u64_limbs,
    compose_int,
)

__all__ = [
    "PrimeField",
    "FR_BN254",
    "FQ_BN254",
    "FQ2_NONRESIDUE",
    "FP_SECP256K1",
    "FQ_SECP256K1",
    "bit_length",
    "log2_ceil",
    "decompose_int",
    "decompose_fe",
    "decompose_fe_to_u64_limbs",
    "compose_int",
]
