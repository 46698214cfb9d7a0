"""Poseidon hash gadget (halo2-base/src/poseidon equivalent)."""

from .hasher import PoseidonHasher, PoseidonSponge
from .spec import OptimizedPoseidonSpec

__all__ = ["PoseidonHasher", "PoseidonSponge", "OptimizedPoseidonSpec"]
