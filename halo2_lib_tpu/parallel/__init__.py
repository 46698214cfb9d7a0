"""Multi-chip sharding: mesh-parallel MSM and NTT (SURVEY.md §5 TPU mapping)."""

from .sharded import sharded_msm, sharded_ntt_step, make_mesh

__all__ = ["sharded_msm", "sharded_ntt_step", "make_mesh"]
