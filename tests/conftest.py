"""Test config: force JAX onto a virtual 8-device CPU mesh.

The environment preloads jax at interpreter startup (axon sitecustomize), so
setting JAX_PLATFORMS via os.environ here is too late. Backends initialize
lazily, so `jax.config.update` still works. Tests always run on CPU —
real-TPU benchmarking happens through bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
