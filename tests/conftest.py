"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before any `import jax` so the XLA flags take effect. Real-TPU
benchmarking happens through bench.py, not the test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
