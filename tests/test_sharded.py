"""Mesh-sharded kernels on the virtual 8-device CPU mesh."""

import random

import pytest

import jax

from halo2_lib_tpu.ops.ec_device import DeviceCurve
from halo2_lib_tpu.ops.limbs import DeviceField
from halo2_lib_tpu.parallel.sharded import ShardedNTT, make_mesh, sharded_msm
from halo2_lib_tpu.utils.curves import BN254_G1
from halo2_lib_tpu.utils.fields import FR_BN254


@pytest.fixture(autouse=True, scope="module")
def _no_cache_writes():
    """Serializing the big multi-device shard_map executables into the
    persistent compile cache segfaults XLA:CPU (put_executable_and_time);
    raise the write threshold so sharded-test executables are never stored."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_msm(mesh):
    rng = random.Random(31)
    dc = DeviceCurve(DeviceField(BN254_G1.base), BN254_G1)
    pts = [BN254_G1.random_point(rng) for _ in range(24)]
    scs = [BN254_G1.random_scalar(rng) for _ in range(24)]
    got = sharded_msm(dc, pts, scs, mesh)
    assert got == BN254_G1.msm(pts, scs)


def test_sharded_ntt_matches_single_device(mesh):
    rng = random.Random(32)
    k = 8
    df = DeviceField(FR_BN254)
    from halo2_lib_tpu.ops.ntt import NTT

    coeffs = [rng.randrange(FR_BN254.p) for _ in range(1 << k)]
    packed = df.pack(coeffs)
    single = NTT(df, k).forward(packed)
    sharded = ShardedNTT(df, k, mesh).forward(packed)
    assert df.unpack(sharded) == df.unpack(single)
