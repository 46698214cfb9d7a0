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


def _tiny_builder(k: int):
    from halo2_lib_tpu.core.cells import Constant, Existing
    from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
    from halo2_lib_tpu.gates.flex_gate import GateChip

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    gate = GateChip(FR_BN254)
    ctx = builder.main(0)
    x = ctx.load_witness(31415)
    z = gate.mul(ctx, Existing(x), Existing(x))
    for _ in range(8):
        z = gate.mul_add(ctx, Existing(z), Existing(x), Constant(5))
    builder.calculate_params(minimum_rows=9)
    p = builder.config_params
    p.num_advice_per_phase[0] = max(p.num_advice_per_phase[0], 2)
    return builder


def test_sharded_create_proof(mesh):
    """Full prover over the mesh: witness rows sharded, every stage jit runs
    SPMD, and the proof must equal the single-device proof bit-for-bit
    (break-point/layout determinism across shardings, SURVEY §7)."""
    from halo2_lib_tpu.backend.keygen import keygen
    from halo2_lib_tpu.backend.kzg import gen_srs
    from halo2_lib_tpu.backend.prover import create_proof
    from halo2_lib_tpu.backend.verifier import verify_proof

    k = 8
    builder = _tiny_builder(k)
    params = gen_srs(k)
    pk = keygen(params, builder)
    circuit = builder.synthesize()
    proof = create_proof(params, pk, circuit, mesh=mesh)
    assert verify_proof(params, pk.vk, proof)
    # determinism across shardings: the mesh proof == the single-device proof
    pk._runtime = None
    proof_single = create_proof(params, pk, circuit)
    assert proof == proof_single
