"""Config-driven circuit tests (reference: halo2-ecc/configs/**/*.config read
by serde at bn254/tests/mod.rs:28-55, secp256k1/tests/ecdsa.rs:25-35).

The checked-in `.config` files carry the reference's PUBLISHED circuit shapes
(k=17 MSM with batch 100, k=19 pairing, k=18 ECDSA — diffable against
/root/reference/halo2-ecc/configs). Like the reference's CI (ci.yml:33-40,
which swaps in `.t.config` files to shrink the benches), the default test
tier runs the small `.t.config` variants and the full-size shapes are
`slow`-marked.
"""

import json
import os
import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.ecc.ec import EccChip
from halo2_lib_tpu.ecc.ecdsa import ecdsa_sign, ecdsa_verify_no_pubkey_check
from halo2_lib_tpu.ecc.fp import FpChip
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils.curves import BN254_G1, SECP256K1

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def load_config(rel):
    with open(os.path.join(CONFIG_DIR, rel)) as f:
        return json.load(f)


def run_ecdsa_config(cfg):
    k = cfg["degree"]
    rng = random.Random(90)
    n = SECP256K1.scalar
    priv = rng.randrange(1, n.p)
    pub = SECP256K1.mul(SECP256K1.g, priv)
    msghash = rng.randrange(1, n.p)
    r, s = ecdsa_sign(SECP256K1, priv, msghash, rng.randrange(1, n.p))

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(cfg["lookup_bits"])
    rc = builder.range_chip()
    fp_chip = FpChip(rc, cfg["limb_bits"], cfg["num_limbs"], SECP256K1.base)
    fq_chip = FpChip(rc, cfg["limb_bits"], cfg["num_limbs"], SECP256K1.scalar)
    chip = EccChip(fp_chip, SECP256K1)
    ctx = builder.main(0)
    out = ecdsa_verify_no_pubkey_check(
        chip,
        ctx,
        chip.load_private(ctx, pub),
        fq_chip.load_private(ctx, r),
        fq_chip.load_private(ctx, s),
        fq_chip.load_private(ctx, msghash),
    )
    assert out.val() == 1
    builder.calculate_params(minimum_rows=9)
    assert not MockProver.run(k, builder).verify()


def run_msm_config(cfg):
    k = cfg["degree"]
    rng = random.Random(91)
    batch = cfg["batch_size"]
    pts = [BN254_G1.random_point(rng) for _ in range(batch)]
    scalars = [BN254_G1.random_scalar(rng) for _ in range(batch)]

    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(k)
    builder.set_lookup_bits(cfg["lookup_bits"])
    rc = builder.range_chip()
    fp_chip = FpChip(rc, cfg["limb_bits"], cfg["num_limbs"], BN254_G1.base)
    chip = EccChip(fp_chip, BN254_G1)
    pool = builder.pool(0)
    ctx = pool.main()
    assigned = [chip.load_private(ctx, p) for p in pts]
    scs = [[ctx.load_witness(s)] for s in scalars]
    out = chip.variable_base_msm(
        pool, assigned, scs, max_bits=254, window_bits=cfg["window_bits"]
    )
    expected = BN254_G1.msm(pts, scalars)
    got = (fp_chip.get_assigned_value(out.x), fp_chip.get_assigned_value(out.y))
    assert got == expected
    builder.calculate_params(minimum_rows=9)
    assert not MockProver.run(k, builder).verify()


def test_ecdsa_config_circuit():
    run_ecdsa_config(load_config("secp256k1/ecdsa_circuit.t.config"))


def test_msm_config_circuit():
    run_msm_config(load_config("bn254/msm_circuit.t.config"))


@pytest.mark.slow
def test_ecdsa_config_circuit_full():
    """Reference-published shape: k=18, lookup 17 (README.md:232-242)."""
    run_ecdsa_config(load_config("secp256k1/ecdsa_circuit.config"))


@pytest.mark.slow
def test_msm_config_circuit_full():
    """Reference-published shape: k=17, batch 100 (README.md:299-305)."""
    run_msm_config(load_config("bn254/msm_circuit.config"))
