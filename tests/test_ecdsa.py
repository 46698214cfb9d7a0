"""ECDSA circuit tests (secp256k1), mirroring the reference's
secp256k1/tests/ecdsa.rs positive and negative cases."""

import random

import pytest

from halo2_lib_tpu.backend.mock import MockProver
from halo2_lib_tpu.ecc.ec import EccChip
from halo2_lib_tpu.ecc.ecdsa import ecdsa_sign, ecdsa_verify_host, ecdsa_verify_no_pubkey_check
from halo2_lib_tpu.ecc.fp import FpChip
from halo2_lib_tpu.gates.circuit import BaseCircuitBuilder, CircuitBuilderStage
from halo2_lib_tpu.utils.curves import SECP256K1

LIMB_BITS = 88
NUM_LIMBS = 3
# Fast tier: same circuit reshaped to k=12 (rows-vs-columns tradeoff at
# constant cells, README "Configurable Circuits"); the reference-published
# k=18 shape runs in test_configs.py::test_ecdsa_config_circuit_full (slow).
K = 12
LOOKUP_BITS = 11


def run_ecdsa(pubkey, r, s, msghash, expected_bit: int):
    builder = BaseCircuitBuilder.from_stage(CircuitBuilderStage.MOCK).use_k(K)
    builder.set_lookup_bits(LOOKUP_BITS)
    range_chip = builder.range_chip()
    fp_chip = FpChip(range_chip, LIMB_BITS, NUM_LIMBS, SECP256K1.base)
    fq_chip = FpChip(range_chip, LIMB_BITS, NUM_LIMBS, SECP256K1.scalar)
    chip = EccChip(fp_chip, SECP256K1)
    ctx = builder.main(0)
    pk = chip.load_private(ctx, pubkey)
    r_a = fq_chip.load_private(ctx, r)
    s_a = fq_chip.load_private(ctx, s)
    m_a = fq_chip.load_private(ctx, msghash)
    out = ecdsa_verify_no_pubkey_check(chip, ctx, pk, r_a, s_a, m_a, 4, 4)
    assert out.val() == expected_bit, f"in-circuit ECDSA bit {out.val()} != {expected_bit}"
    builder.calculate_params(minimum_rows=9)
    errors = MockProver.run(K, builder).verify()
    assert not errors, "\n".join(errors[:5])


def make_sig(seed: int):
    rng = random.Random(seed)
    n = SECP256K1.scalar
    priv = rng.randrange(1, n.p)
    pub = SECP256K1.mul(SECP256K1.g, priv)
    msghash = rng.randrange(1, n.p)
    k = rng.randrange(1, n.p)
    r, s = ecdsa_sign(SECP256K1, priv, msghash, k)
    assert ecdsa_verify_host(SECP256K1, pub, msghash, r, s)
    return pub, r, s, msghash


def test_ecdsa_valid_signature():
    pub, r, s, msghash = make_sig(42)
    run_ecdsa(pub, r, s, msghash, 1)


def test_ecdsa_wrong_msghash_rejected():
    pub, r, s, msghash = make_sig(43)
    run_ecdsa(pub, r, s, (msghash + 1) % SECP256K1.scalar.p, 0)


def test_ecdsa_negative_s_accepted():
    """ECDSA malleability: (r, n - s) also verifies (reference
    test_ecdsa_custom_valid_inputs_negative_s)."""
    pub, r, s, msghash = make_sig(44)
    run_ecdsa(pub, r, SECP256K1.scalar.p - s, msghash, 1)


def test_ecdsa_msg_hash_zero():
    """Degenerate but well-formed signature over msghash = 0 still verifies
    (reference test_ecdsa_msg_hash_zero)."""
    rng = random.Random(45)
    n = SECP256K1.scalar
    priv = rng.randrange(1, n.p)
    pub = SECP256K1.mul(SECP256K1.g, priv)
    k = rng.randrange(1, n.p)
    r, s = ecdsa_sign(SECP256K1, priv, 0, k)
    run_ecdsa(pub, r, s, 0, 1)


def test_ecdsa_swapped_pubkey_rejected():
    pub1, r, s, msghash = make_sig(46)
    pub2, *_ = make_sig(47)
    run_ecdsa(pub2, r, s, msghash, 0)


def test_ecdsa_external_openssl_oracle():
    """External anchor (round-1 verdict: break in-repo oracle circularity).

    The signature is produced by OpenSSL via the `cryptography` package —
    fully independent of this repo's curve arithmetic — then verified both by
    our host verifier and in-circuit. If our secp256k1 field/EC/ECDSA math
    drifted from the real curve, this fails."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        Prehashed,
        decode_dss_signature,
    )

    priv = ec.derive_private_key(0x123456789ABCDEF, ec.SECP256K1())
    msghash = 0xA5C3_0000_DEAD_BEEF_0000_0000_0000_0001
    digest = msghash.to_bytes(32, "big")
    sig = priv.sign(digest, ec.ECDSA(Prehashed(hashes.SHA256())))
    r, s = decode_dss_signature(sig)
    nums = priv.public_key().public_numbers()
    pub = (nums.x, nums.y)
    assert ecdsa_verify_host(SECP256K1, pub, msghash, r, s)
    run_ecdsa(pub, r, s, msghash, 1)
    run_ecdsa(pub, r, s, (msghash + 1) % SECP256K1.scalar.p, 0)
