"""ChaCha20 known-answer tests (external anchors, not in-repo oracles)."""

from halo2_lib_tpu.utils.chacha import ChaCha20Rng, chacha20_block, reference_srs_tau
from halo2_lib_tpu.utils.fields import FR_BN254


def test_rfc8439_block_vector():
    """RFC 8439 §2.3.2: the ChaCha20 block function test vector."""
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    out = chacha20_block(key, 1, nonce)
    expected = bytes.fromhex(
        "10f1e7e4d13b5915500fdd1fa32071c4c7d1f4c733c068030422aa9ac3d46c4e"
        "d2826446079faa0914c2d705d98b02a2b5129cd1de164eb9cbd083e8a2503c4e"
    )
    assert out == expected


def test_zero_key_keystream():
    """First keystream block for the all-zero key/nonce (widely published
    ChaCha20 vector; this is the stream ChaCha20Rng::from_seed([0; 32])
    emits, which seeds the reference SRS)."""
    ks = ChaCha20Rng(b"\x00" * 32).fill_bytes(64)
    expected = bytes.fromhex(
        "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586"
    )
    assert ks == expected


def test_reference_tau_reduction():
    """tau = first 64 zero-key keystream bytes reduced into Fr."""
    expected = (
        int.from_bytes(
            bytes.fromhex(
                "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
                "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586"
            ),
            "little",
        )
        % FR_BN254.p
    )
    assert reference_srs_tau() == expected
