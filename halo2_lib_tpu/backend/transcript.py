"""Blake2b Fiat-Shamir transcript (prover writer + verifier reader).

Plays the role of halo2-axiom's `Blake2bWrite`/`Blake2bRead` with
`Challenge255` (SURVEY.md §2.9). Same construction — a running Blake2b state
absorbing domain-prefixed points/scalars, challenges squeezed from the state
and reduced into Fr — with a documented encoding (not byte-compatible with the
Rust transcript; proofs verify against this library's own verifier).

Encoding: G1 points as 64 bytes (x || y LE, identity = zeros); Fr scalars as
32 bytes LE. Prefixes: 0 = challenge, 1 = point, 2 = scalar.
"""

from __future__ import annotations

import hashlib

from ..utils.fields import FR_BN254, FQ_BN254

_PERSONAL = b"Halo2-Transcript"
_PREFIX_CHALLENGE = b"\x00"
_PREFIX_POINT = b"\x01"
_PREFIX_SCALAR = b"\x02"


def _point_bytes(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    return pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little")


class Blake2bWrite:
    """Prover transcript: absorbs messages, accumulates the proof bytes."""

    def __init__(self):
        self._state = hashlib.blake2b(person=_PERSONAL)
        self._proof = bytearray()

    # --- absorb without writing (for instance/vk commitments) ---
    def common_point(self, pt) -> None:
        self._state.update(_PREFIX_POINT + _point_bytes(pt))

    def common_scalar(self, s: int) -> None:
        self._state.update(_PREFIX_SCALAR + int(s % FR_BN254.p).to_bytes(32, "little"))

    def common_bytes(self, b: bytes) -> None:
        self._state.update(b)

    # --- absorb + write into proof ---
    def write_point(self, pt) -> None:
        self.common_point(pt)
        self._proof += _point_bytes(pt)

    def write_scalar(self, s: int) -> None:
        self.common_scalar(s)
        self._proof += int(s % FR_BN254.p).to_bytes(32, "little")

    def squeeze_challenge(self) -> int:
        """Challenge255-style squeeze: 64 uniform bytes -> Fr."""
        self._state.update(_PREFIX_CHALLENGE)
        digest = self._state.copy().digest()  # 64 bytes
        self._state.update(digest)
        return int.from_bytes(digest, "little") % FR_BN254.p

    def finalize(self) -> bytes:
        return bytes(self._proof)


class Blake2bRead:
    """Verifier transcript: reads the proof stream, re-deriving challenges."""

    def __init__(self, proof: bytes):
        self._state = hashlib.blake2b(person=_PERSONAL)
        self._proof = proof
        self._pos = 0

    def common_point(self, pt) -> None:
        self._state.update(_PREFIX_POINT + _point_bytes(pt))

    def common_scalar(self, s: int) -> None:
        self._state.update(_PREFIX_SCALAR + int(s % FR_BN254.p).to_bytes(32, "little"))

    def common_bytes(self, b: bytes) -> None:
        self._state.update(b)

    def read_point(self):
        """Read a G1 point; REJECTS non-canonical coordinates and off-curve
        points (halo2curves deserialization always curve-checks; accepting
        arbitrary bytes here would let a prover smuggle invalid group
        elements into the pairing check)."""
        raw = self._proof[self._pos : self._pos + 64]
        if len(raw) < 64:
            raise ValueError("transcript: unexpected end of proof")
        self._pos += 64
        x = int.from_bytes(raw[:32], "little")
        y = int.from_bytes(raw[32:], "little")
        if x == 0 and y == 0:
            pt = None
        else:
            q = FQ_BN254.p
            if x >= q or y >= q:
                raise ValueError("transcript: non-canonical point coordinate")
            if (y * y - (x * x * x + 3)) % q != 0:
                raise ValueError("transcript: point not on curve")
            pt = (x, y)
        self.common_point(pt)
        return pt

    def read_scalar(self) -> int:
        raw = self._proof[self._pos : self._pos + 32]
        if len(raw) < 32:
            raise ValueError("transcript: unexpected end of proof")
        self._pos += 32
        s = int.from_bytes(raw, "little") % FR_BN254.p
        self.common_scalar(s)
        return s

    def squeeze_challenge(self) -> int:
        self._state.update(_PREFIX_CHALLENGE)
        digest = self._state.copy().digest()
        self._state.update(digest)
        return int.from_bytes(digest, "little") % FR_BN254.p

    def at_end(self) -> bool:
        return self._pos == len(self._proof)
