"""Loader for the native C extension (native/halo2_native.c).

Builds the CPython extension on first use with the system compiler (cached
next to the source), mirroring how the reference's runtime layers are native
code. All callers fall back to pure Python when no compiler is available.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_NATIVE = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
    return d


def get_native():
    """The halo2_native module, or None if unavailable."""
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    if os.environ.get("HALO2_NO_NATIVE") == "1":
        return None
    build = _build_dir()
    src = os.path.join(build, "halo2_native.c")
    if not os.path.exists(src):
        return None
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so = os.path.join(build, "halo2_native" + suffix)
    try:
        if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
            cc = os.environ.get("CC", "cc")
            include = sysconfig.get_path("include")
            cmd = [
                cc, "-O3", "-shared", "-fPIC", "-o", so, src, f"-I{include}",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
        if build not in sys.path:
            sys.path.insert(0, build)
        import halo2_native  # noqa: PLC0415

        _NATIVE = halo2_native
    except Exception:
        _NATIVE = None
    return _NATIVE


def _pack32(values, p) -> bytes:
    return b"".join(int(v % p).to_bytes(32, "little") for v in values)


def _unpack32(raw: bytes):
    return [int.from_bytes(raw[i : i + 32], "little") for i in range(0, len(raw), 32)]


class NativeField:
    """Bulk canonical-form field ops over a prime < 2^256."""

    def __init__(self, p: int):
        self.p = p
        self._p_bytes = p.to_bytes(32, "little")
        self._r2_bytes = (pow(2, 512, p)).to_bytes(32, "little")
        self.mod = get_native()

    @property
    def available(self) -> bool:
        return self.mod is not None

    def modmul(self, a: list[int], b: list[int]) -> list[int]:
        if self.mod is None:
            return [x * y % self.p for x, y in zip(a, b)]
        out = self.mod.modmul_vec(
            self._p_bytes, self._r2_bytes, _pack32(a, self.p), _pack32(b, self.p)
        )
        return _unpack32(out)

    def modadd(self, a, b) -> list[int]:
        if self.mod is None:
            return [(x + y) % self.p for x, y in zip(a, b)]
        out = self.mod.modadd_vec(
            self._p_bytes, self._r2_bytes, _pack32(a, self.p), _pack32(b, self.p)
        )
        return _unpack32(out)

    def modsub(self, a, b) -> list[int]:
        if self.mod is None:
            return [(x - y) % self.p for x, y in zip(a, b)]
        out = self.mod.modsub_vec(
            self._p_bytes, self._r2_bytes, _pack32(a, self.p), _pack32(b, self.p)
        )
        return _unpack32(out)

    def check_gate_column(self, values: list[int], selectors: list[bool]) -> int:
        """First row where q * (a + b*c - d) != 0, or -1. None = no native."""
        if self.mod is None:
            return None
        sel_bytes = bytes(1 if s else 0 for s in selectors)
        col_bytes = _pack32(values, self.p)
        return self.mod.check_gates(
            self._p_bytes, self._r2_bytes, col_bytes, sel_bytes, len(values)
        )
