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
                cc, "-O3", "-shared", "-fPIC", "-pthread", "-o", so, src, f"-I{include}",
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


_EMITTERS: dict[int, "NativeEmitter | None"] = {}
_CLASSES_SET = False


def _register_classes(mod) -> None:
    """Hand the eDSL cell classes to the C module (once)."""
    global _CLASSES_SET
    if not _CLASSES_SET:
        from .core.cells import AssignedValue, ContextCell, QCell

        mod.set_classes(ContextCell, QCell, AssignedValue)
        _CLASSES_SET = True


_REGION_MOD: object = False


def get_region_mod():
    """The C module exposing emit_region, classes registered; None if absent."""
    global _REGION_MOD
    if _REGION_MOD is not False:
        return _REGION_MOD
    mod = get_native()
    if mod is None or not hasattr(mod, "emit_region"):
        _REGION_MOD = None
    else:
        _register_classes(mod)
        _REGION_MOD = mod
    return _REGION_MOD


def get_emitter(p: int):
    """Per-field native cell emitter, or None when the extension is absent."""
    em = _EMITTERS.get(p, False)
    if em is not False:
        return em
    mod = get_native()
    em = NativeEmitter(p, mod) if mod is not None and hasattr(mod, "emit_inner_product") else None
    _EMITTERS[p] = em
    return em


class NativeEmitter:
    """Bulk emitters for hot gadget cell layouts (native witness engine).

    Python keeps the layout spec and the fallback path; a C call does the
    per-cell work (field arithmetic, advice/selector appends, copy tuples).
    """

    __slots__ = ("_p", "_r2", "mod")

    def __init__(self, p: int, mod):
        self._p = p.to_bytes(32, "little")
        self._r2 = pow(2, 512, p).to_bytes(32, "little")
        self.mod = mod
        _register_classes(mod)

    def inner_product(self, ctx, a: list, b: list) -> int:
        """Emit the running-sum inner product; -1 = caller must fall back,
        else returns the b[0]==Constant(1) flag (0/1)."""
        return self.mod.emit_inner_product(self._p, self._r2, ctx, a, b)

    def range_check(self, ctx, a, limb_bases, num_limbs, lookup_bits, rows):
        """Whole multi-limb range_check (decompose + inner product + lookup
        rows); returns the last-limb AssignedValue, or None = fall back."""
        return self.mod.emit_range_check(
            self._p, self._r2, ctx, a, limb_bases, num_limbs, lookup_bits, rows
        )


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
