"""Native (C++) host-runtime components, loaded via ctypes.

The shared library builds on demand with g++ (cached next to the sources);
every consumer has a pure-Python fallback, so absence of a toolchain only
costs performance, never correctness. Set BULLET_NO_NATIVE=1 to force the
fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "strindex.cpp")
_LIB = os.path.join(_HERE, "libbulletnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first use; None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("BULLET_NO_NATIVE"):
            _load_failed = True
            return None
        needs_build = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if needs_build and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        lib.six_new.restype = ctypes.c_void_p
        lib.six_free.argtypes = [ctypes.c_void_p]
        lib.six_size.argtypes = [ctypes.c_void_p]
        lib.six_size.restype = ctypes.c_uint64
        lib.six_rebalances.argtypes = [ctypes.c_void_p]
        lib.six_rebalances.restype = ctypes.c_uint64
        lib.six_rank.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.six_rank.restype = ctypes.c_int
        lib.six_insert.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.six_insert.restype = ctypes.c_int
        _lib = lib
        return _lib


class NativeStringOrderIndex:
    """ctypes wrapper with the StringOrderIndex API (insert/rank/rebalances)."""

    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.six_new())

    def __del__(self):  # pragma: no cover - interpreter shutdown ordering
        try:
            if getattr(self, "_handle", None):
                self._lib.six_free(self._handle)
                self._handle = None
        except Exception:  # noqa: BLE001
            pass

    @property
    def rebalances(self) -> int:
        return int(self._lib.six_rebalances(self._handle))

    def __len__(self) -> int:
        return int(self._lib.six_size(self._handle))

    def rank(self, s: str) -> int:
        out = ctypes.c_uint64()
        if self._lib.six_rank(self._handle, s.encode("utf-8"), ctypes.byref(out)):
            raise KeyError(s)
        return int(out.value)

    def insert(self, s: str):
        out = ctypes.c_uint64()
        rebalanced = self._lib.six_insert(
            self._handle, s.encode("utf-8"), ctypes.byref(out)
        )
        return int(out.value), bool(rebalanced)


def make_string_order_index():
    """Native index when available, else the pure-Python implementation."""
    lib = load()
    if lib is not None:
        return NativeStringOrderIndex(lib)
    from ..utils.encode import StringOrderIndex

    return StringOrderIndex()
