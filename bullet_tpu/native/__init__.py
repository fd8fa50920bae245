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
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.six_rank.restype = ctypes.c_int
        lib.six_insert.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.six_insert.restype = ctypes.c_int
        lib.nvi_new.restype = ctypes.c_void_p
        lib.nvi_free.argtypes = [ctypes.c_void_p]
        lib.nvi_size.argtypes = [ctypes.c_void_p]
        lib.nvi_size.restype = ctypes.c_uint64
        lib.nvi_lookup.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.nvi_lookup.restype = ctypes.c_int32
        lib.nvi_insert.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int32]
        lib.nvi_intern_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.nvi_intern_batch.restype = ctypes.c_int64
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
        from ..utils.jsvalues import utf16_key

        key = utf16_key(s)
        out = ctypes.c_uint64()
        if self._lib.six_rank(self._handle, key, len(key), ctypes.byref(out)):
            raise KeyError(s)
        return int(out.value)

    def insert(self, s: str):
        from ..utils.jsvalues import utf16_key

        key = utf16_key(s)
        out = ctypes.c_uint64()
        rebalanced = self._lib.six_insert(
            self._handle, key, len(key), ctypes.byref(out)
        )
        return int(out.value), bool(rebalanced)


class NativeNumberInterner:
    """ctypes wrapper over the C++ bits→vid map (see strindex.cpp)."""

    def __init__(self, lib: ctypes.CDLL) -> None:
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.nvi_new())

    def __del__(self):  # pragma: no cover - interpreter shutdown ordering
        try:
            if getattr(self, "_handle", None):
                self._lib.nvi_free(self._handle)
                self._handle = None
        except Exception:  # noqa: BLE001
            pass

    def __len__(self) -> int:
        return int(self._lib.nvi_size(self._handle))

    def lookup(self, bits: int) -> Optional[int]:
        vid = self._lib.nvi_lookup(self._handle, ctypes.c_uint64(bits))
        return None if vid < 0 else int(vid)

    def insert(self, bits: int, vid: int) -> None:
        self._lib.nvi_insert(self._handle, ctypes.c_uint64(bits), vid)

    def intern_batch(self, bits_arr, next_vid: int):
        """bits_arr: uint64 numpy array -> (vids int32 array, new_idx int64
        array of first-occurrence indices of unseen values)."""
        import numpy as np

        bits_arr = np.ascontiguousarray(bits_arr, dtype=np.uint64)
        n = len(bits_arr)
        vids = np.empty(n, dtype=np.int32)
        new_idx = np.empty(n, dtype=np.int64)
        n_new = self._lib.nvi_intern_batch(
            self._handle,
            bits_arr.ctypes.data_as(ctypes.c_void_p),
            n,
            next_vid,
            vids.ctypes.data_as(ctypes.c_void_p),
            new_idx.ctypes.data_as(ctypes.c_void_p),
        )
        return vids, new_idx[:n_new]


class PyNumberInterner:
    """Pure-Python fallback with the same API."""

    def __init__(self) -> None:
        self._map: dict = {}

    def __len__(self) -> int:
        return len(self._map)

    def lookup(self, bits: int) -> Optional[int]:
        return self._map.get(bits)

    def insert(self, bits: int, vid: int) -> None:
        self._map[bits] = vid

    def intern_batch(self, bits_arr, next_vid: int):
        import numpy as np

        vids = np.empty(len(bits_arr), dtype=np.int32)
        new_idx = []
        m = self._map
        for i, b in enumerate(bits_arr.tolist()):
            vid = m.get(b)
            if vid is None:
                vid = next_vid + len(new_idx)
                m[b] = vid
                new_idx.append(i)
            vids[i] = vid
        return vids, np.asarray(new_idx, dtype=np.int64)


def make_string_order_index():
    """Native index when available, else the pure-Python implementation."""
    lib = load()
    if lib is not None:
        return NativeStringOrderIndex(lib)
    from ..utils.encode import StringOrderIndex

    return StringOrderIndex()


def make_number_interner():
    lib = load()
    if lib is not None:
        return NativeNumberInterner(lib)
    return PyNumberInterner()
