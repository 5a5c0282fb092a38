"""Native extension loader: builds native/repack.cpp on demand (cached)
and exposes its C ABI via ctypes.  All consumers fall back to the numpy
implementations when the toolchain is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_REPO = Path(__file__).resolve().parent.parent
_SRC = _REPO / "native" / "repack.cpp"
_LIB_DIR = Path(os.environ.get("LKTPU_NATIVE_DIR", _REPO / "native" / "build"))
_LIB = _LIB_DIR / "liblktpu_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    for flags in (["-O3", "-march=native"], ["-O3"]):
        cmd = ["c++", "-shared", "-fPIC", *flags, str(_SRC), "-o", str(_LIB)]
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=180)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            return False
    return False


def get_native() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LKTPU_NO_NATIVE"):
            return None
        if not _SRC.exists() or not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        i64 = ctypes.c_int64
        p = ctypes.c_void_p
        lib.repack_q8_0.argtypes = [p, i64, i64, i64, p, p]
        lib.repack_q4_0.argtypes = [p, i64, i64, i64, p, p]
        lib.repack_q4_k.argtypes = [p, i64, i64, i64, p, p, p, p, p]
        lib.repack_q6_k.argtypes = [p, i64, i64, i64, p, p, p]
        _lib = lib
        return _lib
