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
_SRC_TOK = _REPO / "native" / "tokenizer.cpp"
_SRC_KQ = _REPO / "native" / "kquant_encode.cpp"
_LIB_DIR = Path(os.environ.get("LKTPU_NATIVE_DIR", _REPO / "native" / "build"))
_LIB = _LIB_DIR / "liblktpu_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_digest(srcs) -> str:
    import hashlib

    h = hashlib.sha256()
    for s in srcs:
        h.update(s.name.encode())
        h.update(s.read_bytes())
    return h.hexdigest()


def _build() -> bool:
    # rebuild gate: a content hash of the sources stored next to the .so
    # (mtimes are unreliable — git checkouts don't preserve them, so a
    # stale binary could otherwise win over newer sources)
    srcs = [s for s in (_SRC, _SRC_TOK, _SRC_KQ) if s.exists()]
    digest = _src_digest(srcs)
    stamp = _LIB.with_suffix(".sha256")
    if _LIB.exists() and stamp.exists() and stamp.read_text().strip() == digest:
        return True
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    for flags in (["-O3", "-march=native"], ["-O3"]):
        cmd = ["c++", "-shared", "-fPIC", *flags,
               *[str(s) for s in srcs], "-o", str(_LIB)]
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=180)
            if r.returncode == 0:
                stamp.write_text(digest)
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
        i32 = ctypes.c_int32
        if hasattr(lib, "spm_create"):
            lib.spm_create.argtypes = [p, p, i32, p, p, i32]
            lib.spm_create.restype = p
            lib.spm_destroy.argtypes = [p]
            lib.spm_encode.argtypes = [p, p, i32, p, i32]
            lib.spm_encode.restype = i32
        if hasattr(lib, "lk_encode_kquant"):
            lib.lk_encode_kquant.argtypes = [i32, p, p, i64, i32]
            lib.lk_encode_kquant.restype = i32
        if hasattr(lib, "lk_encode_iq4"):
            lib.lk_encode_iq4.argtypes = [i32, p, p, i64, i32]
            lib.lk_encode_iq4.restype = i32
        if hasattr(lib, "bpe_create"):
            lib.bpe_create.argtypes = [p, p, i32, p, p, i32]
            lib.bpe_create.restype = p
            lib.bpe_destroy.argtypes = [p]
            lib.bpe_word.argtypes = [p, p, i32, p, i32]
            lib.bpe_word.restype = i32
        _lib = lib
        return _lib


class NativeSpm:
    """ctypes wrapper over the C++ SPM core (native/tokenizer.cpp)."""

    def __init__(self, lib: ctypes.CDLL, tokens: list[str], scores, types,
                 unk_id: int):
        import numpy as np

        self._lib = lib
        enc = [t.encode("utf-8") for t in tokens]
        blob = b"".join(enc)
        offsets = np.zeros(len(enc) + 1, np.int32)
        np.cumsum([len(e) for e in enc], out=offsets[1:])
        self._blob = blob  # keep alive
        self._offsets = offsets
        self._scores = np.ascontiguousarray(scores, np.float32)
        self._types = (np.ascontiguousarray(types, np.int32)
                       if types is not None else np.ones(len(enc), np.int32))
        self._h = lib.spm_create(
            blob, self._offsets.ctypes.data, len(enc),
            self._scores.ctypes.data, self._types.ctypes.data, int(unk_id))
        self._np = np

    def encode_fragment(self, escaped: str) -> list[int]:
        data = escaped.encode("utf-8")
        cap = max(16, 2 * len(data))
        out = self._np.zeros(cap, self._np.int32)
        n = self._lib.spm_encode(self._h, data, len(data), out.ctypes.data, cap)
        if n < 0:  # buffer too small (pathological): retry sized
            out = self._np.zeros(-n, self._np.int32)
            n = self._lib.spm_encode(self._h, data, len(data), out.ctypes.data, -n)
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.spm_destroy(self._h)
        except Exception:
            pass


def get_native_spm(tokens, scores, types, unk_id) -> Optional[NativeSpm]:
    lib = get_native()
    if lib is None or scores is None or not hasattr(lib, "spm_create"):
        return None
    try:
        return NativeSpm(lib, tokens, scores, types, unk_id)
    except Exception:
        return None


class NativeBpe:
    """ctypes wrapper over the C++ BPE merge core (native/tokenizer.cpp)."""

    def __init__(self, lib: ctypes.CDLL, tokens: list[str], merges: list[str]):
        import numpy as np

        self._lib = lib
        self._np = np

        def pack(strs):
            enc = [s.encode("utf-8") for s in strs]
            blob = b"".join(enc)
            off = np.zeros(len(enc) + 1, np.int32)
            np.cumsum([len(e) for e in enc], out=off[1:])
            return blob, off

        self._vb, self._vo = pack(tokens)
        self._mb, self._mo = pack(merges)
        self._h = lib.bpe_create(self._vb, self._vo.ctypes.data, len(tokens),
                                 self._mb, self._mo.ctypes.data, len(merges))

    def word(self, u: str) -> list[int]:
        data = u.encode("utf-8")
        cap = max(16, 2 * len(data))
        out = self._np.zeros(cap, self._np.int32)
        n = self._lib.bpe_word(self._h, data, len(data), out.ctypes.data, cap)
        if n < 0:
            out = self._np.zeros(-n, self._np.int32)
            n = self._lib.bpe_word(self._h, data, len(data), out.ctypes.data, -n)
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._h)
        except Exception:
            pass


def get_native_bpe(tokens, merges) -> Optional["NativeBpe"]:
    lib = get_native()
    if lib is None or not merges or not hasattr(lib, "bpe_create"):
        return None
    try:
        return NativeBpe(lib, tokens, merges)
    except Exception:
        return None
