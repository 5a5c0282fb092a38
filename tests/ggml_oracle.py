"""Test-only oracle: compiles the reference ggml quantization code
(read-only at /root/reference) into a shared library and exposes its
quantize/dequantize routines via ctypes.

This is used ONLY to validate bit-exact wire-format parity of our own
from-scratch codecs; no reference code is copied into the framework.
Tests that use it are skipped if the toolchain or reference tree is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

REF = Path("/root/reference/ggml")
BUILD_DIR = Path("/tmp/lktpu_test_oracle")
LIB = BUILD_DIR / "libggml_oracle.so"

_lib = None


def _build() -> bool:
    if LIB.exists():
        return True
    if not REF.exists():
        return False
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", "-D_GNU_SOURCE", "-march=native",
        f"-I{REF}/include", f"-I{REF}/src",
        str(REF / "src/ggml-quants.c"), str(REF / "src/ggml.c"),
        str(REF / "src/ggml-aarch64.c"),
        "-o", str(LIB), "-lm", "-fopenmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return False
    return LIB.exists()


def get_oracle():
    """Return the loaded oracle library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    _lib = ctypes.CDLL(str(LIB))

    # ggml_init populates the fp16->fp32 lookup table used by the decoders
    class _InitParams(ctypes.Structure):
        _fields_ = [
            ("mem_size", ctypes.c_size_t),
            ("mem_buffer", ctypes.c_void_p),
            ("no_alloc", ctypes.c_bool),
        ]

    _lib.ggml_init.argtypes = [_InitParams]
    _lib.ggml_init.restype = ctypes.c_void_p
    ctx = _lib.ggml_init(_InitParams(16 * 1024, None, True))
    _lib.ggml_free.argtypes = [ctypes.c_void_p]
    _lib.ggml_free(ctx)
    return _lib


def oracle_quantize(x: np.ndarray, type_name: str) -> np.ndarray:
    """quantize_row_<t>_ref over a flat float32 array -> wire bytes."""
    from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE, TYPE_TRAITS

    lib = get_oracle()
    qt = NAME_TO_TYPE[type_name]
    tr = TYPE_TRAITS[qt]
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    n = x.size
    out = np.zeros(n // tr.block_size * tr.type_size, np.uint8)
    fn = getattr(lib, f"quantize_row_{type_name}_ref")
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    fn(x.ctypes.data, out.ctypes.data, ctypes.c_int64(n))
    return out


def oracle_dequantize(data: np.ndarray, type_name: str, n: int) -> np.ndarray:
    lib = get_oracle()
    data = np.ascontiguousarray(data, np.uint8).reshape(-1)
    out = np.zeros(n, np.float32)
    fn = getattr(lib, f"dequantize_row_{type_name}")
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    fn(data.ctypes.data, out.ctypes.data, ctypes.c_int64(n))
    return out


def oracle_quantize_nrow(x: np.ndarray, type_name: str, n_per_row: int) -> np.ndarray:
    """quantize_<t>(src, dst, nrow, n_per_row, NULL) — the imatrix-aware
    entry points (NULL imatrix; only valid for types where
    ggml_quantize_requires_imatrix is false)."""
    from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE, TYPE_TRAITS

    lib = get_oracle()
    qt = NAME_TO_TYPE[type_name]
    tr = TYPE_TRAITS[qt]
    lib.ggml_quantize_init.argtypes = [ctypes.c_int]
    lib.ggml_quantize_init(int(qt))  # builds the iq kmap/neighbour tables
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    nrow = x.size // n_per_row
    out = np.zeros(nrow * (n_per_row // tr.block_size) * tr.type_size, np.uint8)
    fn = getattr(lib, f"quantize_{type_name}")
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_void_p]
    fn.restype = ctypes.c_size_t
    fn(x.ctypes.data, out.ctypes.data, ctypes.c_int64(nrow),
       ctypes.c_int64(n_per_row), None)
    return out
