"""GGUF v1-v3 reader.

Parses the GGUF container (magic/version/KV metadata/tensor index) and
memory-maps the data section for zero-copy tensor access.  Capability parity
target: ``gguf_init_from_file`` (reference ggml/src/ggml.c:21387) and the
Kotlin port's GGUFParser.kt:19-101; the implementation is independent.

Wire layout (little-endian):
  u32 magic "GGUF" | u32 version | u64 n_tensors | u64 n_kv
  n_kv * { string key; u32 vtype; value }
  n_tensors * { string name; u32 n_dims; u64 dims[n_dims]; u32 ggml_type; u64 offset }
  padding to `general.alignment` (default 32)
  tensor data (each tensor offset is relative to the data section start and
  aligned to the alignment)

v1 uses u32 for all the u64 counts/lengths above.
"""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, BinaryIO

import numpy as np

from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS, row_byte_size

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian
DEFAULT_ALIGNMENT = 32


class GGUFValueType:
    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


_SCALAR_FMT = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.BOOL: "<?",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}

_SCALAR_NP = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.uint16,
    GGUFValueType.INT16: np.int16,
    GGUFValueType.UINT32: np.uint32,
    GGUFValueType.INT32: np.int32,
    GGUFValueType.FLOAT32: np.float32,
    GGUFValueType.BOOL: np.bool_,
    GGUFValueType.UINT64: np.uint64,
    GGUFValueType.INT64: np.int64,
    GGUFValueType.FLOAT64: np.float64,
}


@dataclass
class GGUFTensorInfo:
    name: str
    shape: tuple[int, ...]  # logical shape, row-major (ne[0] innermost, like ggml)
    ggml_type: GGMLQuantType
    offset: int  # relative to data section
    n_bytes: int = 0

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n


class _Cursor:
    """Sequential little-endian reader over a bytes-like object."""

    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated GGUF file")
        self.pos += n
        return bytes(b)

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.read(8))[0]

    def scalar(self, vtype: int):
        fmt = _SCALAR_FMT[vtype]
        return struct.unpack(fmt, self.read(struct.calcsize(fmt)))[0]


class GGUFFile:
    """A parsed GGUF file with memory-mapped tensor data.

    ``metadata`` maps key -> python value (arrays become lists, or numpy
    arrays for large numeric arrays).  ``tensors`` maps name ->
    GGUFTensorInfo.  ``tensor_data(name)`` returns a zero-copy uint8 view.
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._file: BinaryIO = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, GGUFTensorInfo] = {}
        self.alignment = DEFAULT_ALIGNMENT
        self.version = 0
        self.data_offset = 0
        self._parse()

    # -- container parsing ---------------------------------------------------

    def _read_len(self, c: _Cursor) -> int:
        return c.u32() if self.version == 1 else c.u64()

    def _read_string(self, c: _Cursor) -> str:
        n = self._read_len(c)
        return c.read(n).decode("utf-8", errors="replace")

    def _read_value(self, c: _Cursor, vtype: int):
        if vtype == GGUFValueType.STRING:
            return self._read_string(c)
        if vtype == GGUFValueType.ARRAY:
            itype = c.u32()
            n = self._read_len(c)
            if itype in _SCALAR_NP and itype != GGUFValueType.BOOL:
                npdt = np.dtype(_SCALAR_NP[itype]).newbyteorder("<")
                arr = np.frombuffer(c.read(n * npdt.itemsize), dtype=npdt)
                return arr
            return [self._read_value(c, itype) for _ in range(n)]
        return c.scalar(vtype)

    def _parse(self) -> None:
        c = _Cursor(self._mm)
        if c.u32() != GGUF_MAGIC:
            raise ValueError(f"{self.path}: not a GGUF file")
        self.version = c.u32()
        if self.version not in (1, 2, 3):
            raise ValueError(f"unsupported GGUF version {self.version}")
        n_tensors = self._read_len(c)
        n_kv = self._read_len(c)
        for _ in range(n_kv):
            key = self._read_string(c)
            vtype = c.u32()
            self.metadata[key] = self._read_value(c, vtype)
        align = self.metadata.get("general.alignment")
        if align:
            self.alignment = int(align)
        for _ in range(n_tensors):
            name = self._read_string(c)
            n_dims = c.u32()
            dims = tuple(self._read_len(c) for _ in range(n_dims))
            ttype = GGMLQuantType(c.u32())
            offset = c.u64()
            info = GGUFTensorInfo(name=name, shape=dims, ggml_type=ttype, offset=offset)
            info.n_bytes = self._tensor_nbytes(info)
            self.tensors[name] = info
        self.data_offset = (c.pos + self.alignment - 1) // self.alignment * self.alignment

    @staticmethod
    def _tensor_nbytes(info: GGUFTensorInfo) -> int:
        tr = TYPE_TRAITS[info.ggml_type]
        # ggml blocks run along ne[0] (the innermost/contiguous dimension)
        ne0 = info.shape[0] if info.shape else 1
        rows = info.n_elements // max(ne0, 1)
        return rows * row_byte_size(ne0, info.ggml_type)

    # -- data access ---------------------------------------------------------

    def tensor_data(self, name: str) -> np.ndarray:
        """Zero-copy uint8 view of a tensor's wire bytes."""
        info = self.tensors[name]
        start = self.data_offset + info.offset
        return np.frombuffer(self._mm, dtype=np.uint8, count=info.n_bytes, offset=start)

    def tensor_float(self, name: str) -> np.ndarray:
        """Decode a tensor to float32 with numpy shape (reversed ggml dims:
        ggml ne=(cols, rows, ...) -> numpy shape (..., rows, cols))."""
        from llama_kotlin_tpu.quant import numpy_ref

        info = self.tensors[name]
        flat = numpy_ref.dequantize(self.tensor_data(name), info.ggml_type)
        return flat.reshape(tuple(reversed(info.shape)))

    def close(self) -> None:
        try:
            self._mm.close()
        except BufferError:
            pass  # zero-copy tensor views still alive; the mmap is freed
            # when they are collected (mmap keeps the fd internally)
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __repr__(self) -> str:
        return (
            f"GGUFFile({self.path.name!r}, v{self.version}, "
            f"{len(self.metadata)} kv, {len(self.tensors)} tensors)"
        )
