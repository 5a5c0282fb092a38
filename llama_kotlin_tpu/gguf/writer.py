"""GGUF v3 writer.

Used by the quantize tool (GGUF -> GGUF requant), test fixtures (synthetic
tiny models, mirroring the reference's TestGGUFGenerator fixture pattern),
and state export.  Writes version 3, little-endian.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any

import numpy as np

from llama_kotlin_tpu.gguf.reader import GGUFValueType, GGUF_MAGIC, DEFAULT_ALIGNMENT
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS


def _pack_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _infer_vtype(v: Any) -> int:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, int):
        return GGUFValueType.INT64 if v < 0 else GGUFValueType.UINT32 if v < 2**32 else GGUFValueType.UINT64
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, str):
        return GGUFValueType.STRING
    raise TypeError(f"cannot infer GGUF type for {type(v)}")


_NP_TO_VTYPE = {
    np.dtype(np.uint8): GGUFValueType.UINT8,
    np.dtype(np.int8): GGUFValueType.INT8,
    np.dtype(np.uint16): GGUFValueType.UINT16,
    np.dtype(np.int16): GGUFValueType.INT16,
    np.dtype(np.uint32): GGUFValueType.UINT32,
    np.dtype(np.int32): GGUFValueType.INT32,
    np.dtype(np.float32): GGUFValueType.FLOAT32,
    np.dtype(np.uint64): GGUFValueType.UINT64,
    np.dtype(np.int64): GGUFValueType.INT64,
    np.dtype(np.float64): GGUFValueType.FLOAT64,
}


class GGUFWriter:
    """Streaming GGUF writer: add_kv / add_tensor, then write(path)."""

    def __init__(self, alignment: int = DEFAULT_ALIGNMENT):
        self.alignment = alignment
        self._kv: list[tuple[str, bytes]] = []
        self._tensors: list[tuple[str, tuple[int, ...], GGMLQuantType, bytes]] = []
        self.add_kv("general.alignment", np.uint32(alignment))

    # -- metadata ------------------------------------------------------------

    def _encode_value(self, v: Any) -> bytes:
        if isinstance(v, str):
            return struct.pack("<I", GGUFValueType.STRING) + _pack_string(v)
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return struct.pack("<I?", GGUFValueType.BOOL, bool(v))
        if isinstance(v, np.generic):
            vtype = _NP_TO_VTYPE[v.dtype]
            fmt = {GGUFValueType.UINT8: "<B", GGUFValueType.INT8: "<b",
                   GGUFValueType.UINT16: "<H", GGUFValueType.INT16: "<h",
                   GGUFValueType.UINT32: "<I", GGUFValueType.INT32: "<i",
                   GGUFValueType.FLOAT32: "<f", GGUFValueType.UINT64: "<Q",
                   GGUFValueType.INT64: "<q", GGUFValueType.FLOAT64: "<d"}[vtype]
            return struct.pack("<I", vtype) + struct.pack(fmt, v)
        if isinstance(v, (list, tuple, np.ndarray)):
            return self._encode_array(v)
        if isinstance(v, int):
            vt = _infer_vtype(v)
            fmt = {GGUFValueType.UINT32: "<I", GGUFValueType.UINT64: "<Q",
                   GGUFValueType.INT64: "<q"}[vt]
            return struct.pack("<I", vt) + struct.pack(fmt, v)
        if isinstance(v, float):
            return struct.pack("<If", GGUFValueType.FLOAT32, v)
        raise TypeError(f"unsupported GGUF value {type(v)}")

    def _encode_array(self, v) -> bytes:
        if isinstance(v, np.ndarray) and v.dtype in _NP_TO_VTYPE:
            itype = _NP_TO_VTYPE[v.dtype]
            body = v.astype(v.dtype.newbyteorder("<")).tobytes()
            return struct.pack("<IIQ", GGUFValueType.ARRAY, itype, v.size) + body
        items = list(v)
        if not items:
            return struct.pack("<IIQ", GGUFValueType.ARRAY, GGUFValueType.UINT32, 0)
        if all(isinstance(x, str) for x in items):
            body = b"".join(_pack_string(x) for x in items)
            return struct.pack("<IIQ", GGUFValueType.ARRAY, GGUFValueType.STRING, len(items)) + body
        if all(isinstance(x, (int, np.integer)) and not isinstance(x, bool) for x in items):
            body = b"".join(struct.pack("<i", int(x)) for x in items)
            return struct.pack("<IIQ", GGUFValueType.ARRAY, GGUFValueType.INT32, len(items)) + body
        if all(isinstance(x, (float, np.floating)) for x in items):
            body = b"".join(struct.pack("<f", float(x)) for x in items)
            return struct.pack("<IIQ", GGUFValueType.ARRAY, GGUFValueType.FLOAT32, len(items)) + body
        raise TypeError("mixed-type GGUF arrays unsupported")

    def add_kv(self, key: str, value: Any) -> None:
        self._kv.append((key, self._encode_value(value)))

    # -- tensors -------------------------------------------------------------

    def add_tensor(
        self,
        name: str,
        data: np.ndarray,
        ggml_type: GGMLQuantType | None = None,
        raw_shape: tuple[int, ...] | None = None,
    ) -> None:
        """Add a tensor.

        If `data` is float and `ggml_type` is quantized, the data is encoded.
        If `data` is already wire bytes (uint8), `raw_shape` (ggml ne order,
        innermost first) must be given.
        """
        from llama_kotlin_tpu.quant import numpy_ref

        if data.dtype == np.uint8 and raw_shape is not None:
            assert ggml_type is not None
            self._tensors.append((name, tuple(raw_shape), ggml_type, data.tobytes()))
            return
        if ggml_type is None:
            ggml_type = GGMLQuantType.F32
        # numpy shape (..., rows, cols) -> ggml ne (cols, rows, ...)
        ne = tuple(reversed(data.shape))
        wire = numpy_ref.quantize(np.ascontiguousarray(data, np.float32), ggml_type)
        self._tensors.append((name, ne, ggml_type, wire.tobytes()))

    # -- output --------------------------------------------------------------

    def write(self, path: str | Path) -> None:
        align = self.alignment
        header = struct.pack("<IIQQ", GGUF_MAGIC, 3, len(self._tensors), len(self._kv))
        kv_block = b"".join(_pack_string(k) + v for k, v in self._kv)
        # layout tensor data with aligned offsets
        infos = b""
        offset = 0
        blobs: list[bytes] = []
        for name, ne, ttype, blob in self._tensors:
            infos += _pack_string(name)
            infos += struct.pack("<I", len(ne))
            for d in ne:
                infos += struct.pack("<Q", d)
            infos += struct.pack("<IQ", int(ttype), offset)
            pad = (-len(blob)) % align
            blobs.append(blob + b"\x00" * pad)
            offset += len(blob) + pad
        head = header + kv_block + infos
        head_pad = (-len(head)) % align
        with open(path, "wb") as f:
            f.write(head)
            f.write(b"\x00" * head_pad)
            for b in blobs:
                f.write(b)
