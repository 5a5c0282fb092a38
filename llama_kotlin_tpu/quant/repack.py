"""Wire-format -> QTensor repacking (host-side numpy, done once at load).

Extracts integer codes and scale planes from ggml wire blocks and lays them
out in the TPU-friendly QTensor format (see qtensor.py).  The bit logic
mirrors the decoders in numpy_ref.py (parity target ggml-quants.c), but
yields codes/scales instead of floats so dequantization can be fused into
matmul kernels on device.
"""

from __future__ import annotations

import numpy as np

from llama_kotlin_tpu.quant.formats import GGMLQuantType, QK_K, TYPE_TRAITS
from llama_kotlin_tpu.quant.numpy_ref import (
    _f16,
    unpack_q3k_scales,
    unpack_scale_min_k4,
)
from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN


def _wire_blocks(data: np.ndarray, qtype: GGMLQuantType, n: int, k: int) -> np.ndarray:
    tr = TYPE_TRAITS[qtype]
    data = np.ascontiguousarray(data, np.uint8).reshape(-1)
    expect = n * (k // tr.block_size) * tr.type_size
    if data.size != expect:
        raise ValueError(f"wire size {data.size} != expected {expect} for {tr.name} [{n},{k}]")
    return data.reshape(n, k // tr.block_size, tr.type_size)


def _pad_k(a: np.ndarray, k_pad: int, fill=0) -> np.ndarray:
    """Pad the trailing axis to k_pad columns."""
    if a.shape[-1] == k_pad:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, k_pad - a.shape[-1])]
    return np.pad(a, pad, constant_values=fill)


def _pack4(codes: np.ndarray) -> np.ndarray:
    """uint4 codes [n, k_pad] -> plane-packed bytes [n, k_pad // 2]."""
    n, k = codes.shape
    c = codes.reshape(n, k // SPAN, 2, SPAN // 2).astype(np.uint8)
    return (c[:, :, 0] | (c[:, :, 1] << 4)).reshape(n, k // 2)


def _pack2(codes: np.ndarray) -> np.ndarray:
    """uint2 codes [n, k_pad] -> plane-packed bytes [n, k_pad // 4]."""
    n, k = codes.shape
    c = codes.reshape(n, k // SPAN, 4, SPAN // 4).astype(np.uint8)
    return (c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4) | (c[:, :, 3] << 6)).reshape(
        n, k // 4
    )


def _k_pad_of(k: int) -> int:
    return (k + SPAN - 1) // SPAN * SPAN


def _make(qtype, codes, bits, group_size, code_offset, n, k, g_scale, g_min=None,
          sb_scale=None, sb_min=None) -> QTensor:
    k_pad = _k_pad_of(k)
    if bits == 8:
        packed = _pad_k(codes, k_pad).astype(codes.dtype)
    elif bits == 4:
        packed = _pack4(_pad_k(codes, k_pad))
    elif bits == 2:
        packed = _pack2(_pad_k(codes, k_pad))
    else:
        raise ValueError(bits)
    g_scale = _pad_k(g_scale, k_pad // group_size)
    if g_min is not None:
        g_min = _pad_k(g_min, k_pad // group_size)
    if sb_scale is not None:
        sb_scale = _pad_k(sb_scale, k_pad // SPAN)
    if sb_min is not None:
        sb_min = _pad_k(sb_min, k_pad // SPAN)
    return QTensor(
        codes=packed, g_scale=g_scale, g_min=g_min, sb_scale=sb_scale, sb_min=sb_min,
        qtype=qtype, bits=bits, group_size=group_size, code_offset=code_offset,
        shape=(n, k),
    )


# -- legacy formats ---------------------------------------------------------


def repack_q4_0(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q4_0, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)  # [n, k/32] f16
    qs = b[:, :, 2:18]
    codes = np.concatenate([qs & 0x0F, qs >> 4], axis=-1).reshape(n, k)
    return _make(GGMLQuantType.Q4_0, codes, 4, 32, 8, n, k, g_scale=d)


def repack_q4_1(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q4_1, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)
    m = b[:, :, 2:4].reshape(n, -1).view("<f2").astype(np.float32)
    qs = b[:, :, 4:20]
    codes = np.concatenate([qs & 0x0F, qs >> 4], axis=-1).reshape(n, k)
    # value = q*d + m  ->  q*d - (-m)
    return _make(GGMLQuantType.Q4_1, codes, 4, 32, 0, n, k, g_scale=d, g_min=-m)


def repack_q5_0(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q5_0, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)
    qh = np.ascontiguousarray(b[:, :, 2:6]).view("<u4")[..., 0]  # [n, k/32]
    qs = b[:, :, 6:22]
    j = np.arange(16)
    lo = (qs & 0x0F) | (((qh[..., None] >> j) << 4) & 0x10).astype(np.uint8)
    hi = (qs >> 4) | ((qh[..., None] >> (j + 12)) & 0x10).astype(np.uint8)
    codes = (np.concatenate([lo, hi], axis=-1).astype(np.int16) - 16).astype(np.int8)
    return _make(GGMLQuantType.Q5_0, codes.reshape(n, k), 8, 32, 0, n, k, g_scale=d)


def repack_q5_1(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q5_1, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)
    m = b[:, :, 2:4].reshape(n, -1).view("<f2").astype(np.float32)
    qh = np.ascontiguousarray(b[:, :, 4:8]).view("<u4")[..., 0]
    qs = b[:, :, 8:24]
    j = np.arange(16)
    lo = (qs & 0x0F) | (((qh[..., None] >> j) << 4) & 0x10).astype(np.uint8)
    hi = (qs >> 4) | ((qh[..., None] >> (j + 12)) & 0x10).astype(np.uint8)
    codes = np.concatenate([lo, hi], axis=-1).astype(np.int8)
    return _make(GGMLQuantType.Q5_1, codes.reshape(n, k), 8, 32, 0, n, k, g_scale=d, g_min=-m)


def repack_q8_0(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q8_0, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)
    codes = np.ascontiguousarray(b[:, :, 2:34]).view(np.int8).reshape(n, k)
    return _make(GGMLQuantType.Q8_0, codes, 8, 32, 0, n, k, g_scale=d)


# -- K-quants ---------------------------------------------------------------


def repack_q2_k(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q2_K, n, k)
    scales = b[:, :, 0:16]
    qs = b[:, :, 16:80]
    d = b[:, :, 80:82].reshape(n, -1).view("<f2").astype(np.float32)
    dmin = b[:, :, 82:84].reshape(n, -1).view("<f2").astype(np.float32)
    nsb = k // QK_K
    codes = np.empty((n, nsb, QK_K), np.uint8)
    # element order identical to dequantize_q2_k
    for half_i, off in enumerate((0, 128)):
        qb = qs[:, :, off // 4 : off // 4 + 32]
        for si, shift in enumerate((0, 2, 4, 6)):
            codes[:, :, off + si * 32 : off + si * 32 + 32] = (qb >> shift) & 3
    g_scale = (scales & 0x0F).reshape(n, -1)  # [n, k/16] 4-bit
    g_min = (scales >> 4).reshape(n, -1)
    return _make(GGMLQuantType.Q2_K, codes.reshape(n, k), 2, 16, 0, n, k,
                 g_scale=g_scale, g_min=g_min, sb_scale=d, sb_min=dmin)


def repack_q3_k(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q3_K, n, k)
    hmask = b[:, :, 0:32]
    qs = b[:, :, 32:96]
    sc = unpack_q3k_scales(b[:, :, 96:108])  # [n, nsb, 16] signed
    d = b[:, :, 108:110].reshape(n, -1).view("<f2").astype(np.float32)
    nsb = k // QK_K
    codes = np.empty((n, nsb, QK_K), np.int8)
    m = 1
    for off in (0, 128):
        qb = qs[:, :, off // 4 : off // 4 + 32]
        for shift in (0, 2, 4, 6):
            low = ((qb >> shift) & 3).astype(np.int8)
            high = ((hmask & m) == 0).astype(np.int8) * 4
            codes[:, :, off + (shift // 2) * 32 : off + (shift // 2) * 32 + 32] = low - high
            m <<= 1
    return _make(GGMLQuantType.Q3_K, codes.reshape(n, k), 8, 16, 0, n, k,
                 g_scale=sc.astype(np.int8).reshape(n, -1), sb_scale=d)


def repack_q4_k(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q4_K, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)
    dmin = b[:, :, 2:4].reshape(n, -1).view("<f2").astype(np.float32)
    sc, mn = unpack_scale_min_k4(b[:, :, 4:16])  # [n, nsb, 8]
    qs = b[:, :, 16:144]
    nsb = k // QK_K
    codes = np.empty((n, nsb, QK_K), np.uint8)
    for j in range(4):
        chunk = qs[:, :, 32 * j : 32 * j + 32]
        codes[:, :, 64 * j : 64 * j + 32] = chunk & 0x0F
        codes[:, :, 64 * j + 32 : 64 * j + 64] = chunk >> 4
    return _make(GGMLQuantType.Q4_K, codes.reshape(n, k), 4, 32, 0, n, k,
                 g_scale=sc.astype(np.uint8).reshape(n, -1),
                 g_min=mn.astype(np.uint8).reshape(n, -1), sb_scale=d, sb_min=dmin)


def repack_q5_k(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q5_K, n, k)
    d = b[:, :, 0:2].reshape(n, -1).view("<f2").astype(np.float32)
    dmin = b[:, :, 2:4].reshape(n, -1).view("<f2").astype(np.float32)
    sc, mn = unpack_scale_min_k4(b[:, :, 4:16])
    qh = b[:, :, 16:48]
    qs = b[:, :, 48:176]
    nsb = k // QK_K
    codes = np.empty((n, nsb, QK_K), np.uint8)
    for j in range(4):
        chunk = qs[:, :, 32 * j : 32 * j + 32]
        u1 = np.uint8(1 << (2 * j))
        u2 = np.uint8(2 << (2 * j))
        codes[:, :, 64 * j : 64 * j + 32] = (chunk & 0x0F) | ((qh & u1) != 0) * np.uint8(16)
        codes[:, :, 64 * j + 32 : 64 * j + 64] = (chunk >> 4) | ((qh & u2) != 0) * np.uint8(16)
    return _make(GGMLQuantType.Q5_K, codes.reshape(n, k), 8, 32, 0, n, k,
                 g_scale=sc.astype(np.uint8).reshape(n, -1),
                 g_min=mn.astype(np.uint8).reshape(n, -1), sb_scale=d, sb_min=dmin)


def repack_q6_k(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q6_K, n, k)
    ql = b[:, :, 0:128]
    qh = b[:, :, 128:192]
    scales = np.ascontiguousarray(b[:, :, 192:208]).view(np.int8)
    d = b[:, :, 208:210].reshape(n, -1).view("<f2").astype(np.float32)
    nsb = k // QK_K
    codes = np.empty((n, nsb, QK_K), np.int8)
    for half in (0, 1):
        lql = ql[:, :, 64 * half : 64 * half + 64]
        lqh = qh[:, :, 32 * half : 32 * half + 32]
        base = 128 * half
        codes[:, :, base : base + 32] = (
            ((lql[:, :, :32] & 0x0F) | ((lqh & 0x03) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
        codes[:, :, base + 32 : base + 64] = (
            ((lql[:, :, 32:] & 0x0F) | (((lqh >> 2) & 0x03) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
        codes[:, :, base + 64 : base + 96] = (
            ((lql[:, :, :32] >> 4) | (((lqh >> 4) & 0x03) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
        codes[:, :, base + 96 : base + 128] = (
            ((lql[:, :, 32:] >> 4) | (((lqh >> 6) & 0x03) << 4)).astype(np.int16) - 32
        ).astype(np.int8)
    return _make(GGMLQuantType.Q6_K, codes.reshape(n, k), 8, 16, 0, n, k,
                 g_scale=scales.reshape(n, -1), sb_scale=d)


def repack_q8_k(data, n, k) -> QTensor:
    b = _wire_blocks(data, GGMLQuantType.Q8_K, n, k)
    d = np.ascontiguousarray(b[:, :, 0:4]).view("<f4")[..., 0]  # [n, k/256] f32
    codes = np.ascontiguousarray(b[:, :, 4 : 4 + QK_K]).view(np.int8).reshape(n, k)
    return _make(GGMLQuantType.Q8_K, codes, 8, QK_K, 0, n, k, g_scale=d)


# -- IQ (codebook) formats ----------------------------------------------------


def repack_iq(data: np.ndarray, qtype: GGMLQuantType, n: int, k: int) -> QTensor:
    """Exact IQ -> QTensor repack: int8 codes + small-int group scales under
    an f32 per-superblock scale (see quant/iq.py for the factoring and the
    f32-exactness argument; parity target: the dequantize_row_iq* family in
    reference ggml/src/ggml-quants.c:3311-3590).  8-bit-resident — larger
    than the wire format but exact; serving can still pick Q8F/W4 modes."""
    from llama_kotlin_tpu.quant import iq

    tr = TYPE_TRAITS[qtype]
    expect = n * (k // tr.block_size) * tr.type_size
    data = np.ascontiguousarray(data, np.uint8).reshape(-1)
    if data.size != expect:
        raise ValueError(f"wire size {data.size} != expected {expect} for {tr.name} [{n},{k}]")
    codes, g, sb, gs = iq.iq_split(data, qtype)
    return _make(qtype, codes.reshape(n, k), 8, gs, 0, n, k,
                 g_scale=g.reshape(n, k // gs),
                 sb_scale=sb.reshape(n, -1) if sb is not None else None)


def _iq_repacker(qtype: GGMLQuantType):
    return lambda data, n, k: repack_iq(data, qtype, n, k)


REPACKERS = {
    GGMLQuantType.Q4_0: repack_q4_0,
    GGMLQuantType.Q4_1: repack_q4_1,
    GGMLQuantType.Q5_0: repack_q5_0,
    GGMLQuantType.Q5_1: repack_q5_1,
    GGMLQuantType.Q8_0: repack_q8_0,
    GGMLQuantType.Q2_K: repack_q2_k,
    GGMLQuantType.Q3_K: repack_q3_k,
    GGMLQuantType.Q4_K: repack_q4_k,
    GGMLQuantType.Q5_K: repack_q5_k,
    GGMLQuantType.Q6_K: repack_q6_k,
    GGMLQuantType.Q8_K: repack_q8_k,
    **{qt: _iq_repacker(qt) for qt in (
        GGMLQuantType.IQ2_XXS, GGMLQuantType.IQ2_XS, GGMLQuantType.IQ2_S,
        GGMLQuantType.IQ3_XXS, GGMLQuantType.IQ3_S,
        GGMLQuantType.IQ1_S, GGMLQuantType.IQ1_M,
        GGMLQuantType.IQ4_NL, GGMLQuantType.IQ4_XS,
    )},
}


def _native_repack(data: np.ndarray, qtype: GGMLQuantType, n: int, k: int):
    """C++ fast path for the large-model formats; None -> numpy fallback."""
    from llama_kotlin_tpu.native import get_native

    lib = get_native()
    if lib is None or k % TYPE_TRAITS[qtype].block_size != 0:
        return None
    k_pad = _k_pad_of(k)
    src = np.ascontiguousarray(data, np.uint8)
    c = lambda a: a.ctypes.data_as(__import__("ctypes").c_void_p)
    if qtype == GGMLQuantType.Q8_0:
        codes = np.zeros((n, k_pad), np.int8)
        d = np.zeros((n, k_pad // 32), np.float32)
        lib.repack_q8_0(c(src), n, k, k_pad, c(codes), c(d))
        return QTensor(codes=codes, g_scale=d, g_min=None, sb_scale=None,
                       sb_min=None, qtype=qtype, bits=8, group_size=32,
                       code_offset=0, shape=(n, k))
    if qtype == GGMLQuantType.Q4_0:
        packed = np.zeros((n, k_pad // 2), np.uint8)
        d = np.zeros((n, k_pad // 32), np.float32)
        lib.repack_q4_0(c(src), n, k, k_pad, c(packed), c(d))
        return QTensor(codes=packed, g_scale=d, g_min=None, sb_scale=None,
                       sb_min=None, qtype=qtype, bits=4, group_size=32,
                       code_offset=8, shape=(n, k))
    if qtype == GGMLQuantType.Q4_K and k % 256 == 0:
        packed = np.zeros((n, k_pad // 2), np.uint8)
        sc = np.zeros((n, k_pad // 32), np.uint8)
        mn = np.zeros((n, k_pad // 32), np.uint8)
        d = np.zeros((n, k_pad // 256), np.float32)
        dmin = np.zeros((n, k_pad // 256), np.float32)
        lib.repack_q4_k(c(src), n, k, k_pad, c(packed), c(sc), c(mn), c(d), c(dmin))
        return QTensor(codes=packed, g_scale=sc, g_min=mn, sb_scale=d,
                       sb_min=dmin, qtype=qtype, bits=4, group_size=32,
                       code_offset=0, shape=(n, k))
    if qtype == GGMLQuantType.Q6_K and k % 256 == 0:
        codes = np.zeros((n, k_pad), np.int8)
        sc = np.zeros((n, k_pad // 16), np.int8)
        d = np.zeros((n, k_pad // 256), np.float32)
        lib.repack_q6_k(c(src), n, k, k_pad, c(codes), c(sc), c(d))
        return QTensor(codes=codes, g_scale=sc, g_min=None, sb_scale=d,
                       sb_min=None, qtype=qtype, bits=8, group_size=16,
                       code_offset=0, shape=(n, k))
    return None


def repack(data: np.ndarray, qtype: GGMLQuantType, n: int, k: int) -> QTensor:
    """Repack wire bytes of an [n, k] row-major tensor into a QTensor."""
    if qtype not in REPACKERS:
        raise NotImplementedError(f"repack not implemented for {qtype!r}")
    native = _native_repack(data, qtype, n, k)
    if native is not None:
        return native
    return REPACKERS[qtype](data, n, k)


def repack_float(x: np.ndarray, qtype: GGMLQuantType) -> QTensor:
    """Quantize float data [n, k] to the wire format, then repack."""
    from llama_kotlin_tpu.quant import numpy_ref

    n, k = x.shape
    wire = numpy_ref.quantize(np.ascontiguousarray(x, np.float32), qtype)
    return repack(wire, qtype, n, k)


# -- Q8F fast-mode conversion ------------------------------------------------


def float_to_q8flat(x: np.ndarray) -> QTensor:
    """float [n, k] -> flat int8 codes with one f32 scale per 256-superblock
    (the W8A8 fast-mode layout; see ops/pallas/qmm_int8.py)."""
    n, k = x.shape
    k_pad = _k_pad_of(k)
    xf = _pad_k(np.ascontiguousarray(x, np.float32), k_pad)
    xr = xf.reshape(n, k_pad // SPAN, SPAN)
    amax = np.abs(xr).max(axis=-1)
    scale = (amax / 127.0).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0)
    codes = np.clip(np.rint(xr / safe[..., None]), -127, 127).astype(np.int8)
    return QTensor(codes=codes.reshape(n, k_pad), g_scale=scale, g_min=None,
                   sb_scale=None, sb_min=None, qtype=GGMLQuantType.Q8_0,
                   bits=8, group_size=SPAN, code_offset=0, shape=(n, k))


def repack_q8flat(data: np.ndarray, qtype: GGMLQuantType, n: int, k: int) -> QTensor:
    """Wire format -> Q8F: decode then flat-int8 requantize.  The added
    requant noise is ~(sb_range/254)^2/12 — below the source quantization
    noise for <=6-bit formats (KL-validated in tests)."""
    from llama_kotlin_tpu.quant import numpy_ref

    w = numpy_ref.dequantize(data, qtype, shape=(n, k))
    return float_to_q8flat(w)
