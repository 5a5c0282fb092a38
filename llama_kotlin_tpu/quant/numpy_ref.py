"""Layout-exact numpy codecs for the ggml block-quant wire formats.

Decode functions (``dequantize``) reproduce the reference decoders
bit-for-bit for every supported type (parity target:
``ggml/src/ggml-quants.c`` ``dequantize_row_*``), so any tensor written by
upstream llama.cpp/ggml decodes to identical float values here.

Encode functions (``quantize``) mirror the reference quantizers: the legacy
32-element formats use the same closed-form scaling as
``quantize_row_{q4_0,q4_1,q5_0,q5_1,q8_0}_ref``; the K-quant encoders use
weighted alternating least-squares + scale sweeps in the spirit of
``make_qx_quants`` / ``make_qkx2_quants`` (re-derived, vectorised over all
super-blocks at once rather than translated).

All functions are vectorised over an arbitrary number of rows; the wire
layout is little-endian, matching GGUF.
"""

from __future__ import annotations

import numpy as np

from llama_kotlin_tpu.quant.formats import (
    GGMLQuantType,
    QK_K,
    TYPE_TRAITS,
    row_byte_size,
)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _f16(x: np.ndarray) -> np.ndarray:
    """View little-endian byte pairs as float16 -> float32."""
    return x.view("<f2").astype(np.float32)


def _to_f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype("<f2").view(np.uint8)


def _blocks(data: np.ndarray, qtype: GGMLQuantType) -> np.ndarray:
    """Reshape a flat uint8 buffer into [n_blocks, type_size]."""
    ts = TYPE_TRAITS[qtype].type_size
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    if data.size % ts != 0:
        raise ValueError(f"buffer size {data.size} not divisible by block size {ts}")
    return data.reshape(-1, ts)


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """Round half to even, like ggml's nearest_int() (the +1.5*2^23 trick
    rounds in the FPU's default round-to-nearest-even mode)."""
    return np.rint(x).astype(np.int32)


def _signed_extreme(x: np.ndarray, axis: int = -1, keepdims: bool = True) -> np.ndarray:
    """The signed value with the largest magnitude along `axis`."""
    idx = np.argmax(np.abs(x), axis=axis, keepdims=True)
    ext = np.take_along_axis(x, idx, axis=axis)
    if not keepdims:
        ext = np.squeeze(ext, axis=axis)
    return ext


# ---------------------------------------------------------------------------
# legacy 32-element formats — decode
# ---------------------------------------------------------------------------


def dequantize_q4_0(data: np.ndarray) -> np.ndarray:
    """block_q4_0 {f16 d; u8 qs[16]} -> 32 floats. ggml-quants.c dequantize_row_q4_0."""
    b = _blocks(data, GGMLQuantType.Q4_0)
    d = _f16(b[:, 0:2])  # [nb,1]
    qs = b[:, 2:18]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)  # elem j and j+16
    return q * d


def dequantize_q4_1(data: np.ndarray) -> np.ndarray:
    b = _blocks(data, GGMLQuantType.Q4_1)
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qs = b[:, 4:20]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=1)
    return q * d + m


def dequantize_q5_0(data: np.ndarray) -> np.ndarray:
    b = _blocks(data, GGMLQuantType.Q5_0)
    d = _f16(b[:, 0:2])
    qh = b[:, 2:6].copy().view("<u4").reshape(-1, 1)  # [nb,1] uint32
    qs = b[:, 6:22]
    j = np.arange(16)
    xh0 = ((qh >> j) << 4) & 0x10  # high bit of elems 0..15
    xh1 = (qh >> (j + 12)) & 0x10  # high bit of elems 16..31
    lo = ((qs & 0x0F) | xh0).astype(np.int16) - 16
    hi = ((qs >> 4) | xh1).astype(np.int16) - 16
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return q * d


def dequantize_q5_1(data: np.ndarray) -> np.ndarray:
    b = _blocks(data, GGMLQuantType.Q5_1)
    d = _f16(b[:, 0:2])
    m = _f16(b[:, 2:4])
    qh = b[:, 4:8].copy().view("<u4").reshape(-1, 1)
    qs = b[:, 8:24]
    j = np.arange(16)
    xh0 = ((qh >> j) << 4) & 0x10
    xh1 = (qh >> (j + 12)) & 0x10
    lo = ((qs & 0x0F) | xh0).astype(np.float32)
    hi = ((qs >> 4) | xh1).astype(np.float32)
    q = np.concatenate([lo, hi], axis=1)
    return q * d + m


def dequantize_q8_0(data: np.ndarray) -> np.ndarray:
    b = _blocks(data, GGMLQuantType.Q8_0)
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].view(np.int8).astype(np.float32)
    return qs * d


def dequantize_q8_1(data: np.ndarray) -> np.ndarray:
    b = _blocks(data, GGMLQuantType.Q8_1)
    d = _f16(b[:, 0:2])
    qs = b[:, 4:36].view(np.int8).astype(np.float32)
    return qs * d


# ---------------------------------------------------------------------------
# legacy 32-element formats — encode
# ---------------------------------------------------------------------------


def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    """quantize_row_q4_0_ref semantics: d = signed_max / -8."""
    x = x.reshape(-1, 32).astype(np.float32)
    smax = _signed_extreme(x)  # [nb,1]
    d = smax / -8.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(15, (x * inv + 8.5).astype(np.int32)).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    out = np.empty((x.shape[0], 18), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:18] = lo | (hi << 4)
    return out.reshape(-1)


def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    d = (mx - mn) / 15.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(15, ((x - mn) * inv + 0.5).astype(np.int32)).astype(np.uint8)
    out = np.empty((x.shape[0], 20), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(mn).reshape(-1, 2)
    out[:, 4:20] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def quantize_q5_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    smax = _signed_extreme(x)
    d = smax / -16.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(31, (x * inv + 16.5).astype(np.int32)).astype(np.uint32)
    lo, hi = q[:, :16], q[:, 16:]
    j = np.arange(16)
    qh = (((lo >> 4) & 1) << j).sum(axis=1) | (((hi >> 4) & 1) << (j + 16)).sum(axis=1)
    out = np.empty((x.shape[0], 22), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:6] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 6:22] = ((lo & 0x0F) | ((hi & 0x0F) << 4)).astype(np.uint8)
    return out.reshape(-1)


def quantize_q5_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    d = (mx - mn) / 31.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.minimum(31, ((x - mn) * inv + 0.5).astype(np.int32)).astype(np.uint32)
    lo, hi = q[:, :16], q[:, 16:]
    j = np.arange(16)
    qh = (((lo >> 4) & 1) << j).sum(axis=1) | (((hi >> 4) & 1) << (j + 16)).sum(axis=1)
    out = np.empty((x.shape[0], 24), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(mn).reshape(-1, 2)
    out[:, 4:8] = qh.astype("<u4").view(np.uint8).reshape(-1, 4)
    out[:, 8:24] = ((lo & 0x0F) | ((hi & 0x0F) << 4)).astype(np.uint8)
    return out.reshape(-1)


def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    d = amax / 127.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = _nearest_int(x * inv).astype(np.int8)
    out = np.empty((x.shape[0], 34), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out.reshape(-1)


def quantize_q8_1(x: np.ndarray) -> np.ndarray:
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=1, keepdims=True)
    d = amax / 127.0
    inv = np.where(d != 0.0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = _nearest_int(x * inv).astype(np.int8)
    s = d * q.astype(np.float32).sum(axis=1, keepdims=True)
    out = np.empty((x.shape[0], 36), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(s).reshape(-1, 2)
    out[:, 4:36] = q.view(np.uint8)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# K-quants — scale (un)packing helpers
# ---------------------------------------------------------------------------


def unpack_scale_min_k4(scales12: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """12 packed bytes -> (8 x 6-bit scale, 8 x 6-bit min) per super-block.

    Inverse documented at ggml-quants.c get_scale_min_k4: for j<4
    sc=scales[j]&63, m=scales[j+4]&63; for j>=4 sc=(scales[j+4]&0xF)|
    ((scales[j-4]>>6)<<4), m=(scales[j+4]>>4)|((scales[j]>>6)<<4).
    """
    s = scales12.astype(np.uint8)  # [nb,12]
    sc = np.empty(s.shape[:-1] + (8,), np.int32)
    mn = np.empty_like(sc)
    sc[..., :4] = s[..., 0:4] & 63
    mn[..., :4] = s[..., 4:8] & 63
    sc[..., 4:] = (s[..., 8:12] & 0x0F) | ((s[..., 0:4] >> 6) << 4)
    mn[..., 4:] = (s[..., 8:12] >> 4) | ((s[..., 4:8] >> 6) << 4)
    return sc, mn


def pack_scale_min_k4(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """(8 scales, 8 mins) 6-bit each -> 12 packed bytes per super-block."""
    sc = sc.astype(np.uint8)
    mn = mn.astype(np.uint8)
    out = np.empty(sc.shape[:-1] + (12,), np.uint8)
    out[..., 0:4] = (sc[..., :4] & 63) | ((sc[..., 4:] >> 4) << 6)
    out[..., 4:8] = (mn[..., :4] & 63) | ((mn[..., 4:] >> 4) << 6)
    out[..., 8:12] = (sc[..., 4:] & 0x0F) | ((mn[..., 4:] & 0x0F) << 4)
    return out


def unpack_q3k_scales(scales12: np.ndarray) -> np.ndarray:
    """12 bytes -> 16 signed 6-bit scales (value - 32) per q3_K super-block.

    Bit layout per ggml-quants.c dequantize_row_q3_K kmask transform.
    """
    s = scales12.astype(np.uint8)
    out = np.empty(s.shape[:-1] + (16,), np.int32)
    out[..., 0:4] = (s[..., 0:4] & 0x0F) | ((s[..., 8:12] & 0x03) << 4)
    out[..., 4:8] = (s[..., 4:8] & 0x0F) | (((s[..., 8:12] >> 2) & 0x03) << 4)
    out[..., 8:12] = (s[..., 0:4] >> 4) | (((s[..., 8:12] >> 4) & 0x03) << 4)
    out[..., 12:16] = (s[..., 4:8] >> 4) | (((s[..., 8:12] >> 6) & 0x03) << 4)
    return out - 32


def pack_q3k_scales(sc: np.ndarray) -> np.ndarray:
    """16 signed 6-bit scales -> 12 bytes (inverse of unpack_q3k_scales)."""
    u = (sc + 32).astype(np.uint8)
    out = np.empty(u.shape[:-1] + (12,), np.uint8)
    out[..., 0:4] = (u[..., 0:4] & 0x0F) | ((u[..., 8:12] & 0x0F) << 4)
    out[..., 4:8] = (u[..., 4:8] & 0x0F) | ((u[..., 12:16] & 0x0F) << 4)
    out[..., 8:12] = (
        ((u[..., 0:4] >> 4) & 0x03)
        | (((u[..., 4:8] >> 4) & 0x03) << 2)
        | (((u[..., 8:12] >> 4) & 0x03) << 4)
        | (((u[..., 12:16] >> 4) & 0x03) << 6)
    )
    return out


# ---------------------------------------------------------------------------
# K-quants — decode
# ---------------------------------------------------------------------------


def dequantize_q2_k(data: np.ndarray) -> np.ndarray:
    """block_q2_K {u8 scales[16]; u8 qs[64]; f16 d, dmin}. 16 groups of 16."""
    b = _blocks(data, GGMLQuantType.Q2_K)
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    nb = b.shape[0]
    y = np.empty((nb, QK_K), np.float32)
    dl = d * (scales & 0x0F).astype(np.float32)  # [nb,16]
    ml = dmin * (scales >> 4).astype(np.float32)
    g = 0
    for n in (0, 128):  # two 128-element halves, each using 32 qs bytes
        qb = qs[:, n // 4 : n // 4 + 32]
        for shift in (0, 2, 4, 6):
            row = (qb >> shift) & 3  # [nb,32]
            for half in (0, 16):
                y[:, n + (shift // 2) * 32 + half : n + (shift // 2) * 32 + half + 16] = (
                    row[:, half : half + 16].astype(np.float32) * dl[:, g : g + 1]
                    - ml[:, g : g + 1]
                )
                g += 1
    return y


def dequantize_q3_k(data: np.ndarray) -> np.ndarray:
    """block_q3_K {u8 hmask[32]; u8 qs[64]; u8 scales[12]; f16 d}."""
    b = _blocks(data, GGMLQuantType.Q3_K)
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    sc = unpack_q3k_scales(b[:, 96:108])  # [nb,16] signed
    d = _f16(b[:, 108:110])
    nb = b.shape[0]
    y = np.empty((nb, QK_K), np.float32)
    g = 0
    m = 1
    for n in (0, 128):
        qb = qs[:, n // 4 : n // 4 + 32]
        for shift in (0, 2, 4, 6):
            low = ((qb >> shift) & 3).astype(np.int32)
            high = ((hmask & m) == 0).astype(np.int32) * 4  # subtract 4 if bit NOT set
            q = low - high  # == (low | bit<<2) - 4
            for half in (0, 16):
                dl = d * sc[:, g : g + 1].astype(np.float32)
                y[:, n + (shift // 2) * 32 + half : n + (shift // 2) * 32 + half + 16] = (
                    q[:, half : half + 16].astype(np.float32) * dl
                )
                g += 1
            m <<= 1
    return y


def dequantize_q4_k(data: np.ndarray) -> np.ndarray:
    """block_q4_K {f16 d, dmin; u8 scales[12]; u8 qs[128]}. 8 groups of 32."""
    b = _blocks(data, GGMLQuantType.Q4_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = unpack_scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    nb = b.shape[0]
    y = np.empty((nb, QK_K), np.float32)
    for j in range(4):  # each 32-byte qs chunk -> groups 2j (lo) and 2j+1 (hi)
        chunk = qs[:, 32 * j : 32 * j + 32]
        d1 = d * sc[:, 2 * j : 2 * j + 1].astype(np.float32)
        m1 = dmin * mn[:, 2 * j : 2 * j + 1].astype(np.float32)
        d2 = d * sc[:, 2 * j + 1 : 2 * j + 2].astype(np.float32)
        m2 = dmin * mn[:, 2 * j + 1 : 2 * j + 2].astype(np.float32)
        y[:, 64 * j : 64 * j + 32] = (chunk & 0x0F).astype(np.float32) * d1 - m1
        y[:, 64 * j + 32 : 64 * j + 64] = (chunk >> 4).astype(np.float32) * d2 - m2
    return y


def dequantize_q5_k(data: np.ndarray) -> np.ndarray:
    """block_q5_K {f16 d, dmin; u8 scales[12]; u8 qh[32]; u8 qs[128]}."""
    b = _blocks(data, GGMLQuantType.Q5_K)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = unpack_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    nb = b.shape[0]
    y = np.empty((nb, QK_K), np.float32)
    for j in range(4):
        chunk = qs[:, 32 * j : 32 * j + 32]
        u1 = np.uint8(1 << (2 * j))
        u2 = np.uint8(2 << (2 * j))
        d1 = d * sc[:, 2 * j : 2 * j + 1].astype(np.float32)
        m1 = dmin * mn[:, 2 * j : 2 * j + 1].astype(np.float32)
        d2 = d * sc[:, 2 * j + 1 : 2 * j + 2].astype(np.float32)
        m2 = dmin * mn[:, 2 * j + 1 : 2 * j + 2].astype(np.float32)
        hi1 = ((qh & u1) != 0).astype(np.float32) * 16.0
        hi2 = ((qh & u2) != 0).astype(np.float32) * 16.0
        y[:, 64 * j : 64 * j + 32] = ((chunk & 0x0F).astype(np.float32) + hi1) * d1 - m1
        y[:, 64 * j + 32 : 64 * j + 64] = ((chunk >> 4).astype(np.float32) + hi2) * d2 - m2
    return y


def dequantize_q6_k(data: np.ndarray) -> np.ndarray:
    """block_q6_K {u8 ql[128]; u8 qh[64]; i8 scales[16]; f16 d}."""
    b = _blocks(data, GGMLQuantType.Q6_K)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8).astype(np.float32)
    d = _f16(b[:, 208:210])
    nb = b.shape[0]
    y = np.empty((nb, QK_K), np.float32)
    for n in (0, 1):  # two 128-element halves
        lql = ql[:, 64 * n : 64 * n + 64]
        lqh = qh[:, 32 * n : 32 * n + 32]
        sc = scales[:, 8 * n : 8 * n + 8]
        q1 = ((lql[:, :32] & 0x0F) | ((lqh & 0x03) << 4)).astype(np.int32) - 32
        q2 = ((lql[:, 32:] & 0x0F) | (((lqh >> 2) & 0x03) << 4)).astype(np.int32) - 32
        q3 = ((lql[:, :32] >> 4) | (((lqh >> 4) & 0x03) << 4)).astype(np.int32) - 32
        q4 = ((lql[:, 32:] >> 4) | (((lqh >> 6) & 0x03) << 4)).astype(np.int32) - 32
        base = 128 * n
        for i, q in enumerate((q1, q2, q3, q4)):
            # scale index: l//16 + 2*i within the half (ggml: sc[is + 2i])
            s0 = sc[:, 2 * i : 2 * i + 1]
            s1 = sc[:, 2 * i + 1 : 2 * i + 2]
            y[:, base + 32 * i : base + 32 * i + 16] = d * s0 * q[:, :16]
            y[:, base + 32 * i + 16 : base + 32 * i + 32] = d * s1 * q[:, 16:]
    return y


def dequantize_q8_k(data: np.ndarray) -> np.ndarray:
    """block_q8_K {f32 d; i8 qs[256]; i16 bsums[16]}."""
    b = _blocks(data, GGMLQuantType.Q8_K)
    d = b[:, 0:4].copy().view("<f4").reshape(-1, 1)
    qs = b[:, 4 : 4 + QK_K].view(np.int8).astype(np.float32)
    return qs * d


# ---------------------------------------------------------------------------
# K-quants — encode
# ---------------------------------------------------------------------------


def _make_q_symmetric(x: np.ndarray, nmax: int,
                      w: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Weighted scale search for symmetric quant groups (x ~ scale * L).

    In the spirit of ggml make_qx_quants(rmse_type=1): candidate inverse
    scales -(nmax + 0.1*k)/signed_max for k in [-9, 9]; pick the one
    maximising sum(w*x*l)^2 / sum(w*l*l) with w = x^2; return the
    least-squares scale for the winning assignment.

    `w` overrides the default x^2 weights (imatrix-weighted quantization:
    callers pass qw * sqrt(sigma2 + x^2), the reference's quant_weights
    form in make_qx_quants).

    x: [..., g] groups. Returns (L int32 in [-nmax, nmax-1], scale [...]).
    """
    if w is None:
        w = x * x
    smax = _signed_extreme(x)  # [...,1]
    amax = np.abs(smax)
    best_score = np.full(x.shape[:-1] + (1,), -1.0, np.float32)
    best_L = np.zeros(x.shape, np.int32)
    safe_max = np.where(amax < 1e-30, 1.0, smax)
    for k in range(-9, 10):
        iscale = -(nmax + 0.1 * k) / safe_max
        L = np.clip(_nearest_int(iscale * x), -nmax, nmax - 1)
        sumlx = (w * x * L).sum(axis=-1, keepdims=True)
        suml2 = (w * L * L).sum(axis=-1, keepdims=True)
        score = np.where(suml2 > 0, sumlx * sumlx / np.where(suml2 == 0, 1, suml2), -1.0)
        better = score > best_score
        best_score = np.where(better, score, best_score)
        best_L = np.where(better, L, best_L)
    sumlx = (w * x * best_L).sum(axis=-1, keepdims=True)
    suml2 = (w * best_L * best_L).sum(axis=-1, keepdims=True)
    scale = np.where(suml2 > 0, sumlx / np.where(suml2 == 0, 1, suml2), 0.0)
    zero = amax < 1e-30
    scale = np.where(zero, 0.0, scale)
    best_L = np.where(zero, 0, best_L)
    return best_L, scale[..., 0]


def _make_q_asymmetric(
    x: np.ndarray, nmax: int, n_iter: int = 8, w: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Weighted ALS for asymmetric groups (x ~ scale*L - min, min >= 0).

    In the spirit of make_qkx2_quants: start from the range, then alternate
    assignment and weighted least-squares refit of (scale, min), keeping the
    best squared-error solution. Weights sqrt(|x| + mean|x|) like the
    reference's sw weights; `w` overrides them for imatrix-weighted
    quantization (qw * sqrt(sigma2 + x^2), the reference's quant_weights
    form in make_qkx2_quants).

    Returns (L uint in [0,nmax], scale [...], minus_min [...] >= 0).
    """
    if w is None:
        w = np.sqrt(np.abs(x) + np.abs(x).mean(axis=-1, keepdims=True))
    mn = np.minimum(x.min(axis=-1, keepdims=True), 0.0)
    mx = x.max(axis=-1, keepdims=True)
    scale = (mx - mn) / nmax
    safe = np.where(scale <= 0, 1.0, scale)
    best_err = np.full(mn.shape, np.inf, np.float32)
    best_L = np.zeros(x.shape, np.int32)
    best_scale = np.zeros(mn.shape, np.float32)
    best_min = np.zeros(mn.shape, np.float32)
    for _ in range(n_iter):
        L = np.clip(_nearest_int((x - mn) / safe), 0, nmax)
        # weighted least squares for x ~ scale*L + mn
        sw = w.sum(axis=-1, keepdims=True)
        sl = (w * L).sum(axis=-1, keepdims=True)
        sx = (w * x).sum(axis=-1, keepdims=True)
        sll = (w * L * L).sum(axis=-1, keepdims=True)
        slx = (w * L * x).sum(axis=-1, keepdims=True)
        det = sw * sll - sl * sl
        det_safe = np.where(np.abs(det) < 1e-30, 1.0, det)
        new_scale = (sw * slx - sl * sx) / det_safe
        new_min = np.minimum((sll * sx - sl * slx) / det_safe, 0.0)
        err = (w * (new_scale * L + new_min - x) ** 2).sum(axis=-1, keepdims=True)
        better = (err < best_err) & (np.abs(det) > 1e-30)
        best_err = np.where(better, err, best_err)
        best_L = np.where(better, L, best_L)
        best_scale = np.where(better, new_scale, best_scale)
        best_min = np.where(better, new_min, best_min)
        scale = np.where(better, new_scale, scale)
        mn = np.where(better, new_min, mn)
        safe = np.where(scale <= 0, 1.0, scale)
    flat = (mx - mn).squeeze(-1) < 1e-30
    best_scale = np.where(flat[..., None], 0.0, best_scale)
    # flat groups encode their constant via the min term: minus_min =
    # -min(c, 0) >= 0 (matches the native encoder; positive constants are
    # unrepresentable with scale 0 and decode to 0 either way)
    best_min = np.where(flat[..., None], np.minimum(mn, 0.0), best_min)
    return best_L, best_scale[..., 0], -best_min[..., 0]



def _qw_weights(x2d: np.ndarray, qw: np.ndarray | None, gshape):
    """imatrix weights in group layout: qw * sqrt(sigma2 + x^2) with
    sigma2 = 2*mean(x^2) per superblock (the reference quant_weights form
    used by make_qx_quants / make_qkx2_quants when an imatrix is given);
    None when no imatrix."""
    if qw is None:
        return None
    qw2 = np.asarray(qw, np.float32).reshape(x2d.shape)
    sigma2 = 2.0 * (x2d * x2d).mean(axis=-1, keepdims=True)
    w = qw2 * np.sqrt(sigma2 + x2d * x2d)
    return w.reshape(gshape)


def quantize_q2_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)  # 16 groups of 16
    L, scales, mins = _make_q_asymmetric(g, 3, w=_qw_weights(x, qw, g.shape))
    max_s = scales.max(axis=1, keepdims=True)
    max_m = mins.max(axis=1, keepdims=True)
    inv_s = np.where(max_s > 0, 15.0 / np.where(max_s == 0, 1, max_s), 0.0)
    inv_m = np.where(max_m > 0, 15.0 / np.where(max_m == 0, 1, max_m), 0.0)
    ls = np.clip(_nearest_int(inv_s * scales), 0, 15)
    lm = np.clip(_nearest_int(inv_m * mins), 0, 15)
    d = (max_s / 15.0).astype(np.float32)
    dmin = (max_m / 15.0).astype(np.float32)
    # re-assign with the quantized scales
    eff_s = d * ls  # [nb,16]
    eff_m = dmin * lm
    safe = np.where(eff_s == 0, 1.0, eff_s)
    L = np.clip(_nearest_int((g + eff_m[..., None]) / safe[..., None]), 0, 3)
    L = np.where(eff_s[..., None] == 0, 0, L).astype(np.uint8)
    out = np.empty((nb, 84), np.uint8)
    out[:, 0:16] = (ls | (lm << 4)).astype(np.uint8)
    # pack 2-bit: inverse of dequant loop
    qs = np.empty((nb, 64), np.uint8)
    Lf = L.reshape(nb, QK_K)
    for n in (0, 128):
        for shift in (0, 2, 4, 6):
            row = np.concatenate(
                [
                    Lf[:, n + (shift // 2) * 32 : n + (shift // 2) * 32 + 16],
                    Lf[:, n + (shift // 2) * 32 + 16 : n + (shift // 2) * 32 + 32],
                ],
                axis=1,
            )
            if shift == 0:
                qs[:, n // 4 : n // 4 + 32] = row
            else:
                qs[:, n // 4 : n // 4 + 32] |= row << shift
    out[:, 16:80] = qs
    out[:, 80:82] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 82:84] = _to_f16_bytes(dmin).reshape(-1, 2)
    return out.reshape(-1)


def quantize_q3_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    L, scales = _make_q_symmetric(g, 4, w=_qw_weights(x, qw, g.shape))  # L in [-4,3]
    smax = _signed_extreme(scales, axis=1)  # [nb,1]
    safe = np.where(np.abs(smax) < 1e-30, 1.0, smax)
    iscale = -32.0 / safe
    ls = np.clip(_nearest_int(iscale * scales), -32, 31)  # 6-bit signed
    d = np.where(np.abs(smax) < 1e-30, 0.0, 1.0 / iscale).astype(np.float32)
    eff = d * ls
    safe_eff = np.where(eff == 0, 1.0, eff)
    L = np.clip(_nearest_int(g / safe_eff[..., None]), -4, 3)
    L = np.where(eff[..., None] == 0, 0, L)
    Lq = (L + 4).astype(np.uint8).reshape(nb, QK_K)  # [0,7]
    out = np.empty((nb, 110), np.uint8)
    hmask = np.zeros((nb, 32), np.uint8)
    qs = np.zeros((nb, 64), np.uint8)
    m = 1
    for n in (0, 128):
        for shift in (0, 2, 4, 6):
            row = Lq[:, n + (shift // 2) * 32 : n + (shift // 2) * 32 + 32]
            qs[:, n // 4 : n // 4 + 32] |= (row & 3) << shift
            hmask |= ((row >> 2) & 1) * np.uint8(m)
            m <<= 1
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = pack_q3k_scales(ls)
    out[:, 108:110] = _to_f16_bytes(d).reshape(-1, 2)
    return out.reshape(-1)


def _encode_k45(x: np.ndarray, nmax: int, qw: np.ndarray | None = None) -> tuple:
    """Shared scale path for Q4_K (nmax=15) / Q5_K (nmax=31): 8 groups of 32,
    6-bit super-quantized scales/mins."""
    nb = x.shape[0]
    g = x.reshape(nb, 8, 32)
    L, scales, mins = _make_q_asymmetric(g, nmax, w=_qw_weights(x, qw, g.shape))
    max_s = scales.max(axis=1, keepdims=True)
    max_m = mins.max(axis=1, keepdims=True)
    inv_s = np.where(max_s > 0, 63.0 / np.where(max_s == 0, 1, max_s), 0.0)
    inv_m = np.where(max_m > 0, 63.0 / np.where(max_m == 0, 1, max_m), 0.0)
    ls = np.clip(_nearest_int(inv_s * scales), 0, 63)
    lm = np.clip(_nearest_int(inv_m * mins), 0, 63)
    d = (max_s / 63.0).astype(np.float32)
    dmin = (max_m / 63.0).astype(np.float32)
    eff_s = d * ls
    eff_m = dmin * lm
    safe = np.where(eff_s == 0, 1.0, eff_s)
    L = np.clip(_nearest_int((g + eff_m[..., None]) / safe[..., None]), 0, nmax)
    L = np.where(eff_s[..., None] == 0, 0, L).astype(np.uint8)
    return L, ls, lm, d, dmin


def quantize_q4_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    L, ls, lm, d, dmin = _encode_k45(x, 15, qw)
    out = np.empty((nb, 144), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(dmin).reshape(-1, 2)
    out[:, 4:16] = pack_scale_min_k4(ls, lm)
    Lf = L.reshape(nb, QK_K)
    for j in range(4):
        lo = Lf[:, 64 * j : 64 * j + 32]
        hi = Lf[:, 64 * j + 32 : 64 * j + 64]
        out[:, 16 + 32 * j : 16 + 32 * j + 32] = lo | (hi << 4)
    return out.reshape(-1)


def quantize_q5_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    L, ls, lm, d, dmin = _encode_k45(x, 31, qw)
    out = np.empty((nb, 176), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(dmin).reshape(-1, 2)
    out[:, 4:16] = pack_scale_min_k4(ls, lm)
    Lf = L.reshape(nb, QK_K)
    qh = np.zeros((nb, 32), np.uint8)
    for j in range(4):
        lo = Lf[:, 64 * j : 64 * j + 32]
        hi = Lf[:, 64 * j + 32 : 64 * j + 64]
        out[:, 48 + 32 * j : 48 + 32 * j + 32] = (lo & 0x0F) | ((hi & 0x0F) << 4)
        qh |= ((lo >> 4) & 1) << (2 * j)
        qh |= ((hi >> 4) & 1) << (2 * j + 1)
    out[:, 16:48] = qh
    return out.reshape(-1)


def quantize_q6_k(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    g = x.reshape(nb, 16, 16)
    L, scales = _make_q_symmetric(g, 32, w=_qw_weights(x, qw, g.shape))  # L in [-32,31]
    smax = _signed_extreme(scales, axis=1)
    safe = np.where(np.abs(smax) < 1e-30, 1.0, smax)
    iscale = -128.0 / safe
    ls = np.clip(_nearest_int(iscale * scales), -128, 127)
    d = np.where(np.abs(smax) < 1e-30, 0.0, 1.0 / iscale).astype(np.float32)
    eff = d * ls
    safe_eff = np.where(eff == 0, 1.0, eff)
    L = np.clip(_nearest_int(g / safe_eff[..., None]), -32, 31)
    L = np.where(eff[..., None] == 0, 0, L)
    Lq = (L + 32).astype(np.uint8).reshape(nb, QK_K)  # [0,63]
    out = np.empty((nb, 210), np.uint8)
    ql = np.empty((nb, 128), np.uint8)
    qh = np.zeros((nb, 64), np.uint8)
    for n in (0, 1):
        base = 128 * n
        q1 = Lq[:, base : base + 32]
        q2 = Lq[:, base + 32 : base + 64]
        q3 = Lq[:, base + 64 : base + 96]
        q4 = Lq[:, base + 96 : base + 128]
        ql[:, 64 * n : 64 * n + 32] = (q1 & 0x0F) | ((q3 & 0x0F) << 4)
        ql[:, 64 * n + 32 : 64 * n + 64] = (q2 & 0x0F) | ((q4 & 0x0F) << 4)
        qh[:, 32 * n : 32 * n + 32] = (
            (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
        )
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = ls.astype(np.int8).view(np.uint8)
    out[:, 208:210] = _to_f16_bytes(d).reshape(-1, 2)
    return out.reshape(-1)


def quantize_q8_k(x: np.ndarray) -> np.ndarray:
    """quantize_row_q8_K_ref: iscale = -127/signed_max (not -128, see the
    IQ2_XXS note in ggml-quants.c:3615), f32 d, bsums."""
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    smax = _signed_extreme(x)
    amax = np.abs(smax)
    safe = np.where(amax < 1e-30, 1.0, smax)
    iscale = np.float32(-127.0) / safe
    q = np.minimum(127, _nearest_int(iscale * x)).astype(np.int8)
    q = np.where(amax < 1e-30, 0, q)
    d = np.where(amax < 1e-30, 0.0, 1.0 / iscale).astype(np.float32)
    bsums = q.astype(np.int32).reshape(nb, 16, 16).sum(axis=2).astype("<i2")
    out = np.empty((nb, 292), np.uint8)
    out[:, 0:4] = d.astype("<f4").view(np.uint8).reshape(-1, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(nb, 32)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# dispatch tables + public API
# ---------------------------------------------------------------------------

_DEQUANT = {
    GGMLQuantType.Q4_0: dequantize_q4_0,
    GGMLQuantType.Q4_1: dequantize_q4_1,
    GGMLQuantType.Q5_0: dequantize_q5_0,
    GGMLQuantType.Q5_1: dequantize_q5_1,
    GGMLQuantType.Q8_0: dequantize_q8_0,
    GGMLQuantType.Q8_1: dequantize_q8_1,
    GGMLQuantType.Q2_K: dequantize_q2_k,
    GGMLQuantType.Q3_K: dequantize_q3_k,
    GGMLQuantType.Q4_K: dequantize_q4_k,
    GGMLQuantType.Q5_K: dequantize_q5_k,
    GGMLQuantType.Q6_K: dequantize_q6_k,
    GGMLQuantType.Q8_K: dequantize_q8_k,
}

from llama_kotlin_tpu.quant.iq import IQ_DEQUANT  # noqa: E402 (grids load lazily)

_DEQUANT.update(IQ_DEQUANT)

_QUANT = {
    GGMLQuantType.Q4_0: quantize_q4_0,
    GGMLQuantType.Q4_1: quantize_q4_1,
    GGMLQuantType.Q5_0: quantize_q5_0,
    GGMLQuantType.Q5_1: quantize_q5_1,
    GGMLQuantType.Q8_0: quantize_q8_0,
    GGMLQuantType.Q8_1: quantize_q8_1,
    GGMLQuantType.Q2_K: quantize_q2_k,
    GGMLQuantType.Q3_K: quantize_q3_k,
    GGMLQuantType.Q4_K: quantize_q4_k,
    GGMLQuantType.Q5_K: quantize_q5_k,
    GGMLQuantType.Q6_K: quantize_q6_k,
    GGMLQuantType.Q8_K: quantize_q8_k,
}

from llama_kotlin_tpu.quant.iq import IQ_QUANT  # noqa: E402

_QUANT.update(IQ_QUANT)


def supported_types() -> list[GGMLQuantType]:
    return sorted(_DEQUANT.keys())


def dequantize(data: np.ndarray, qtype: GGMLQuantType, shape: tuple[int, ...] | None = None) -> np.ndarray:
    """Decode a wire-format uint8 buffer to float32.

    If `shape` is given the result is reshaped to it (innermost dim must be
    a multiple of the block size).
    """
    if qtype == GGMLQuantType.F32:
        y = np.ascontiguousarray(data, np.uint8).reshape(-1).view("<f4").astype(np.float32)
    elif qtype == GGMLQuantType.F16:
        y = np.ascontiguousarray(data, np.uint8).reshape(-1).view("<f2").astype(np.float32)
    elif qtype == GGMLQuantType.BF16:
        raw = np.ascontiguousarray(data, np.uint8).reshape(-1).view("<u2").astype(np.uint32) << 16
        y = raw.view(np.float32).copy()
    elif qtype in _DEQUANT:
        y = _DEQUANT[qtype](data).reshape(-1)
    else:
        raise NotImplementedError(f"dequantize not implemented for {qtype!r}")
    return y.reshape(shape) if shape is not None else y


_NATIVE_KQ_TAG = {
    GGMLQuantType.Q2_K: 2, GGMLQuantType.Q3_K: 3, GGMLQuantType.Q4_K: 4,
    GGMLQuantType.Q5_K: 5, GGMLQuantType.Q6_K: 6,
}


def _native_kquant(x: np.ndarray, qtype: GGMLQuantType):
    """Threaded C++ K-quant encoder (native/kquant_encode.cpp): same search
    semantics as the numpy encoders below, ~100x faster (the numpy ALS is
    temporary-bound).  Returns None when the toolchain is unavailable."""
    import os

    from llama_kotlin_tpu.native import get_native

    lib = get_native()
    if lib is None or not hasattr(lib, "lk_encode_kquant"):
        return None
    xf = np.ascontiguousarray(x, np.float32).reshape(-1)
    if xf.size % QK_K != 0:
        return None
    n_sb = xf.size // QK_K
    bytes_per = TYPE_TRAITS[qtype].type_size
    out = np.empty(n_sb * bytes_per, np.uint8)
    nt = min(os.cpu_count() or 1, 16)
    got = lib.lk_encode_kquant(_NATIVE_KQ_TAG[qtype], xf.ctypes.data,
                               out.ctypes.data, n_sb, nt)
    return out if got == bytes_per else None


def _native_iq4(x: np.ndarray, qtype: GGMLQuantType):
    """Threaded C++ IQ4 encoders (nearest non-linear level)."""
    import os

    from llama_kotlin_tpu.native import get_native

    lib = get_native()
    if lib is None or not hasattr(lib, "lk_encode_iq4"):
        return None
    tag = 0 if qtype == GGMLQuantType.IQ4_NL else 1
    elems = 32 if tag == 0 else QK_K
    xf = np.ascontiguousarray(x, np.float32).reshape(-1)
    if xf.size % elems != 0:
        return None
    n_blk = xf.size // elems
    bytes_per = TYPE_TRAITS[qtype].type_size
    out = np.empty(n_blk * bytes_per, np.uint8)
    nt = min(os.cpu_count() or 1, 16)
    got = lib.lk_encode_iq4(tag, xf.ctypes.data, out.ctypes.data, n_blk, nt)
    return out if got == bytes_per else None


_QW_QUANT_NAMES = ("quantize_q2_k", "quantize_q3_k", "quantize_q4_k",
                   "quantize_q5_k", "quantize_q6_k")


def quantize(x: np.ndarray, qtype: GGMLQuantType,
             qw: np.ndarray | None = None) -> np.ndarray:
    """Encode float32 data to the wire format, returning a flat uint8 array.

    qw: optional per-column importance weights (imatrix, tools/imatrix.py)
    for the K-quant encoders — the reference's quant_weights argument
    (ggml_quantize_chunk).  Weighted encoding takes the numpy path (the
    native encoders are unweighted)."""
    if qw is not None and qtype in _QUANT \
            and _QUANT[qtype].__name__ in _QW_QUANT_NAMES:
        xf = np.ascontiguousarray(x, np.float32)
        # per-column weights broadcast over rows (reference quant_weights
        # are per-column of the 2-D tensor)
        qw_full = np.ascontiguousarray(
            np.broadcast_to(np.asarray(qw, np.float32), xf.shape), np.float32)
        return _QUANT[qtype](xf, qw=qw_full)
    if qtype in _NATIVE_KQ_TAG:
        out = _native_kquant(x, qtype)
        if out is not None:
            return out
    if qtype in (GGMLQuantType.IQ4_NL, GGMLQuantType.IQ4_XS):
        out = _native_iq4(x, qtype)
        if out is not None:
            return out
    if qtype == GGMLQuantType.F32:
        return np.ascontiguousarray(x, "<f4").view(np.uint8).reshape(-1)
    if qtype == GGMLQuantType.F16:
        return np.ascontiguousarray(x, "<f2").view(np.uint8).reshape(-1)
    if qtype == GGMLQuantType.BF16:
        u = np.ascontiguousarray(x, "<f4").view(np.uint32)
        # round-to-nearest-even like ggml_compute_fp32_to_bf16
        rounded = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype("<u2")
        return rounded.view(np.uint8).reshape(-1)
    from llama_kotlin_tpu.quant.iq_encode import IQ_ENCODERS

    if qtype in IQ_ENCODERS:
        xf = np.ascontiguousarray(x, np.float32)
        xf = xf.reshape(1, -1) if xf.ndim == 1 else xf.reshape(-1, xf.shape[-1])
        qww = None if qw is None else np.asarray(qw, np.float32)
        return IQ_ENCODERS[qtype](xf, qw=qww).reshape(-1)
    if qtype in _QUANT:
        return _QUANT[qtype](np.ascontiguousarray(x, np.float32))
    raise NotImplementedError(f"quantize not implemented for {qtype!r}")


def roundtrip(x: np.ndarray, qtype: GGMLQuantType) -> np.ndarray:
    """quantize then dequantize, preserving the input shape."""
    return dequantize(quantize(x, qtype), qtype, shape=x.shape)
