"""IQ-quant (codebook) wire-format decoders and code/scale splitters.

Parity targets: dequantize_row_iq2_xxs/iq2_xs/iq2_s/iq3_xxs/iq3_s/
iq1_s/iq1_m/iq4_nl/iq4_xs (reference ggml/src/ggml-quants.c:3311-3590);
block layouts from ggml-common.h:322-399.

The trained codebook grids ship as quant/iq_grids.npz, extracted from the
reference's ggml-common.h tables by scripts/extract_iq_grids.py — they are
wire-format constants every compatible decoder must share.  The ksigns
table is derived (index with odd-parity bit 7), kvalues_iq4nl is the
published 16-entry non-linear level table.

Every format is factored as

    value = sb_scale * g_scale * code

with int8 ``code`` (grids are small ints; signs are exact flips; the IQ1
±0.125 delta folds in as code = 8*grid ± 1 under sb = d/8), small-int
``g_scale`` (2h+1 / 1+2ls / ls-32 style), and an f32 per-block super scale.
Every partial product carries <= 24 significand bits, so f32 evaluation is
EXACT in any association order — the split decoders below, the repacked
QTensor dequantization (quant/repack.py), and the reference's own f32
chain all produce bit-identical floats.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS

QK_K = 256
IQ1S_DELTA = 0.125

KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    np.int8,
)

_grids: dict[str, np.ndarray] = {}


def _grid(name: str) -> np.ndarray:
    if not _grids:
        with np.load(Path(__file__).parent / "iq_grids.npz") as z:
            for k in z.files:
                _grids[k] = z[k]
    return _grids[name]


def _grid8(name: str, signed: bool = False) -> np.ndarray:
    """u64 table -> [n, 8] per-element values (little-endian byte order)."""
    g = _grid(name).view(np.int8 if signed else np.uint8).reshape(-1, 8)
    return g.astype(np.float32)


def _grid4(name: str) -> np.ndarray:
    """u32 table -> [n, 4] per-element values."""
    return _grid(name).view(np.uint8).reshape(-1, 4).astype(np.float32)


def _signs128() -> np.ndarray:
    """[128, 8] ±1 factors: ksigns_iq2xs[i] bit j (bit 7 = odd parity)."""
    idx = np.arange(128, dtype=np.uint8)
    bits = np.unpackbits(idx[:, None], axis=1, bitorder="little")  # [128, 8]
    parity = bits.sum(axis=1) & 1
    ks = bits.copy()
    ks[:, 7] = parity  # odd-parity completion bit
    return np.where(ks != 0, -1.0, 1.0).astype(np.float32)


_SIGNS = None


def _signs() -> np.ndarray:
    global _SIGNS
    if _SIGNS is None:
        _SIGNS = _signs128()
    return _SIGNS


def _byte_signs(b: np.ndarray) -> np.ndarray:
    """uint8 sign bytes [...]->[..., 8] ±1 factors (bit j = sign of elem j)."""
    bits = np.unpackbits(b[..., None].astype(np.uint8), axis=-1, bitorder="little")
    return np.where(bits != 0, -1.0, 1.0).astype(np.float32)


def _blocks(data: np.ndarray, qtype: GGMLQuantType) -> np.ndarray:
    ts = TYPE_TRAITS[qtype].type_size
    return np.ascontiguousarray(data, np.uint8).reshape(-1, ts)


def _f16(b: np.ndarray) -> np.ndarray:
    return b.copy().view("<f2").astype(np.float32)


# -- split decoders ----------------------------------------------------------
# Each returns (codes int8 [nb, block_size], g_scale u8/i8/f32 [nb, groups],
# sb_scale f32 [nb, 1] or None, group_size).


def _split_iq2_xxs(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2])  # [nb, 1]
    q = b[:, 2:66].reshape(nb, 8, 8)  # per 32-elem group: 8 bytes
    gidx = q[:, :, 0:4].astype(np.int64)  # grid indices
    aux = q[:, :, 4:8].copy().view("<u4")[..., 0].astype(np.uint32)  # [nb, 8]
    l = np.arange(4)
    sidx = (aux[..., None] >> (7 * l)) & 127  # [nb, 8, 4]
    vals = _grid8("iq2xxs_grid")[gidx] * _signs()[sidx]  # [nb, 8, 4, 8]
    codes = vals.reshape(nb, QK_K).astype(np.int8)
    # d * (0.5 + h) * 0.25  ==  (d/8) * (2h+1)
    g = (2 * (aux >> 28) + 1).astype(np.uint8)  # [nb, 8]
    return codes, g, (d * 0.125).astype(np.float32), 32


def _split_iq2_xs(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].copy().view("<u2").reshape(nb, 8, 4).astype(np.uint32)
    scales = b[:, 66:74]  # [nb, 8]; low nibble scales elems 0-15, high 16-31
    vals = _grid8("iq2xs_grid")[(qs & 511).astype(np.int64)] * _signs()[qs >> 9]
    codes = vals.reshape(nb, QK_K).astype(np.int8)
    ls = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.uint16)
    g = (2 * ls + 1).astype(np.uint8).reshape(nb, 16)  # per-16 groups
    return codes, g, (d * 0.125).astype(np.float32), 16


def _split_iq2_s(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(nb, 8, 4).astype(np.uint32)
    signs = b[:, 34:66].reshape(nb, 8, 4)
    qh = b[:, 66:74].astype(np.uint32)  # [nb, 8]
    scales = b[:, 74:82]
    l = np.arange(4)
    gidx = qs | ((qh[:, :, None] << (8 - 2 * l)) & 0x300)
    vals = _grid8("iq2s_grid")[gidx.astype(np.int64)] * _byte_signs(signs)
    codes = vals.reshape(nb, QK_K).astype(np.int8)
    ls = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.uint16)
    g = (2 * ls + 1).astype(np.uint8).reshape(nb, 16)
    return codes, g, (d * 0.125).astype(np.float32), 16


def _split_iq3_xxs(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(nb, 8, 8).astype(np.int64)  # 8 grid4 idx per group
    aux = b[:, 66:98].copy().view("<u4").reshape(nb, 8).astype(np.uint32)
    l = np.arange(4)
    sidx = (aux[..., None] >> (7 * l)) & 127  # [nb, 8, 4] -> signs for 8 elems
    s = _signs()[sidx].reshape(nb, 8, 4, 2, 4)  # split into two grid4 halves
    gq = _grid4("iq3xxs_grid")[qs].reshape(nb, 8, 4, 2, 4)
    codes = (gq * s).reshape(nb, QK_K).astype(np.int8)
    # d * (0.5 + h) * 0.5  ==  (d/4) * (2h+1)
    g = (2 * (aux >> 28) + 1).astype(np.uint8)
    return codes, g, (d * 0.25).astype(np.float32), 32


def _split_iq3_s(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:66].reshape(nb, 8, 8).astype(np.uint32)
    qh = b[:, 66:74].astype(np.uint32)  # [nb, 8] high bits, bit m for byte m
    signs = b[:, 74:106].reshape(nb, 8, 4)
    scales = b[:, 106:110]  # [nb, 4] nibble per 32-group
    m = np.arange(8)
    gidx = qs | (((qh[:, :, None] >> m) & 1) << 8)
    s = _byte_signs(signs).reshape(nb, 8, 4, 2, 4)
    gq = _grid4("iq3s_grid")[gidx.astype(np.int64)].reshape(nb, 8, 4, 2, 4)
    codes = (gq * s).reshape(nb, QK_K).astype(np.int8)
    ls = np.stack([scales & 0xF, scales >> 4], axis=-1).astype(np.uint16)
    g = (1 + 2 * ls).astype(np.uint8).reshape(nb, 8)  # per-32 groups
    return codes, g, d.astype(np.float32), 32


def _split_iq1_s(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2])
    qs = b[:, 2:34].reshape(nb, 8, 4).astype(np.uint32)
    qh = b[:, 34:50].copy().view("<u2").reshape(nb, 8).astype(np.uint32)
    # dl * (grid + ±0.125)  ==  (d/8) * (2s+1) * (8*grid ± 1)
    g = (2 * ((qh >> 12) & 7) + 1).astype(np.uint8)  # [nb, 8]
    sgn = np.where(qh & 0x8000, -1, 1).astype(np.int16)  # per-32 delta sign
    l = np.arange(4)
    gidx = qs | (((qh[:, :, None] >> (3 * l)) & 7) << 8)
    gr = _grid8("iq1s_grid", signed=True)[gidx.astype(np.int64)]  # [nb, 8, 4, 8]
    codes = (8 * gr + sgn[:, :, None, None]).reshape(nb, QK_K).astype(np.int8)
    return codes, g, (d * 0.125).astype(np.float32), 32


def _split_iq1_m(b: np.ndarray):
    nb = b.shape[0]
    qs = b[:, 0:32].reshape(nb, 8, 4).astype(np.uint32)
    qh = b[:, 32:48].reshape(nb, 8, 2).astype(np.uint32)
    sc = b[:, 48:56].copy().view("<u2").reshape(nb, 4).astype(np.uint32)
    # the f16 super-scale hides in the top nibbles of the 4 scale words
    du16 = ((sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0)
            | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)).astype("<u2")
    d = du16.view("<f2").astype(np.float32)[:, None]  # [nb, 1]
    ib = np.arange(8)
    s1 = (sc[:, ib // 2] >> (6 * (ib % 2))) & 7  # scales elems 0-15 of chunk
    s2 = (sc[:, ib // 2] >> (6 * (ib % 2) + 3)) & 7  # elems 16-31
    g = (2 * np.stack([s1, s2], axis=-1) + 1).astype(np.uint8).reshape(nb, 16)
    idx = np.stack([
        qs[:, :, 0] | ((qh[:, :, 0] << 8) & 0x700),
        qs[:, :, 1] | ((qh[:, :, 0] << 4) & 0x700),
        qs[:, :, 2] | ((qh[:, :, 1] << 8) & 0x700),
        qs[:, :, 3] | ((qh[:, :, 1] << 4) & 0x700),
    ], axis=-1)  # [nb, 8, 4]
    sgn = np.where(np.stack([
        qh[:, :, 0] & 0x08, qh[:, :, 0] & 0x80,
        qh[:, :, 1] & 0x08, qh[:, :, 1] & 0x80,
    ], axis=-1) != 0, -1, 1).astype(np.int16)  # per-8 delta sign
    gr = _grid8("iq1s_grid", signed=True)[idx.astype(np.int64)]  # [nb, 8, 4, 8]
    codes = (8 * gr + sgn[:, :, :, None]).reshape(nb, QK_K).astype(np.int8)
    return codes, g, (d * 0.125).astype(np.float32), 16


def _split_iq4_nl(b: np.ndarray):
    d = _f16(b[:, 0:2]).astype(np.float32)  # [nb, 1] — one-level f32 scale
    qs = b[:, 2:18]
    lo = KVALUES_IQ4NL[(qs & 0xF).astype(np.int64)]
    hi = KVALUES_IQ4NL[(qs >> 4).astype(np.int64)]
    codes = np.concatenate([lo, hi], axis=1)  # int8 [nb, 32]
    return codes, d, None, 32


def _split_iq4_xs(b: np.ndarray):
    nb = b.shape[0]
    d = _f16(b[:, 0:2]).astype(np.float32)
    scales_h = b[:, 2:4].copy().view("<u2").astype(np.uint32)  # [nb, 1]
    scales_l = b[:, 4:8].astype(np.uint32)  # [nb, 4]
    qs = b[:, 8:136].reshape(nb, 8, 16)
    ib = np.arange(8)
    ls = (((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0xF)
          | (((scales_h >> (2 * ib)) & 3) << 4))
    g = (ls.astype(np.int16) - 32).astype(np.int8)  # [nb, 8]
    lo = KVALUES_IQ4NL[(qs & 0xF).astype(np.int64)]  # [nb, 8, 16]
    hi = KVALUES_IQ4NL[(qs >> 4).astype(np.int64)]
    codes = np.concatenate([lo, hi], axis=2).reshape(nb, QK_K)
    return codes, g, d, 32


IQ_SPLIT = {
    GGMLQuantType.IQ2_XXS: _split_iq2_xxs,
    GGMLQuantType.IQ2_XS: _split_iq2_xs,
    GGMLQuantType.IQ2_S: _split_iq2_s,
    GGMLQuantType.IQ3_XXS: _split_iq3_xxs,
    GGMLQuantType.IQ3_S: _split_iq3_s,
    GGMLQuantType.IQ1_S: _split_iq1_s,
    GGMLQuantType.IQ1_M: _split_iq1_m,
    GGMLQuantType.IQ4_NL: _split_iq4_nl,
    GGMLQuantType.IQ4_XS: _split_iq4_xs,
}


def iq_split(data: np.ndarray, qtype: GGMLQuantType):
    """Wire bytes -> (codes i8 [nb, bs], g_scale [nb, G], sb_scale [nb, 1]
    or None, group_size).  See module docstring for the exactness argument."""
    return IQ_SPLIT[qtype](_blocks(data, qtype))


def _dequant_via_split(data: np.ndarray, qtype: GGMLQuantType) -> np.ndarray:
    codes, g, sb, gs = iq_split(data, qtype)
    eff = g.astype(np.float32)
    if sb is not None:
        eff = eff * sb  # exact (<=17 significand bits)
    return np.repeat(eff, gs, axis=1) * codes.astype(np.float32)


def dequantize_iq2_xxs(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ2_XXS)


def dequantize_iq2_xs(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ2_XS)


def dequantize_iq2_s(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ2_S)


def dequantize_iq3_xxs(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ3_XXS)


def dequantize_iq3_s(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ3_S)


def dequantize_iq1_s(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ1_S)


def dequantize_iq1_m(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ1_M)


def dequantize_iq4_nl(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ4_NL)


def dequantize_iq4_xs(data: np.ndarray) -> np.ndarray:
    return _dequant_via_split(data, GGMLQuantType.IQ4_XS)


# -- simple encoders (decode-compatible; the reference's scale search is a
# quality refinement, not a format requirement) -------------------------------


def quantize_iq4_nl(x: np.ndarray) -> np.ndarray:
    """float -> block_iq4_nl wire (nearest non-linear level, d = amax/max|k|)."""
    x = np.ascontiguousarray(x, np.float32).reshape(-1, 32)
    nb = x.shape[0]
    d = np.abs(x).max(axis=1, keepdims=True) / 127.0
    dd = np.where(d == 0, 1.0, d)  # divisor only: zero blocks keep d=0 on
    # the wire so they decode to zeros (and match the native encoder)
    k = KVALUES_IQ4NL.astype(np.float32)
    idx = np.abs(x[:, :, None] / dd[:, :, None] - k).argmin(axis=2).astype(np.uint8)
    out = np.zeros((nb, 18), np.uint8)
    out[:, 0:2] = d.astype(np.float32).astype("<f2").view(np.uint8)
    out[:, 2:18] = idx[:, 0:16] | (idx[:, 16:32] << 4)
    return out.reshape(-1)


def quantize_iq4_xs(x: np.ndarray) -> np.ndarray:
    """float -> block_iq4_xs wire (per-32 6-bit sub-scales over the NL grid)."""
    x = np.ascontiguousarray(x, np.float32).reshape(-1, 8, 32)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=2)  # [nb, 8]
    dg = amax / 127.0
    d = dg.max(axis=1, keepdims=True) / 31.0
    dd = np.where(d == 0, 1.0, d)  # divisor only (see iq4_nl note)
    ls = np.clip(np.rint(dg / dd), 1, 31).astype(np.int32) + 32  # stored 0..63
    dl = dd * (ls - 32)
    k = KVALUES_IQ4NL.astype(np.float32)
    idx = np.abs(x[..., None] / dl[..., None, None] - k).argmin(axis=3).astype(np.uint8)
    out = np.zeros((nb, 136), np.uint8)
    out[:, 0:2] = d.astype(np.float32).astype("<f2").view(np.uint8)
    sh = np.zeros(nb, np.uint32)
    for i in range(8):
        sh |= ((ls[:, i].astype(np.uint32) >> 4) & 3) << (2 * i)
    out[:, 2:4] = sh.astype("<u2").view(np.uint8).reshape(nb, 2)
    sl = (ls[:, 0::2] & 0xF) | ((ls[:, 1::2] & 0xF) << 4)
    out[:, 4:8] = sl.astype(np.uint8)
    out[:, 8:136] = (idx[:, :, 0:16] | (idx[:, :, 16:32] << 4)).reshape(nb, 128)
    return out.reshape(-1)


IQ_QUANT = {
    GGMLQuantType.IQ4_NL: quantize_iq4_nl,
    GGMLQuantType.IQ4_XS: quantize_iq4_xs,
}

IQ_DEQUANT = {
    GGMLQuantType.IQ2_XXS: dequantize_iq2_xxs,
    GGMLQuantType.IQ2_XS: dequantize_iq2_xs,
    GGMLQuantType.IQ2_S: dequantize_iq2_s,
    GGMLQuantType.IQ3_XXS: dequantize_iq3_xxs,
    GGMLQuantType.IQ3_S: dequantize_iq3_s,
    GGMLQuantType.IQ1_S: dequantize_iq1_s,
    GGMLQuantType.IQ1_M: dequantize_iq1_m,
    GGMLQuantType.IQ4_NL: dequantize_iq4_nl,
    GGMLQuantType.IQ4_XS: dequantize_iq4_xs,
}
