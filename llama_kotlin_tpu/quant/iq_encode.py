"""IQ2/IQ3 codebook ENCODERS (imatrix-weighted grid search).

The IQ formats quantize 8- or 4-element units onto small trained codebooks
(grids shipped in iq_grids.npz — wire constants shared with the decoders in
quant/iq.py; block layouts cf. reference ggml-common.h:322-399 and the
quantize_iq2_* entry points in ggml/src/ggml-quants.c).  The reference's
encoders are scalar C with per-block iterative refinement; this is an
independent vectorized-numpy design with the same structure of decisions:

  1. SIGNS: the xxs/xs flavors store signs as a 7-bit index into the
     parity-completed ksigns table, so only EVEN-parity sign patterns
     per 8 elements are representable.  Odd-parity patterns flip the
     sign of the element with the smallest weighted magnitude (cheapest
     error) — see _parity_fix_signs.
  2. MAGNITUDES: per unit (8 or 4 |x| values) pick the codebook row
     minimizing the weighted error against lambda * grid — evaluated for
     ALL units x ALL rows as two matmuls:
         err = const - 2*lambda*(w.a)@G^T + lambda^2 * w@(G*G)^T
  3. SCALES: per scale-group (16 or 32 elems) the optimal lambda is the
     weighted least-squares fit  sum(w.a.g)/sum(w.g.g);  2-3 alternation
     rounds between (2) and (3), then the block super-scale d is chosen
     so group scales land on the wire's odd-integer code points (2h+1),
     and units are re-picked once under the quantized scales.

Weights w default to x^2 + eps (the reference's sigma2-based default when
no imatrix is given); pass per-row imatrix weights for the real flow.
Quality matches the reference class (ordering-validated in the ladder,
tools/quant_quality.py) without reproducing its exact search heuristics.
"""

from __future__ import annotations

import numpy as np

from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS
from llama_kotlin_tpu.quant.iq import QK_K, _grid, _signs

_F32 = np.float32


def _f16_round(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).astype(np.float32)


def _grid_mag(name: str, unit: int) -> np.ndarray:
    """Codebook magnitudes [G, unit] f32 (uint8 byte view)."""
    return _grid(name).view(np.uint8).reshape(-1, unit).astype(np.float32)


def _parity_fix_signs(x: np.ndarray, w: np.ndarray):
    """Per-8 sign handling for the ksigns formats: return (a, sidx) where
    a = |x| with the parity-fix flip applied (the flipped element enters
    the magnitude fit negated) and sidx [N] is the 7-bit ksigns index.

    ksigns[i] has sign bits = bits of i with bit 7 a parity-completion bit,
    so exactly the EVEN-parity patterns (even count of minus signs) are
    representable; odd-parity rows flip the element with the smallest
    w*x^2 (cheapest error)."""
    neg = (x < 0)
    odd = (neg.sum(axis=1) & 1) == 1
    cost = w * x * x
    flip_at = np.argmin(cost, axis=1)
    rows = np.nonzero(odd)[0]
    neg[rows, flip_at[rows]] ^= True
    a = np.abs(x).astype(np.float32)
    # the flipped element's decoded sign is opposite x's: it contributes
    # -|x| to the magnitude fit target
    a[rows, flip_at[rows]] *= -1.0
    bits = neg.astype(np.uint8)
    sidx = np.zeros(x.shape[0], np.uint32)
    for j in range(7):
        sidx |= bits[:, j].astype(np.uint32) << j
    return a, sidx


def _fit_units(a, w, grid, lam, gsz_units):
    """Pick, for every unit row, the codebook row minimizing the weighted
    error vs lam * grid.  a/w [N, U]; grid [G, U]; lam per scale-group
    [N // gsz_units].  Returns (idx [N], gvals [N, U])."""
    lam_u = np.repeat(lam, gsz_units)[:, None]  # [N, 1]
    wa = (w * a) @ grid.T          # [N, G]
    wg = w @ (grid * grid).T       # [N, G]
    idx = np.argmin(lam_u * lam_u * wg - 2.0 * lam_u * wa, axis=1)
    return idx, grid[idx]


def _fit_scales(a, w, gvals, gsz_units):
    """Weighted LS scale per scale-group: sum(w a g) / sum(w g g)."""
    num = (w * a * gvals).reshape(-1, gsz_units * a.shape[1]).sum(axis=1)
    den = (w * gvals * gvals).reshape(-1, gsz_units * a.shape[1]).sum(axis=1)
    return np.where(den > 0, num / np.maximum(den, 1e-30), 0.0)


def _alternate(a, w, grid, gsz_units, iters=3):
    """Alternating unit-pick / scale-fit; returns (idx, gvals, lam)."""
    n_groups = a.shape[0] // gsz_units
    amax = np.abs(a).reshape(n_groups, -1).max(axis=1)
    gmax = grid.max()
    lam = np.where(amax > 0, amax / gmax, 0.0)
    idx = gvals = None
    for _ in range(iters):
        idx, gvals = _fit_units(a, w, grid, lam, gsz_units)
        lam = _fit_scales(a, w, gvals, gsz_units)
    return idx, gvals, lam


def _quantize_block_scales(lam, scale_max_code, store_mult):
    """lam [nb, G] -> (d_store [nb], d_eff [nb], h [nb, G]) with
    lam ~= d_eff * (2h+1), h in [0, scale_max_code], and d_store the
    f16 value actually written to the wire (d_eff = d_store/store_mult —
    quantizing the STORED value avoids a second rounding at decode)."""
    top = 2 * scale_max_code + 1
    lmax = lam.max(axis=1)
    d_store = _f16_round(np.where(lmax > 0, lmax * store_mult / top, 0.0))
    d_eff = d_store / store_mult
    with np.errstate(divide="ignore", invalid="ignore"):
        h = np.round((lam / np.maximum(d_eff[:, None], 1e-30) - 1.0) / 2.0)
    h = np.clip(np.nan_to_num(h), 0, scale_max_code).astype(np.uint32)
    return d_store, d_eff, h


def _weights(x: np.ndarray, qw: np.ndarray | None) -> np.ndarray:
    """Per-element weights: imatrix row (importance) scaled by a sigma
    term, or the x^2-based default (cf. the reference's use of sqrt(sigma2
    + x^2) weighting)."""
    sigma2 = np.mean(x * x, axis=-1, keepdims=True)
    base = np.sqrt(sigma2 + x * x)
    if qw is not None:
        return (qw * base).astype(np.float32)
    return base.astype(np.float32)


def _encode_ksigns8(x_rows: np.ndarray, qw: np.ndarray | None,
                    grid_name: str, n_idx_bits: int,
                    scale_group: int, scale_max_code: int):
    """Shared core for the 8-element-unit ksigns formats (IQ2_XXS/XS).

    Returns per block: d_store [nb] (the f16 wire value), gidx [nb, 32]
    codebook indices, sidx [nb, 32] 7-bit sign indices,
    h [nb, 256//scale_group] scale codes.
    """
    xb = x_rows.reshape(-1, QK_K)
    nb = xb.shape[0]
    w = _weights(xb, qw).reshape(-1, 8)
    xu = xb.reshape(-1, 8)
    grid = _grid_mag(grid_name, 8)
    a, sidx = _parity_fix_signs(xu, w)
    gsz_units = scale_group // 8
    idx, gvals, lam = _alternate(a, w, grid, gsz_units)
    lam_b = lam.reshape(nb, -1)
    # wire stores d*8 (split folds the 1/8 back); quantize the STORED f16
    d_store, d_eff, h = _quantize_block_scales(lam_b, scale_max_code, 8.0)
    # one re-pick under the quantized scales (the wire's actual multiplier)
    lam_q = (d_eff[:, None] * (2.0 * h + 1.0)).reshape(-1)
    idx, _ = _fit_units(a, w, grid, lam_q, gsz_units)
    return d_store, idx.reshape(nb, 32), sidx.reshape(nb, 32), h


def quantize_iq2_xxs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """float rows [n, k] -> IQ2_XXS wire bytes.  Layout (iq.py
    _split_iq2_xxs): f16 d, then per 32-group 4 grid-index bytes + u32
    aux = 4x7-bit sign idx | 4-bit scale."""
    n, k = x.shape
    assert k % QK_K == 0
    qw2 = None if qw is None else np.broadcast_to(qw, x.shape).reshape(-1, QK_K)
    dd, gidx, sidx, h = _encode_ksigns8(
        x.astype(np.float32), qw2, "iq2xxs_grid", 8, 32, 15)
    nb = gidx.shape[0]
    out = np.zeros((nb, TYPE_TRAITS[GGMLQuantType.IQ2_XXS].type_size), np.uint8)
    out[:, 0:2] = dd.astype(np.float16)[:, None].view(np.uint8)
    g4 = gidx.reshape(nb, 8, 4).astype(np.uint8)
    s4 = sidx.reshape(nb, 8, 4).astype(np.uint32)
    aux = (s4[:, :, 0] | (s4[:, :, 1] << 7) | (s4[:, :, 2] << 14)
           | (s4[:, :, 3] << 21) | (h.astype(np.uint32) << 28))
    q = np.zeros((nb, 8, 8), np.uint8)
    q[:, :, 0:4] = g4
    q[:, :, 4:8] = aux.astype("<u4")[:, :, None].view(np.uint8)
    out[:, 2:66] = q.reshape(nb, 64)
    return out.reshape(n, -1)


def quantize_iq2_xs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """float rows -> IQ2_XS wire bytes: per 32-group 4 u16 (9-bit grid idx
    | 7-bit sign idx), then 8 scale bytes (two 4-bit codes per byte,
    per-16 scale groups)."""
    n, k = x.shape
    assert k % QK_K == 0
    qw2 = None if qw is None else np.broadcast_to(qw, x.shape).reshape(-1, QK_K)
    dd, gidx, sidx, h = _encode_ksigns8(
        x.astype(np.float32), qw2, "iq2xs_grid", 9, 16, 15)
    nb = gidx.shape[0]
    out = np.zeros((nb, TYPE_TRAITS[GGMLQuantType.IQ2_XS].type_size), np.uint8)
    out[:, 0:2] = dd.astype(np.float16)[:, None].view(np.uint8)
    words = (gidx.astype(np.uint32) | (sidx.astype(np.uint32) << 9))
    out[:, 2:66] = words.astype("<u2").view(np.uint8).reshape(nb, 64)
    hh = h.reshape(nb, 8, 2)
    out[:, 66:74] = (hh[:, :, 0] | (hh[:, :, 1] << 4)).astype(np.uint8)
    return out.reshape(n, -1)


def quantize_iq3_xxs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """float rows -> IQ3_XXS wire bytes: per 32-group 8 grid4-index bytes,
    then u32 aux = 4x7-bit sign idx | 4-bit scale (signs span 8 elems =
    two grid4 quads)."""
    n, k = x.shape
    assert k % QK_K == 0
    xb = x.astype(np.float32).reshape(-1, QK_K)
    nb = xb.shape[0]
    qw2 = None if qw is None else np.broadcast_to(qw, x.shape).reshape(-1, QK_K)
    w = _weights(xb, qw2)
    x8 = xb.reshape(-1, 8)
    w8 = w.reshape(-1, 8)
    a8, sidx = _parity_fix_signs(x8, w8)
    grid = _grid_mag("iq3xxs_grid", 4)
    a4, w4 = a8.reshape(-1, 4), w8.reshape(-1, 4)
    idx, gvals, lam = _alternate(a4, w4, grid, 8)  # scale group = 32 = 8 quads
    lam_b = lam.reshape(nb, 8)
    # wire: value = (d/4) * (2h+1) * grid; split folds 0.25 into sb
    dd, d_eff, h = _quantize_block_scales(lam_b, 15, 4.0)
    lam_q = (d_eff[:, None] * (2.0 * h + 1.0)).reshape(-1)
    idx, _ = _fit_units(a4, w4, grid, lam_q, 8)
    out = np.zeros((nb, TYPE_TRAITS[GGMLQuantType.IQ3_XXS].type_size), np.uint8)
    out[:, 0:2] = dd.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:66] = idx.reshape(nb, 64).astype(np.uint8)
    s4 = sidx.reshape(nb, 8, 4).astype(np.uint32)
    aux = (s4[:, :, 0] | (s4[:, :, 1] << 7) | (s4[:, :, 2] << 14)
           | (s4[:, :, 3] << 21) | (h.astype(np.uint32) << 28))
    out[:, 66:98] = aux.astype("<u4").view(np.uint8).reshape(nb, 32)
    return out.reshape(n, -1)


def quantize_iq3_s(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """float rows -> IQ3_S wire bytes: 512-entry grid4, FULL byte signs
    (no parity constraint), per-32 4-bit scales (1+2ls), f16 d direct."""
    n, k = x.shape
    assert k % QK_K == 0
    xb = x.astype(np.float32).reshape(-1, QK_K)
    nb = xb.shape[0]
    qw2 = None if qw is None else np.broadcast_to(qw, x.shape).reshape(-1, QK_K)
    w = _weights(xb, qw2)
    neg = (xb < 0).reshape(-1, 8).astype(np.uint8)
    sbytes = np.zeros(neg.shape[0], np.uint8)
    for j in range(8):
        sbytes |= neg[:, j] << j
    a4 = np.abs(xb).reshape(-1, 4)
    w4 = w.reshape(-1, 4)
    grid = _grid_mag("iq3s_grid", 4)
    idx, gvals, lam = _alternate(a4, w4, grid, 8)
    lam_b = lam.reshape(nb, 8)
    dd, d_eff, h = _quantize_block_scales(lam_b, 15, 1.0)
    lam_q = (d_eff[:, None] * (2.0 * h + 1.0)).reshape(-1)
    idx, _ = _fit_units(a4, w4, grid, lam_q, 8)
    out = np.zeros((nb, TYPE_TRAITS[GGMLQuantType.IQ3_S].type_size), np.uint8)
    out[:, 0:2] = dd.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:66] = (idx & 0xFF).reshape(nb, 64).astype(np.uint8)
    # high bit of each of the 8 grid bytes per group rides qh bit m
    hi = (idx >> 8).reshape(nb, 8, 8).astype(np.uint32)
    qh = np.zeros((nb, 8), np.uint32)
    for m in range(8):
        qh |= hi[:, :, m] << m
    out[:, 66:74] = qh.astype(np.uint8)
    out[:, 74:106] = sbytes.reshape(nb, 32)
    hh = h.reshape(nb, 4, 2)
    out[:, 106:110] = (hh[:, :, 0] | (hh[:, :, 1] << 4)).astype(np.uint8)
    return out.reshape(n, -1)


IQ_ENCODERS = {
    GGMLQuantType.IQ2_XXS: quantize_iq2_xxs,
    GGMLQuantType.IQ2_XS: quantize_iq2_xs,
    GGMLQuantType.IQ3_XXS: quantize_iq3_xxs,
    GGMLQuantType.IQ3_S: quantize_iq3_s,
}
