"""W4A8 fast-mode matmul: 4-bit-resident weights, int8 activations, exact
per-32-group scaling — the TPU-native redesign of the reference CPU hot
loop ggml_vec_dot_q4_K_q8_K (ggml/src/ggml-quants.c): W4 weights times
Q8-quantized activations with integer dots and per-group rescale.

Design problem: Q4_K semantics need per-32-element group scales applied to
integer dot partials, but 32-wide MXU dots are ~60x too slow, and
per-element VPU dequantization caps at ~10% of HBM bandwidth (round-1
measurement).  This kernel solves both:

1. Nibble unpacking with ONE byte-wide AND per nibble, no shifts (Mosaic
   has no 8-bit shifts; widening to i32 was the round-1 bottleneck).  The
   W4 packing (quant/fold.py) stores the low nibble raw-unsigned and the
   high nibble pre-signed, so
       lo = byte & 0x0F            -> q_lo          (int8, 0..15)
       hi = byte & 0xF0  (bitcast) -> 16*(q_hi - 8) (int8, exact)
   Both feed the MXU directly; the hi plane's *16 is folded into its
   scale plane, and the lo plane's raw bias is folded into the per-group
   min term (streamed in-kernel via the transposed aux['madj_t'] plane
   against the sx-scaled activation group sums).

2. Per-32-group integer partials from full 512-wide MXU dots, by laying
   the activations out block-diagonally over the MXU's row dimension:
   X_bd[r*b + i, c] = x8[i, c] iff (c//32) % 16 == r, else 0.  A single
   [16b, 512] x [512, bn] int8 dot then yields all 16 groups' partials
   P[(r,i), n] at once — at decode batch b=8 this uses exactly the 128 MXU
   rows that a plain [8, k] dot would waste.  Group scales multiply the
   [16b, bn] partials (per-partial VPU work, 1/32 of per-element), and a
   reshape-sum folds the 16 group rows back down to [b, bn] in f32.

The result is numerically *tighter* than the bf16 dequant paths: integer
dots are exact, scales are bf16-exact by storage, products/accumulation
stay f32.

Layout of operands (prepared by ops/qmatmul.py / quant/fold.py):
- codes   [n, k/2] u8: W4 plane packing (fold_to_w4)
- x_bd_lo / x_bd_hi [16*b, k/2] i8: block-diagonal activations for the lo
  and hi plane column orders (plane column c of span s = element s*256+c%128
  for lo, +128 for hi)
- scw_lo / scw_hi [k/64, n] bf16: per-group scales transposed into plane
  column order (hi includes the /16)
- sxv [k/1024, 16*b] f32: per-chunk activation scales sx[b, superblock]
  broadcast over the block-diagonal row layout
- madj_t [k/32, n] + xg_t [k/32, b]: transposed min plane and sx-scaled
  activation group sums for the in-kernel min term (one [Gblk, b]^T x
  [Gblk, bn] dot per grid step, pipelined with the code stream)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN

CHUNK = 512  # plane columns per block-diagonal dot (16 groups of 32)
NG = CHUNK // 32  # groups per chunk = block-diagonal row blocks


def split_dd(dd: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compact dd_t block [2S', n] (rows 2s = d_s, 2s+1 = dmin_s) ->
    per-plane-group (d_all, dmin_all) [4S', n] f32 via one leading-dim
    reshape + repeat (plane group p of superblock s covers rows 4s..4s+3)."""
    rows, bn = dd.shape
    dd3 = dd.reshape(rows // 2, 2, bn)
    return (jnp.repeat(dd3[:, 0, :], 4, axis=0),
            jnp.repeat(dd3[:, 1, :], 4, axis=0))


def _plan(n: int, kc: int) -> Optional[tuple[int, int]]:
    """(bn, bkc): output rows and plane columns per grid step.

    Tunable via LKTPU_W4_BN / LKTPU_W4_BKC (comma-separated preference
    lists): the per-grid-step VPU chain (scale repeats, partial rescales,
    group-fold) has a fixed issue cost, so larger blocks amortize it —
    round-4 device sweeps pick the defaults."""
    if kc % CHUNK != 0:
        return None
    bns = tuple(int(v) for v in os.environ.get(
        "LKTPU_W4_BN", "512,256,128").split(","))
    bkcs = tuple(int(v) for v in os.environ.get(
        "LKTPU_W4_BKC", "2048,1024,512").split(","))
    for bkc in bkcs:
        if kc % bkc == 0 and bkc % CHUNK == 0:
            for bn in bns:
                if n % bn == 0:
                    return bn, bkc
    return None


def build_xbd(x8: jnp.ndarray, k_pad: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x8 [b, k_pad] int8 (element order) -> block-diagonal lo/hi plane
    arrays [16*b, k_pad/2] int8."""
    b = x8.shape[0]
    spans = k_pad // SPAN
    xr = x8.reshape(b, spans, 2, SPAN // 2)
    planes = (xr[:, :, 0].reshape(b, k_pad // 2),
              xr[:, :, 1].reshape(b, k_pad // 2))
    kc = k_pad // 2
    col_block = (jax.lax.broadcasted_iota(jnp.int32, (NG * b, kc), 1) // 32) % NG
    row_block = jax.lax.broadcasted_iota(jnp.int32, (NG * b, kc), 0) // b
    mask = (col_block == row_block)
    out = []
    for p in planes:
        rep = jnp.broadcast_to(p[None], (NG, b, kc)).reshape(NG * b, kc)
        out.append(jnp.where(mask, rep, jnp.int8(0)))
    return out[0], out[1]


def build_sxv(sx: jnp.ndarray, k_pad: int) -> jnp.ndarray:
    """sx [b, S] f32 -> [k_pad/1024, 16*b]: chunk t, row (r, i) ->
    sx[i, 4*t + r//4] (chunk t's 512 plane columns cover superblocks
    4t..4t+3, 4 row-blocks each)."""
    b = sx.shape[0]
    nch = k_pad // (2 * CHUNK)
    t = np.arange(nch)[:, None, None]          # [nch,1,1]
    r = np.arange(NG)[None, :, None]           # [1,NG,1]
    i = np.arange(b)[None, None, :]            # [1,1,b]
    sb = np.broadcast_to(4 * t + r // 4, (nch, NG, b))
    ii = np.broadcast_to(i, (nch, NG, b))
    return sx[ii.reshape(-1), sb.reshape(-1)].reshape(nch, NG * b)


def build_sxv_ir(sx: jnp.ndarray, k_pad: int) -> jnp.ndarray:
    """build_sxv in (i, r) row order — the fused-x kernel's in-kernel
    jnp.repeat(x8, NG, axis=0) produces batch-major rows, so its per-chunk
    activation scales follow: [k_pad/1024, b*16], row (i*NG + r) ->
    sx[i, 4*t + r//4]."""
    b = sx.shape[0]
    nch = k_pad // (2 * CHUNK)
    t = np.arange(nch)[:, None, None]          # [nch,1,1]
    i = np.arange(b)[None, :, None]            # [1,b,1]
    r = np.arange(NG)[None, None, :]           # [1,1,NG]
    sb = np.broadcast_to(4 * t + r // 4, (nch, b, NG))
    ii = np.broadcast_to(i, (nch, b, NG))
    return sx[ii.reshape(-1), sb.reshape(-1)].reshape(nch, b * NG)


def quantize_activations_2p(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dual-plane activation quantization for the W4X high-fidelity mode:
    x [b, k] f32 -> (x8 [2b, k] i8, sx [2b, S] f32) where plane 0 is the
    standard per-superblock int8 quantization and plane 1 quantizes the
    residual (scale ~ s1/254).  x ~= s1*x1 + s2*x2 with elementwise error
    <= s2/2 ~ 2^-15.8 * amax — far tighter than casting x to bf16
    (2^-9 * |x|), so the W4X matmul dominates the bf16 dequant paths in
    activation fidelity while keeping pure int8 MXU dots."""
    from llama_kotlin_tpu.ops.pallas.qmm_int8 import quantize_activations

    b, k = x.shape
    x = x.astype(jnp.float32)
    x1, s1 = quantize_activations(x)
    r = x - x1.astype(jnp.float32) * jnp.repeat(s1, SPAN, axis=-1)
    x2, s2 = quantize_activations(r)
    return jnp.concatenate([x1, x2], axis=0), jnp.concatenate([s1, s2], axis=0)


def qmm_w4_matmul(x: jnp.ndarray, w: QTensor, *, interpret: bool = False,
                  max_rows: int = 32) -> Optional[jnp.ndarray]:
    """x [..., k] (float) @ W4 w^T -> [..., n] f32, or None if not eligible.

    Decode-path entry: quantizes activations per-256 superblock (the
    reference's Q8_K row quantization, ggml-quants.c quantize_row_q8_K),
    runs the block-diagonal kernel for the scale-weighted main term, and
    subtracts the per-group min term via one [b, G] x [G, n] matmul on the
    sx-scaled group sums (the analogue of Q8_K bsums).

    W4X tensors (fold_to_w4(precise=True): f32 scales + aux['precise'])
    take the dual-plane activation path: both planes stack along the batch
    axis of the SAME block-diagonal kernel (per-row scales ride sxv), and
    the two half-results sum at the end — weight HBM traffic unchanged.
    """
    from llama_kotlin_tpu.ops.pallas.qmm_int8 import quantize_activations

    if not w.hi_signed or w.aux is None:
        return None
    precise = "precise" in w.aux
    n, k = w.shape
    kc = w.codes.shape[-1]
    k_pad = kc * 2
    if _plan(n, kc) is None:
        return None
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != k or b_real > max_rows:
        return None  # prefill batches route to the dense/bf16 path
    # Pad the batch to a power of two, floored so the block-diagonal rows
    # (NG*bp per activation plane; precise mode stacks 2 planes) meet the
    # int8 sublane tile of 32.  Keep bp MINIMAL beyond that: at bp=8 the
    # kernel runs 128 rows x 2 nibble planes = 512 int8-ops per weight
    # byte, past the v5e MXU:HBM balance (~480 ops/byte at 394 TOPS /
    # 819 GB/s), i.e. the 16x block-diagonal redundancy makes it
    # MXU-bound (round-3 device sweep: ~570 GB/s plateau).  bp=2 (32
    # rows) quarters the MXU and partial-rescale VPU work and returns
    # single-stream decode to HBM-bound.
    bp_min = 1 if precise else 2
    bp = max(bp_min, int(2 ** np.ceil(np.log2(max(b_real, 1)))))
    x2 = x.reshape(b_real, k).astype(jnp.float32)
    if bp != b_real or k_pad != k:
        x2 = jnp.pad(x2, ((0, bp - b_real), (0, k_pad - k)))
    # fx2 (default; LKTPU_W4_FX=0 reverts): ALL activation prep in-kernel,
    # scratch-cached at the first n-block of each k-block — no
    # quantize/bd/xg XLA chain at all.  Round-4 device A/B (llama3-8b
    # tg128): 99.7 -> 120.2 t/s from this alone
    if not precise and os.environ.get("LKTPU_W4_FX", "2") == "2":
        y = qmm_w4_fx2(x2, w, interpret=interpret)
        if y is not None:
            return y[:b_real].reshape(*lead_shape, n)
    if "q6_t" in w.aux:
        # compact aux layout is served by fx2 only; other kernel variants
        # need the bf16 scw/madj planes — decline so the caller falls to
        # the exact XLA dequant path (g_scale/g_min carry the full planes)
        return None
    if precise:
        x8, sx = quantize_activations_2p(x2)  # [2bp, k_pad], [2bp, S]
    else:
        x8, sx = quantize_activations(x2)  # int8 [bp, k_pad], f32 [bp, S]
    nb = x8.shape[0]
    sym = "sym" in w.aux
    # fused-x kernel (LKTPU_W4_FX=1 opt-in): raw f32 activations in,
    # quantize + plane split + block-diagonal build on VMEM tiles.
    # Device-measured SLOWER than the standard path (74.6 vs 93.8 t/s
    # 32-step loop, round 3): the grid is k-outer/n-inner, so the
    # in-kernel activation prep repeats per n-block and the redundant VPU
    # work exceeds the saved XLA-chain latency.  Kept for measurement.
    use_fx = not precise and os.environ.get("LKTPU_W4_FX", "0") == "1"
    if use_fx:
        sxv = jnp.asarray(build_sxv_ir(sx, k_pad))
    else:
        xlo, xhi = build_xbd(x8, k_pad)
        sxv = jnp.asarray(build_sxv(sx, k_pad))

    def main_term(xg_t):
        if use_fx:
            return qmm_w4_fx(x2, sxv, w, interpret=interpret, xg_t=xg_t)
        return qmm_w4(xlo, xhi, sxv, w, interpret=interpret, xg_t=xg_t)

    if sym:
        # symmetric layout (Q4_0 class): the min term is 8 * sum over LO
        # groups of xg*s — the kernel derives it from its resident scw_lo
        # block, so xg rides in PLANE-column order for the lo plane only
        kcw = k_pad // 2
        xr = x8.reshape(nb, k_pad // SPAN, 2, SPAN // 2)
        lo = xr[:, :, 0].reshape(nb, kcw)
        xg = lo.reshape(nb, kcw // 32, 32).astype(jnp.int32).sum(
            axis=-1).astype(jnp.float32)
        xg = xg * jnp.repeat(sx, (SPAN // 2) // 32, axis=-1)
        y = main_term(xg.T)
    else:
        # sx-scaled per-group activation sums (exact in f32), transposed
        # to [G, nb] for the in-kernel min term (madj_t stream)
        G = k_pad // 32
        xg = x8.reshape(nb, G, 32).astype(jnp.int32).sum(
            axis=-1).astype(jnp.float32)
        xg = xg * jnp.repeat(sx, SPAN // 32, axis=-1)
        in_kernel_min = "madj_t" in w.aux
        y = main_term(xg.T if in_kernel_min else None)
        if y is not None and not in_kernel_min:  # legacy fold
            y = y - jnp.dot(xg, w.g_min.astype(jnp.float32).T,
                            preferred_element_type=jnp.float32)
    if y is None:
        return None
    if precise:
        y = y[:bp] + y[bp:]
    return y[:b_real].reshape(*lead_shape, n)


def qmm_w4_or_none(x, w, **kw):
    """W4 dispatch with a LOUD one-time fallback: an unexpected Mosaic/
    layout exception here drops serving to the W8/Q8F/dequant chain — a
    large silent perf cliff (see utils/warnonce.py)."""
    try:
        return qmm_w4_matmul(x, w, **kw)
    except Exception as e:
        from llama_kotlin_tpu.utils.warnonce import warn_once

        warn_once(
            ("w4", x.shape[-1], w.shape, type(e).__name__),
            "qmm_w4 kernel declined for w=%s x_k=%d (%s: %s) — falling "
            "back to a slower matmul path" % (
                w.shape, x.shape[-1], type(e).__name__, str(e)[:200]))
        return None


def qmm_w4_fx2(x_pad: jnp.ndarray, w: QTensor, *,
               interpret: bool = False) -> Optional[jnp.ndarray]:
    """Scratch-cached fused-activation W4 matmul: RAW padded f32
    activations in; per-superblock Q8 quantization, nibble-plane split,
    block-diagonal build, AND the min-term group sums all happen in-kernel
    at the FIRST n-block of each k-block, cached in VMEM scratch and reused
    across the n-sweep.

    This fixes the diagnosed fx loss (the k-outer/n-inner grid repeated the
    activation prep per n-block, ops/pallas/qmm_w4.py round-3 note) and
    removes the entire per-matmul XLA glue chain — quantize fusions,
    two [16b, k/2] block-diagonal selects, group-sum reductions, and their
    S(1) staging — from the decode critical path: the prep now runs inside
    the weight-streaming pipeline where it overlaps the next block's DMA.
    Numerics match qmm_w4_matmul to f32 reduce-association tolerance
    (same quantize formula and min-term algebra; the NG-fold sum runs
    over a different axis).

    COMPACT aux layout (quant/fold.py round 4): instead of bf16 scw/madj
    product planes, the kernel streams the wire's own factorization —
    int8 6-bit scale/min codes (plane order) + f32 per-superblock d/dmin —
    and forms f32(d)*sc on the resident tiles (the reference's exact
    dequant product).  4.625 vs 5.0 bits/weight of decode traffic; the hi
    plane's -8*s_eff m_adj correction is derived from the already-resident
    sc6_hi/d tiles, and the min-term group sums are laid out in plane
    order ([lo-plane groups | hi-plane groups]) so everything stays 2-D."""
    if not w.hi_signed or w.aux is None or "precise" in w.aux:
        return None
    n, k = w.shape
    kc = w.codes.shape[-1]
    plan = _plan(n, kc)
    if plan is None:
        return None
    bn, bkc = plan
    bp = x_pad.shape[0]
    if x_pad.shape[1] != 2 * kc:
        return None
    sym = "sym" in w.aux
    compact = "q6_t" in w.aux
    if not compact and not sym and "madj_t" not in w.aux:
        return None
    if compact and bkc < 1024:
        # (4, bkc//32, bn) int8 q6 blocks with second-minor dim < 32
        # miscompile on hardware (silent wrong values — ADVICE r4 #2,
        # device-confirmed); fold_to_w4 avoids such folds, this guards
        # env-forced plans
        return None
    bcast = os.environ.get("LKTPU_W4_BCAST", "0") == "1"

    grid = (kc // bkc, n // bn)
    nch_blk = bkc // CHUNK
    nsb = (2 * bkc) // SPAN  # superblocks per k-block
    # xg group-sum columns per k-block: sym = lo-plane groups only;
    # compact = [lo-plane | hi-plane] order; legacy asym = sequential
    gcols = bkc // 32 if sym else bkc // 16

    def kernel(x_ref, codes_ref, *rest):
        rest = list(rest)
        madj_ref = sclo_ref = schi_ref = q6_ref = dd_ref = None
        if compact:
            q6_ref, dd_ref = rest.pop(0), rest.pop(0)
        else:
            sclo_ref, schi_ref = rest.pop(0), rest.pop(0)
            if not sym:
                madj_ref = rest.pop(0)
        out_ref, bdlo_scr, bdhi_scr, sx_scr, xg_scr = rest
        if compact:
            # hoisted ONCE per grid step: the effective scale tiles
            # f32(d) * sc6 (the reference's own dequant product, exact in
            # f32) and the repeated d/dmin rows for the min term
            q6 = q6_ref[...]                      # [4, bkc//32, bn] i8
            d_all, dmin_all = split_dd(dd_ref[...])  # [bkc//32, bn] f32
            sc_lo_all = q6[0].astype(jnp.float32) * d_all
            sc_hi_all = q6[1].astype(jnp.float32) * (d_all * 0.0625)

        @pl.when(pl.program_id(1) == 0)
        def _prep():
            # once per k-block: quantize + plane split + bd build + xg
            xb = x_ref[...]  # [bp, 2*bkc] f32
            lo_parts, hi_parts, d_parts, q_parts = [], [], [], []
            for s in range(nsb):
                xs = xb[:, s * SPAN:(s + 1) * SPAN]
                amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
                d = amax / 127.0
                safe = jnp.where(d > 0, d, 1.0)
                q = jnp.clip(jnp.round(xs / safe), -127, 127).astype(jnp.int8)
                lo_parts.append(q[:, :SPAN // 2])
                hi_parts.append(q[:, SPAN // 2:])
                d_parts.append(d)
                if not sym and not compact:
                    q_parts.append(q)
            x8_lo = jnp.concatenate(lo_parts, axis=-1)  # [bp, bkc]
            x8_hi = jnp.concatenate(hi_parts, axis=-1)
            sx_scr[...] = jnp.concatenate(d_parts, axis=-1)  # [bp, nsb]

            col_blk = (jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, bkc), 1) // 32) % NG
            row_r = jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, bkc), 0) % NG
            keep = col_blk == row_r
            bdlo_scr[...] = jnp.where(keep, jnp.repeat(x8_lo, NG, axis=0),
                                      jnp.int8(0))
            bdhi_scr[...] = jnp.where(keep, jnp.repeat(x8_hi, NG, axis=0),
                                      jnp.int8(0))

            # sx-scaled group sums for the min term, via a 0/1 membership
            # matmul (per-32 strided reshapes are lane-hostile on TPU)
            if compact:
                # per-plane group sums in plane-column order (matches the
                # sc6/m6 plane layout): column p of either half covers
                # plane columns 32p..32p+31 of that nibble plane
                half = gcols // 2
                gm = (jax.lax.broadcasted_iota(
                    jnp.int32, (bkc, half), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (bkc, half), 1)).astype(jnp.int8)
                gs_lo = jax.lax.dot_general(
                    x8_lo, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                gs_hi = jax.lax.dot_general(
                    x8_hi, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                # plane row p sits in superblock p//4
                dcat = jnp.concatenate(
                    [d_parts[s] for s in range(nsb) for _ in range(4)],
                    axis=-1)  # [bp, half]
                xg_scr[...] = jnp.concatenate(
                    [gs_lo * dcat, gs_hi * dcat], axis=-1)
            else:
                if sym:  # lo-plane-column group order against scw_lo*8
                    src, rep = x8_lo, 4
                else:    # sequential element-group order against madj_t
                    src, rep = jnp.concatenate(q_parts, axis=-1), 8
                gm = (jax.lax.broadcasted_iota(
                    jnp.int32, (src.shape[1], gcols), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (src.shape[1], gcols), 1)).astype(jnp.int8)
                gs = jax.lax.dot_general(
                    src, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                xg_scr[...] = gs * jnp.concatenate(
                    [d_parts[s] for s in range(nsb) for _ in range(rep)],
                    axis=-1)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        acc = jnp.zeros_like(out_ref)
        if bcast:
            # activation scales expanded ONCE per grid step (vs 16 column
            # concats per chunk): row (i, r) of chunk t -> sx[i, 4t + r//4].
            # Static concat, not jnp.repeat — a lane-dim repeat lowers to a
            # (bp, nsb, 4)->(bp, 4*nsb) shape cast Mosaic rejects
            sx_rep = jnp.concatenate(
                [sx_scr[:, s:s + 1] for s in range(nsb) for _ in range(4)],
                axis=1)  # [bp, 4*nsb]
        for t in range(nch_blk):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            cw = codes_ref[:, sl]  # [bn, 512] u8
            lo_w = pltpu.bitcast(cw & jnp.uint8(0x0F), jnp.int8)
            hi_w = pltpu.bitcast(cw & jnp.uint8(0xF0), jnp.int8)
            p_lo = jax.lax.dot_general(
                bdlo_scr[:, sl], lo_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [bp*NG, bn], (i, r)
            p_hi = jax.lax.dot_general(
                bdhi_scr[:, sl], hi_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            if bcast:
                # scale via [1, NG, bn] broadcasts against the 3-D partials
                # instead of materializing [bp*NG, bn] tiles (LKTPU_W4_BCAST
                # A/B; the multiply count is identical)
                gsl = slice(t * NG, (t + 1) * NG)
                s_lo = (sc_lo_all if compact else sclo_ref)[gsl]
                s_hi = (sc_hi_all if compact else schi_ref)[gsl]
                sxc = sx_rep[:, gsl][:, :, None]  # [bp, NG, 1]
                c3 = (p_lo.reshape(bp, NG, bn).astype(jnp.float32)
                      * s_lo.astype(jnp.float32)[None]
                      + p_hi.reshape(bp, NG, bn).astype(jnp.float32)
                      * s_hi.astype(jnp.float32)[None])
                acc = acc + (c3 * sxc).sum(axis=1)
                continue
            if compact:
                sc_lo = jnp.tile(sc_lo_all[t * NG:(t + 1) * NG, :], (bp, 1))
                sc_hi = jnp.tile(sc_hi_all[t * NG:(t + 1) * NG, :], (bp, 1))
            else:
                sc_lo = jnp.tile(sclo_ref[t * NG:(t + 1) * NG, :], (bp, 1))
                sc_hi = jnp.tile(schi_ref[t * NG:(t + 1) * NG, :], (bp, 1))
            contrib = (p_lo.astype(jnp.float32) * sc_lo.astype(jnp.float32)
                       + p_hi.astype(jnp.float32) * sc_hi.astype(jnp.float32))
            # chunk t covers local superblocks 4t..4t+3; row (i,r) -> 4t+r//4
            sxc = jnp.concatenate(
                [sx_scr[:, 4 * t + q:4 * t + q + 1]
                 for q in range(4) for _ in range(4)], axis=1)[:, :, None]
            acc = acc + (contrib.reshape(bp, NG, bn) * sxc).sum(axis=1)
        if compact:
            half = gcols // 2
            mw_lo = dmin_all * q6[2].astype(jnp.float32)
            # -8*s_eff = -128 * (d*sc6/16): reuse the resident hi scale
            # tiles instead of rebuilding d*sc6 (exact: power-of-two)
            mw_hi = (dmin_all * q6[3].astype(jnp.float32)
                     - 128.0 * sc_hi_all)
            acc = acc - jax.lax.dot_general(
                xg_scr[:, :half], mw_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            acc = acc - jax.lax.dot_general(
                xg_scr[:, half:], mw_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            mw = (sclo_ref[...] * 8.0 if sym else madj_ref[...]).astype(jnp.float32)
            acc = acc - jax.lax.dot_general(
                xg_scr[...], mw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        out_ref[...] += acc

    in_specs = [
        pl.BlockSpec((bp, 2 * bkc), (lambda j, i: (0, j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bkc), (lambda j, i: (i, j)), memory_space=pltpu.VMEM),
    ]
    operands = [x_pad, w.codes]
    if compact:
        in_specs += [
            pl.BlockSpec((4, bkc // 32, bn), (lambda j, i: (0, j, i)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkc // 64, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
        ]
        operands += [w.aux["q6_t"], w.aux["dd_t"]]
    else:
        in_specs += [
            pl.BlockSpec((bkc // 32, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkc // 32, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
        ]
        operands += [w.aux["scw_lo"], w.aux["scw_hi"]]
        if not sym:
            in_specs += [
                pl.BlockSpec((bkc // 16, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
            ]
            operands += [w.aux["madj_t"]]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bp, bn), (lambda j, i: (0, i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bp * NG, bkc), jnp.int8),
            pltpu.VMEM((bp * NG, bkc), jnp.int8),
            pltpu.VMEM((bp, nsb), jnp.float32),
            pltpu.VMEM((bp, gcols), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*operands)
    return out


def qmm_w4_fx(x_pad: jnp.ndarray, sxv_ir: jnp.ndarray, w: QTensor, *,
              interpret: bool = False,
              xg_t: Optional[jnp.ndarray] = None) -> Optional[jnp.ndarray]:
    """Fused-activation variant of qmm_w4: takes the RAW padded f32
    activations [nb, k_pad] and performs the per-superblock int8
    quantization, nibble-plane split, and block-diagonal layout INSIDE the
    kernel on VMEM-resident tiles.

    The standard path materialises x8 + two [16*nb, k/2] block-diagonal
    int8 arrays through three XLA fusions per matmul, each a staged
    VMEM operand on the decode critical path (round-3 trace: the
    dependency chain norm -> quantize -> bd-build -> stage -> kernel adds
    serial latency per matmul; 4 matmuls/layer x 32 layers).  Here the
    chain is norm -> stage x -> kernel.  The quantization is the exact
    quantize_activations formula (amax/127, round-half-even, clip), so
    results are bit-identical to the standard path.

    In-kernel layout uses BATCH-MAJOR block-diagonal rows (i*NG + r) via
    jnp.repeat(x8, NG, axis=0) — both repeat and the [nb*NG, bn] ->
    [nb, NG, bn] reshape are device-proven Mosaic patterns; sxv_ir is the
    matching (i, r)-ordered scale layout (build_sxv_ir)."""
    if not w.hi_signed or w.aux is None:
        return None
    n, k = w.shape
    kc = w.codes.shape[-1]  # k_pad / 2
    plan = _plan(n, kc)
    if plan is None:
        return None
    bn, bkc = plan
    nb = x_pad.shape[0]
    scw_lo, scw_hi = w.aux["scw_lo"], w.aux["scw_hi"]
    with_min = xg_t is not None
    sym = "sym" in w.aux
    if with_min and not sym and "madj_t" not in w.aux:
        return None

    grid = (kc // bkc, n // bn)
    nch_blk = bkc // CHUNK
    nch = kc // CHUNK
    nsb = (2 * bkc) // SPAN  # superblocks per k-block

    def kernel(x_ref, sxv_ref, codes_ref, sclo_ref, schi_ref, *rest):
        madj_ref = None
        if with_min and sym:
            xgt_ref, out_ref = rest
        elif with_min:
            xgt_ref, madj_ref, out_ref = rest
        else:
            (out_ref,) = rest

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        xb = x_ref[...]  # [nb, 2*bkc] f32
        lo_parts, hi_parts = [], []
        for s in range(nsb):
            xs = xb[:, s * SPAN:(s + 1) * SPAN]
            amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
            d = amax / 127.0
            safe = jnp.where(d > 0, d, 1.0)
            q = jnp.clip(jnp.round(xs / safe), -127, 127).astype(jnp.int8)
            lo_parts.append(q[:, :SPAN // 2])
            hi_parts.append(q[:, SPAN // 2:])
        x8_lo = jnp.concatenate(lo_parts, axis=-1)  # [nb, bkc]
        x8_hi = jnp.concatenate(hi_parts, axis=-1)
        # batch-major block-diagonal rows (i*NG + r)
        rep_lo = jnp.repeat(x8_lo, NG, axis=0)  # [nb*NG, bkc]
        rep_hi = jnp.repeat(x8_hi, NG, axis=0)
        col_blk = (jax.lax.broadcasted_iota(
            jnp.int32, (nb * NG, bkc), 1) // 32) % NG
        row_r = jax.lax.broadcasted_iota(
            jnp.int32, (nb * NG, bkc), 0) % NG
        keep = col_blk == row_r
        bd_lo = jnp.where(keep, rep_lo, jnp.int8(0))
        bd_hi = jnp.where(keep, rep_hi, jnp.int8(0))

        cw = codes_ref[...]  # [bn, bkc] u8
        lo_w = pltpu.bitcast(cw & jnp.uint8(0x0F), jnp.int8)
        hi_w = pltpu.bitcast(cw & jnp.uint8(0xF0), jnp.int8)
        ch0 = pl.program_id(0) * nch_blk
        acc = jnp.zeros_like(out_ref)
        for t in range(nch_blk):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            p_lo = jax.lax.dot_general(
                bd_lo[:, sl], lo_w[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [nb*16, bn], rows (i, r)
            p_hi = jax.lax.dot_general(
                bd_hi[:, sl], hi_w[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            sc_lo = jnp.tile(sclo_ref[t * NG:(t + 1) * NG, :], (nb, 1))
            sc_hi = jnp.tile(schi_ref[t * NG:(t + 1) * NG, :], (nb, 1))
            sxc = sxv_ref[ch0 + t, :][:, None]  # [nb*16, 1] (i, r) order
            contrib = (p_lo.astype(jnp.float32) * sc_lo.astype(jnp.float32)
                       + p_hi.astype(jnp.float32) * sc_hi.astype(jnp.float32)
                       ) * sxc
            acc = acc + contrib.reshape(nb, NG, bn).sum(axis=1)
        if with_min:
            mw = (sclo_ref[...] * 8.0 if sym else madj_ref[...]
                  ).astype(jnp.float32)
            acc = acc - jax.lax.dot_general(
                xgt_ref[...], mw,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        out_ref[...] += acc

    in_specs = [
        pl.BlockSpec((nb, 2 * bkc), (lambda j, i: (0, j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((nch, nb * NG), (lambda j, i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bkc), (lambda j, i: (i, j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bkc // 32, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bkc // 32, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
    ]
    operands = [x_pad, sxv_ir, w.codes, scw_lo, scw_hi]
    if with_min:
        if sym:
            in_specs += [
                pl.BlockSpec((bkc // 32, nb), (lambda j, i: (j, 0)), memory_space=pltpu.VMEM),
            ]
            operands += [xg_t]
        else:
            in_specs += [
                pl.BlockSpec((bkc // 16, nb), (lambda j, i: (j, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((bkc // 16, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
            ]
            operands += [xg_t, w.aux["madj_t"]]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, bn), (lambda j, i: (0, i)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*operands)
    return out


def qmm_w4(x8_bd_lo: jnp.ndarray, x8_bd_hi: jnp.ndarray, sxv: jnp.ndarray,
           w: QTensor, *, interpret: bool = False,
           xg_t: Optional[jnp.ndarray] = None) -> Optional[jnp.ndarray]:
    """Main term of the W4A8 matmul: [b, n] f32.

    xg_t [G, b] (sx-scaled per-group activation sums, transposed) enables
    the IN-KERNEL min term: each (k-block, n-block) grid step streams the
    matching rows of aux['madj_t'] [G, n] and subtracts
    xg_t_blk^T @ madj_blk from the accumulator — the min plane rides the
    same pipelined grid as the scale planes instead of a separate XLA dot
    re-reading g_min (0.5 bit/weight) outside the kernel.  Without xg_t
    the caller applies the min term itself."""
    if not w.hi_signed or w.aux is None:
        return None
    n, k = w.shape
    kc = w.codes.shape[-1]  # k_pad / 2
    plan = _plan(n, kc)
    if plan is None:
        return None
    bn, bkc = plan
    rows = x8_bd_lo.shape[0]  # 16 * b
    b = rows // NG
    scw_lo, scw_hi = w.aux["scw_lo"], w.aux["scw_hi"]
    with_min = xg_t is not None
    sym = "sym" in w.aux
    if with_min and not sym and "madj_t" not in w.aux:
        return None

    # k-blocks OUTER, n-blocks inner: the activation block's index only
    # depends on the k position, so Mosaic fetches it once per k-block
    # instead of once per (n, k) step — with n inner, the j-sweep re-read
    # of x cost (n/bn) * |x| extra HBM traffic (round-3 device trace:
    # [4096,14336] ran at 438 GB/s vs 567 for its transpose).  The price
    # is the f32 out block ping-ponging per revisit, (kc/bkc) * |out|
    # bytes — orders of magnitude smaller at decode batch sizes.
    grid = (kc // bkc, n // bn)
    nch_blk = bkc // CHUNK
    nch = kc // CHUNK  # sxv rides whole (tiny); block-sliced spec breaks
    # Mosaic's (8,128)-divisibility rule when nch_blk < nch (e.g. k=14336)

    def kernel(xlo_ref, xhi_ref, sxv_ref, codes_ref, sclo_ref, schi_ref,
               *rest):
        madj_ref = None
        if with_min and sym:
            xgt_ref, out_ref = rest
        elif with_min:
            xgt_ref, madj_ref, out_ref = rest
        else:
            (out_ref,) = rest

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        cw = codes_ref[...]  # [bn, bkc] u8
        lo_w = pltpu.bitcast(cw & jnp.uint8(0x0F), jnp.int8)
        hi_w = pltpu.bitcast(cw & jnp.uint8(0xF0), jnp.int8)
        ch0 = pl.program_id(0) * nch_blk
        acc = jnp.zeros_like(out_ref)
        for t in range(nch_blk):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            p_lo = jax.lax.dot_general(
                xlo_ref[:, sl], lo_w[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [16b, bn]
            p_hi = jax.lax.dot_general(
                xhi_ref[:, sl], hi_w[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            sc_lo = jnp.repeat(sclo_ref[t * NG:(t + 1) * NG, :], b, axis=0)
            sc_hi = jnp.repeat(schi_ref[t * NG:(t + 1) * NG, :], b, axis=0)
            sxc = sxv_ref[ch0 + t, :][:, None]  # [16b, 1]
            contrib = (p_lo.astype(jnp.float32) * sc_lo.astype(jnp.float32)
                       + p_hi.astype(jnp.float32) * sc_hi.astype(jnp.float32)
                       ) * sxc
            acc = acc + contrib.reshape(NG, b, bn).sum(axis=0)
        if with_min:
            # min term streamed per grid step: [Gblk, b]^T @ [Gblk, bn].
            # sym: madj == 8*scw_lo (Q4_0's lo-nibble bias), so the dot
            # reuses the resident scale block — zero extra HBM reads
            mw = (sclo_ref[...] * 8.0 if sym else madj_ref[...]
                  ).astype(jnp.float32)
            acc = acc - jax.lax.dot_general(
                xgt_ref[...], mw,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        out_ref[...] += acc

    in_specs = [
        pl.BlockSpec((rows, bkc), (lambda j, i: (0, j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, bkc), (lambda j, i: (0, j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((nch, rows), (lambda j, i: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, bkc), (lambda j, i: (i, j)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bkc // 32, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bkc // 32, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
    ]
    operands = [x8_bd_lo, x8_bd_hi, sxv, w.codes, scw_lo, scw_hi]
    if with_min:
        if sym:
            # xg in lo-plane-column order: bkc/32 group rows per k-block
            in_specs += [
                pl.BlockSpec((bkc // 32, b), (lambda j, i: (j, 0)), memory_space=pltpu.VMEM),
            ]
            operands += [xg_t]
        else:
            # per-block group rows: bkc plane cols = 2*bkc elements =
            # bkc/16 groups across BOTH planes (sequential in madj_t)
            in_specs += [
                pl.BlockSpec((bkc // 16, b), (lambda j, i: (j, 0)), memory_space=pltpu.VMEM),
                pl.BlockSpec((bkc // 16, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
            ]
            operands += [xg_t, w.aux["madj_t"]]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, bn), (lambda j, i: (0, i)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*operands)
    return out
