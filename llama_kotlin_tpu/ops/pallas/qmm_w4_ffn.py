"""Fused W4 FFN megakernel: gate + up + down in ONE Pallas launch.

The gated FFN holds ~80% of a llama-family layer's weight bytes
(2F·E for gate|up plus E·F for down).  Serving it as two block-diagonal
kernel launches (gate|up fused, then down) pays, per layer per token:

  * two pipeline ramps (~10-15 us each, round-3 device traces);
  * an XLA glue chain between them on the decode critical path —
    h = act(g)*u staged out to HBM/S(1), re-quantized per-superblock,
    rebuilt into two [16b, F/2] block-diagonal int8 arrays, re-staged
    (round-3 trace: XLA stages every Pallas operand in S(1); the
    norm→quantize→bd-build→stage chain serializes against the next
    kernel's weight prefetch).

This kernel takes the RAW f32 activations and streams ALL THREE weight
matrices through one grid sweep over F-blocks: at the first block it
quantizes x per-256-superblock, builds the block-diagonal planes and the
min-term group sums into VMEM scratch (reused across the sweep); per block
it computes the gate/up partial outputs, applies the activation, quantizes
h IN KERNEL (bit-identical to ops/pallas/qmm_int8.quantize_activations on
the bf16-rounded h, matching the unfused path's
`ffn.astype(compute_dtype)`), builds h's block-diagonal planes on VMEM
tiles, and immediately contracts them against the down block's columns —
neither x's Q8 form nor h ever exists outside the kernel.  This is legal
because the gated FFN is elementwise in F: down =
Σ_f act(x@Wg_f^T)·(x@Wu_f^T) @ Wd_f^T, so F-blocks contribute independent
rank-bf updates to the [b, E] output.

Reference analogue: the CPU hot loop runs gate/up/down as three
ggml_vec_dot_q4_K_q8_K sweeps with an intermediate quantize_row_q8_K
(ggml/src/ggml-quants.c) — the same math, here restructured so the MXU
sees one uninterrupted weight stream per layer.

Weight layouts are the standard W4 fold (quant/fold.py): the gate|up
fused tensor [2F, E] (rows 0..F-1 = gate, F..2F-1 = up) and the down
tensor [E, F].  Eligibility requires F == down.k_pad (true whenever
F % 1024 == 0, e.g. llama3-8b's 14336; other shapes fall back to the
two-launch path).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN
from llama_kotlin_tpu.ops.pallas.qmm_w4 import CHUNK, NG, split_dd

_F32 = jnp.float32


def _act_f32(name: str, x):
    if name == "silu":
        return x * (1.0 / (1.0 + jnp.exp(-x)))
    if name == "gelu":  # ggml tanh approximation (ops/activations.py)
        c = 0.79788456080286535587989211986876
        return 0.5 * x * (1.0 + jnp.tanh(c * x * (1.0 + 0.044715 * x * x)))
    raise ValueError(name)


def _plan_bf(f_pad: int, compact: bool = False) -> Optional[int]:
    """F-columns per grid step: spans whole superblocks (h quantization),
    whole 512-plane-column chunks (down dot), and divides F_pad.
    LKTPU_FFN_BF overrides the preference order (device sweeps).
    Compact-aux tensors need bf >= 1024 so the down tensor's dd block
    ([2, bf//128, E]) keeps its second-minor dim divisible by 8."""
    # 1024 beats 2048 on device (round-4 sweep: 0.156 vs 0.162 ms on the
    # 8B FFN at b=2): 14 grid steps halve the pipeline-ramp share
    env = "LKTPU_FFN_BF_COMPACT" if compact else "LKTPU_FFN_BF"
    pref = tuple(int(v) for v in os.environ.get(
        env, "1024,2048").split(","))
    for bf in pref:
        if f_pad % bf == 0 and (not compact or bf >= 1024):
            return bf
    return None


def qmm_w4_ffn_matmul(x: jnp.ndarray, gu: QTensor, dn: QTensor, *,
                      act: str = "silu", interpret: bool = False,
                      max_rows: int = 32,
                      up: Optional[QTensor] = None) -> Optional[jnp.ndarray]:
    """x [..., E] f32 -> act(x@gate^T) * (x@up^T) @ down^T as [..., E] f32,
    or None if the shapes/layouts don't qualify (caller falls back to the
    separate gate|up and down launches).

    Two weight layouts: `up=None` takes the single-chip fused tensor
    gu = [gate; up] [2F, E]; `up` given takes SEPARATE gate [F, E] and
    up [F, E] tensors — the layout TP shards arrive in (contiguous
    row-shards of a fused tensor would split into all-gate/all-up halves,
    so the per-shard megakernel consumes the unfused pair instead)."""
    if act not in ("silu", "gelu"):
        return None
    for w in (gu, dn) + ((up,) if up is not None else ()):
        if (not w.hi_signed or w.aux is None or "precise" in w.aux
                or w.is_stacked or w.tp_axis is not None):
            return None
    n_gu, e_gu = gu.shape
    e_dn, f_dn = dn.shape
    if e_gu != e_dn:
        return None
    E = e_gu
    kc_e = gu.codes.shape[-1]
    if kc_e * 2 != E or (kc_e % CHUNK) != 0:
        return None  # E must be chunk-aligned with no fold padding
    f_pad = dn.k_pad
    if up is None:
        if gu.codes.shape[0] != 2 * f_pad:
            return None  # gate/up halves must tile F_pad exactly (F%1024==0)
    else:
        if (gu.codes.shape[0] != f_pad or up.codes.shape[0] != f_pad
                or up.shape != gu.shape or up.codes.shape != gu.codes.shape):
            return None
    compact = "q6_t" in gu.aux
    if compact != ("q6_t" in dn.aux):
        return None  # mixed aux flavors: two-launch path handles each
    if up is not None and compact != ("q6_t" in up.aux):
        return None
    if compact and (E // 64) < 32:
        return None  # gate/up int8 scale blocks below the (32, 128) tile
    bf = _plan_bf(f_pad, compact=compact)
    if bf is None:
        return None
    gu_sym = "sym" in gu.aux
    dn_sym = "sym" in dn.aux
    if up is not None and ("sym" in up.aux) != gu_sym:
        return None  # the kernel applies one min-term flavor to both halves
    if not compact:
        if not gu_sym and "madj_t" not in gu.aux:
            return None
        if not gu_sym and up is not None and "madj_t" not in up.aux:
            return None
        if not dn_sym and "madj_t" not in dn.aux:
            return None
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != E or b_real > max_rows:
        return None
    bp = max(2, int(2 ** math.ceil(math.log2(max(b_real, 1)))))
    x2 = x.reshape(b_real, E).astype(jnp.float32)
    if bp != b_real:
        x2 = jnp.pad(x2, ((0, bp - b_real), (0, 0)))
    y = qmm_w4_ffn(x2, gu, dn, bf=bf, act=act, interpret=interpret, up=up)
    if y is None:
        return None
    return y[:b_real].reshape(*lead_shape, E)


def qmm_w4_ffn(x_pad: jnp.ndarray, gu: QTensor, dn: QTensor, *, bf: int,
               act: str, interpret: bool = False,
               up: Optional[QTensor] = None) -> Optional[jnp.ndarray]:
    E = gu.shape[1]
    f_pad = dn.k_pad
    bp = x_pad.shape[0]
    kc_e = E // 2
    nch_e = kc_e // CHUNK   # chunks sweeping k=E (gate/up dots)
    nch_f = (bf // 2) // CHUNK  # chunks sweeping the block's h columns
    nsb_e = E // SPAN       # x superblocks
    nsb = bf // SPAN        # h superblocks per block
    fb = f_pad // bf        # block count = grid size; up rows start at fb
    # separate-tensor layout (TP shards): up blocks index the up tensor at
    # f instead of the fused tensor at fb + f
    u_t = gu if up is None else up
    u_off = fb if up is None else 0
    compact = "q6_t" in gu.aux
    gu_sym = "sym" in gu.aux
    dn_sym = "sym" in dn.aux
    bcast = os.environ.get("LKTPU_W4_BCAST", "0") == "1"
    # x group sums for the gu min term: sym = lo-plane groups only;
    # compact = [lo-plane | hi-plane] order; legacy asym = sequential
    gx_cols = kc_e // 32 if gu_sym else E // 32

    def kernel(x_ref, gc_ref, uc_ref, *rest):
        rest = list(rest)
        gmadj_ref = umadj_ref = dnmadj_ref = None
        gslo_ref = uslo_ref = gshi_ref = ushi_ref = None
        dnslo_ref = dnshi_ref = None
        gcm = ucm = dncm = None  # compact packed refs (q6_t, dd_t)
        if compact:
            gcm = (rest.pop(0), rest.pop(0))
            ucm = (rest.pop(0), rest.pop(0))
        else:
            gslo_ref, uslo_ref = rest.pop(0), rest.pop(0)
            gshi_ref, ushi_ref = rest.pop(0), rest.pop(0)
            if not gu_sym:
                gmadj_ref, umadj_ref = rest.pop(0), rest.pop(0)
        dnc_ref = rest.pop(0)
        if compact:
            dncm = (rest.pop(0), rest.pop(0))
        else:
            dnslo_ref, dnshi_ref = rest.pop(0), rest.pop(0)
            if not dn_sym:
                dnmadj_ref = rest.pop(0)
        out_ref, bdlo_scr, bdhi_scr, sx_scr, xg_scr = rest

        @pl.when(pl.program_id(0) == 0)
        def _prep():
            # once per layer call: quantize x, build bd planes + group sums
            xb = x_ref[...]  # [bp, E] f32
            lo_parts, hi_parts, d_parts, q_parts = [], [], [], []
            for s in range(nsb_e):
                xs = xb[:, s * SPAN:(s + 1) * SPAN]
                amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
                d = amax / 127.0
                safe = jnp.where(d > 0, d, 1.0)
                q = jnp.clip(jnp.round(xs / safe), -127, 127).astype(jnp.int8)
                lo_parts.append(q[:, :SPAN // 2])
                hi_parts.append(q[:, SPAN // 2:])
                d_parts.append(d)
                if not gu_sym and not compact:
                    q_parts.append(q)
            x8_lo = jnp.concatenate(lo_parts, axis=-1)  # [bp, E/2]
            x8_hi = jnp.concatenate(hi_parts, axis=-1)
            sx_scr[...] = jnp.concatenate(d_parts, axis=-1)  # [bp, nsb_e]
            col_blk = (jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, kc_e), 1) // 32) % NG
            row_r = jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, kc_e), 0) % NG
            keep = col_blk == row_r
            bdlo_scr[...] = jnp.where(keep, jnp.repeat(x8_lo, NG, axis=0),
                                      jnp.int8(0))
            bdhi_scr[...] = jnp.where(keep, jnp.repeat(x8_hi, NG, axis=0),
                                      jnp.int8(0))
            if compact:
                # per-plane group sums in plane-column order (ops/pallas/
                # qmm_w4.py compact layout): [lo | hi] halves
                half = gx_cols // 2
                gm = (jax.lax.broadcasted_iota(
                    jnp.int32, (kc_e, half), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (kc_e, half), 1)).astype(jnp.int8)
                gs_lo = jax.lax.dot_general(
                    x8_lo, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                gs_hi = jax.lax.dot_general(
                    x8_hi, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                dcat = jnp.concatenate(
                    [d_parts[s] for s in range(nsb_e) for _ in range(4)],
                    axis=-1)  # [bp, half]
                xg_scr[...] = jnp.concatenate(
                    [gs_lo * dcat, gs_hi * dcat], axis=-1)
            else:
                if gu_sym:  # lo-plane-column group order against scw_lo*8
                    src, rep = x8_lo, 4
                else:       # sequential element-group order against madj_t
                    src, rep = jnp.concatenate(q_parts, axis=-1), 8
                gm = (jax.lax.broadcasted_iota(
                    jnp.int32, (src.shape[1], gx_cols), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (src.shape[1], gx_cols), 1)).astype(jnp.int8)
                gs = jax.lax.dot_general(
                    src, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                xg_scr[...] = gs * jnp.concatenate(
                    [d_parts[s] for s in range(nsb_e) for _ in range(rep)],
                    axis=-1)

        def gu_half(codes_ref, sclo_ref, schi_ref, madj_ref, cm):
            if compact:
                # hoisted once per half: exact f32(d)*sc6 scale tiles +
                # min-term planes (quant/fold.py compact layout)
                q6 = cm[0][...]                       # [4, E//64, bf] i8
                d_all, dmin_all = split_dd(cm[1][...])  # [E//64, bf] f32
                sc_lo_all = q6[0].astype(_F32) * d_all
                sc_hi_all = q6[1].astype(_F32) * (d_all * 0.0625)
            if bcast:
                # hoisted once per half (vs 16 column concats per chunk);
                # static concat, not jnp.repeat — a lane-dim repeat lowers
                # to a (bp, nsb, 4)->(bp, 4*nsb) shape cast Mosaic rejects
                sx_rep = jnp.concatenate(
                    [sx_scr[:, s:s + 1] for s in range(nsb_e)
                     for _ in range(4)], axis=1)  # [bp, E//64]
            acc = jnp.zeros((bp, bf), _F32)
            for t in range(nch_e):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                # per-chunk nibble unpack: whole-block unpacks kept ~30 MB
                # of int8 planes live and blew the Mosaic vmem stack
                cw = codes_ref[:, sl]  # [bf, 512] u8
                lo_w = pltpu.bitcast(cw & jnp.uint8(0x0F), jnp.int8)
                hi_w = pltpu.bitcast(cw & jnp.uint8(0xF0), jnp.int8)
                p_lo = jax.lax.dot_general(
                    bdlo_scr[:, sl], lo_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # [bp*NG, bf], (i, r)
                p_hi = jax.lax.dot_general(
                    bdhi_scr[:, sl], hi_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                gsl = slice(t * NG, (t + 1) * NG)
                if bcast:
                    # [1, NG, bf] broadcasts against 3-D partials instead of
                    # materialized [bp*NG, bf] tiles (LKTPU_W4_BCAST A/B)
                    s_lo = (sc_lo_all if compact else sclo_ref)[gsl]
                    s_hi = (sc_hi_all if compact else schi_ref)[gsl]
                    sxc = sx_rep[:, gsl][:, :, None]
                    c3 = (p_lo.reshape(bp, NG, bf).astype(_F32)
                          * s_lo.astype(_F32)[None]
                          + p_hi.reshape(bp, NG, bf).astype(_F32)
                          * s_hi.astype(_F32)[None])
                    acc = acc + (c3 * sxc).sum(axis=1)
                    continue
                if compact:
                    sc_lo = jnp.tile(sc_lo_all[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(sc_hi_all[gsl, :], (bp, 1))
                else:
                    sc_lo = jnp.tile(sclo_ref[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(schi_ref[gsl, :], (bp, 1))
                contrib = (p_lo.astype(_F32) * sc_lo.astype(_F32)
                           + p_hi.astype(_F32) * sc_hi.astype(_F32))
                # chunk t covers x superblocks 4t..4t+3; row (i,r) -> 4t+r//4
                sxc = jnp.concatenate(
                    [sx_scr[:, 4 * t + q:4 * t + q + 1]
                     for q in range(4) for _ in range(4)],
                    axis=1)[:, :, None]  # [bp, NG, 1]
                acc = acc + (contrib.reshape(bp, NG, bf) * sxc).sum(axis=1)
            if compact:
                half = gx_cols // 2
                mw_lo = dmin_all * q6[2].astype(_F32)
                # -8*s_eff = -128*(d*sc6/16): reuse the resident hi tiles
                mw_hi = dmin_all * q6[3].astype(_F32) - 128.0 * sc_hi_all
                return (acc
                        - jax.lax.dot_general(
                            xg_scr[:, :half], mw_lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32,
                            precision=jax.lax.Precision.HIGHEST)
                        - jax.lax.dot_general(
                            xg_scr[:, half:], mw_hi, (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32,
                            precision=jax.lax.Precision.HIGHEST))
            mw = (sclo_ref[...] * 8.0 if gu_sym else madj_ref[...]).astype(_F32)
            return acc - jax.lax.dot_general(
                xg_scr[...], mw, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        g = gu_half(gc_ref, gslo_ref, gshi_ref, gmadj_ref, gcm)
        u = gu_half(uc_ref, uslo_ref, ushi_ref, umadj_ref, ucm)
        # bf16 round matches the unfused path's ffn.astype(compute_dtype)
        # before the down matmul's activation quantization
        h = (_act_f32(act, g) * u).astype(jnp.bfloat16).astype(_F32)

        # ---- in-kernel Q8 of h (bitwise quantize_activations semantics)
        lo_parts, hi_parts, d_parts, q_parts = [], [], [], []
        for s in range(nsb):
            xs = h[:, s * SPAN:(s + 1) * SPAN]
            amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
            d = amax / 127.0
            safe = jnp.where(d > 0, d, 1.0)
            q = jnp.clip(jnp.round(xs / safe), -127, 127).astype(jnp.int8)
            lo_parts.append(q[:, :SPAN // 2])
            hi_parts.append(q[:, SPAN // 2:])
            d_parts.append(d)
            q_parts.append(q)
        h8_lo = jnp.concatenate(lo_parts, axis=-1)     # [bp, bf/2] i8
        h8_hi = jnp.concatenate(hi_parts, axis=-1)

        # block-diagonal h planes, batch-major rows (i*NG + r) — the
        # device-proven fx-kernel pattern (ops/pallas/qmm_w4.py)
        def bd(p):
            rep = jnp.repeat(p, NG, axis=0)  # [bp*NG, bf/2]
            col_blk = (jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, bf // 2), 1) // 32) % NG
            row_r = jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, bf // 2), 0) % NG
            return jnp.where(col_blk == row_r, rep, jnp.int8(0))

        bd_lo, bd_hi = bd(h8_lo), bd(h8_hi)

        if compact:
            q6d = dncm[0][...]                       # [4, bf//64, E] i8
            dD_all, dminD_all = split_dd(dncm[1][...])  # [bf//64, E] f32
            scd_lo_all = q6d[0].astype(_F32) * dD_all
            scd_hi_all = q6d[1].astype(_F32) * (dD_all * 0.0625)
        acc = jnp.zeros_like(out_ref)
        for t in range(nch_f):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            dn_cw = dnc_ref[:, sl]  # [E, 512] u8 (per-chunk, see gu_half)
            dlo_w = pltpu.bitcast(dn_cw & jnp.uint8(0x0F), jnp.int8)
            dhi_w = pltpu.bitcast(dn_cw & jnp.uint8(0xF0), jnp.int8)
            p_lo = jax.lax.dot_general(
                bd_lo[:, sl], dlo_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [bp*NG, E], (i, r)
            p_hi = jax.lax.dot_general(
                bd_hi[:, sl], dhi_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            gsl = slice(t * NG, (t + 1) * NG)
            # chunk t covers superblocks 4t..4t+3; row (i, r) -> sb 4t+r//4
            # — the scale applies as a [bp, NG, 1] broadcast after the 3-D
            # reshape (a [bp, NG] -> [bp*NG, 1] column reshape is a shape
            # cast Mosaic rejects; static concat of d columns is not)
            sxc = jnp.concatenate(
                [d_parts[4 * t + q] for q in range(4) for _ in range(4)],
                axis=1)[:, :, None]  # [bp, NG, 1]
            if bcast:
                s_lo = (scd_lo_all if compact else dnslo_ref)[gsl]
                s_hi = (scd_hi_all if compact else dnshi_ref)[gsl]
                c3 = (p_lo.reshape(bp, NG, E).astype(_F32)
                      * s_lo.astype(_F32)[None]
                      + p_hi.reshape(bp, NG, E).astype(_F32)
                      * s_hi.astype(_F32)[None])
                acc = acc + (c3 * sxc).sum(axis=1)
                continue
            if compact:
                sc_lo = jnp.tile(scd_lo_all[gsl, :], (bp, 1))
                sc_hi = jnp.tile(scd_hi_all[gsl, :], (bp, 1))
            else:
                sc_lo = jnp.tile(dnslo_ref[gsl, :], (bp, 1))
                sc_hi = jnp.tile(dnshi_ref[gsl, :], (bp, 1))
            contrib = (p_lo.astype(_F32) * sc_lo.astype(_F32)
                       + p_hi.astype(_F32) * sc_hi.astype(_F32))
            acc = acc + (contrib.reshape(bp, NG, E) * sxc).sum(axis=1)

        # ---- down min term from h's group sums (element order): a dot
        # against a 0/1 group-membership matrix keeps the reduction on the
        # MXU (per-32 strided reshapes are lane-hostile)
        if compact:
            halfF = bf // 64
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (bf // 2, halfF), 0)
                    // 32 == jax.lax.broadcasted_iota(
                        jnp.int32, (bf // 2, halfF), 1)).astype(jnp.int8)
            gs_lo = jax.lax.dot_general(
                h8_lo, gmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(_F32)
            gs_hi = jax.lax.dot_general(
                h8_hi, gmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(_F32)
            dcat_h = jnp.concatenate(
                [d_parts[s] for s in range(nsb) for _ in range(4)], axis=1)
            mw_lo = dminD_all * q6d[2].astype(_F32)
            mw_hi = dminD_all * q6d[3].astype(_F32) - 128.0 * scd_hi_all
            acc = acc - jax.lax.dot_general(
                gs_lo * dcat_h, mw_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)
            acc = acc - jax.lax.dot_general(
                gs_hi * dcat_h, mw_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)
        elif dn_sym:
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (bf // 2, bf // 64), 0)
                    // 32 == jax.lax.broadcasted_iota(
                        jnp.int32, (bf // 2, bf // 64), 1)).astype(jnp.int8)
            gs = jax.lax.dot_general(
                h8_lo, gmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(_F32)
            # lo-plane group g sits in span g//4: static concat (see sxc)
            xg_h = gs * jnp.concatenate(
                [d_parts[s] for s in range(nsb) for _ in range(4)], axis=1)
            acc = acc - 8.0 * jax.lax.dot_general(
                xg_h, dnslo_ref[...].astype(_F32), (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            h8_el = jnp.concatenate(q_parts, axis=-1)  # [bp, bf] element order
            gmat = (jax.lax.broadcasted_iota(jnp.int32, (bf, bf // 32), 0)
                    // 32 == jax.lax.broadcasted_iota(
                        jnp.int32, (bf, bf // 32), 1)).astype(jnp.int8)
            gs = jax.lax.dot_general(
                h8_el, gmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(_F32)
            # element-order group g sits in span g//8: static concat
            xg_h = gs * jnp.concatenate(
                [d_parts[s] for s in range(nsb) for _ in range(8)], axis=1)
            acc = acc - jax.lax.dot_general(
                xg_h, dnmadj_ref[...].astype(_F32), (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)
        out_ref[...] += acc

    in_specs = [
        pl.BlockSpec((bp, E), (lambda f: (0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bf, kc_e), (lambda f: (f, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((bf, kc_e), (lambda f: (u_off + f, 0)), memory_space=pltpu.VMEM),
    ]
    operands = [x_pad, gu.codes, u_t.codes]
    if compact:
        for src, fmap3, fmap2 in (
                (gu, (lambda f: (0, 0, f)), (lambda f: (0, f))),
                (u_t, (lambda f: (0, 0, u_off + f)),
                 (lambda f: (0, u_off + f)))):
            in_specs += [
                pl.BlockSpec((4, E // 64, bf), fmap3, memory_space=pltpu.VMEM),
                pl.BlockSpec((E // 128, bf), fmap2, memory_space=pltpu.VMEM),
            ]
            operands += [src.aux["q6_t"], src.aux["dd_t"]]
    else:
        in_specs += [
            pl.BlockSpec((E // 64, bf), (lambda f: (0, f)), memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 64, bf), (lambda f: (0, u_off + f)), memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 64, bf), (lambda f: (0, f)), memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 64, bf), (lambda f: (0, u_off + f)), memory_space=pltpu.VMEM),
        ]
        operands += [gu.aux["scw_lo"], u_t.aux["scw_lo"],
                     gu.aux["scw_hi"], u_t.aux["scw_hi"]]
        if not gu_sym:
            in_specs += [
                pl.BlockSpec((E // 32, bf), (lambda f: (0, f)), memory_space=pltpu.VMEM),
                pl.BlockSpec((E // 32, bf), (lambda f: (0, u_off + f)), memory_space=pltpu.VMEM),
            ]
            operands += [gu.aux["madj_t"], u_t.aux["madj_t"]]
    in_specs += [
        pl.BlockSpec((E, bf // 2), (lambda f: (0, f)), memory_space=pltpu.VMEM),
    ]
    operands += [dn.codes]
    if compact:
        in_specs += [
            pl.BlockSpec((4, bf // 64, E), (lambda f: (0, f, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf // 128, E), (lambda f: (f, 0)), memory_space=pltpu.VMEM),
        ]
        operands += [dn.aux["q6_t"], dn.aux["dd_t"]]
    else:
        in_specs += [
            pl.BlockSpec((bf // 64, E), (lambda f: (f, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf // 64, E), (lambda f: (f, 0)), memory_space=pltpu.VMEM),
        ]
        operands += [dn.aux["scw_lo"], dn.aux["scw_hi"]]
        if not dn_sym:
            in_specs += [
                pl.BlockSpec((bf // 32, E), (lambda f: (f, 0)), memory_space=pltpu.VMEM),
            ]
            operands += [dn.aux["madj_t"]]
    return pl.pallas_call(
        kernel,
        grid=(fb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bp, E), (lambda f: (0, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, E), _F32),
        scratch_shapes=[
            pltpu.VMEM((bp * NG, kc_e), jnp.int8),
            pltpu.VMEM((bp * NG, kc_e), jnp.int8),
            pltpu.VMEM((bp, nsb_e), jnp.float32),
            pltpu.VMEM((bp, gx_cols), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # 3 weight streams double-buffered (~26 MB of windows) plus the
            # in-kernel h planes: the 16 MB default scoped-vmem is too small
            vmem_limit_bytes=int(os.environ.get(
                "LKTPU_FFN_VMEM_MB", "96")) * 1024 * 1024,
        ),
    )(*operands)


def qmm_w4_ffn_or_none(x, gu, dn, **kw):
    """Megakernel dispatch with a LOUD one-time fallback: declining this
    kernel drops decode to the two-launch path (~25% slower headline), so a
    silent exception here is a silent perf regression.  Each distinct
    (shape-class, error) is warned once per process."""
    try:
        return qmm_w4_ffn_matmul(x, gu, dn, **kw)
    except Exception as e:
        from llama_kotlin_tpu.utils.warnonce import warn_once

        warn_once(
            ("ffn", x.shape[-1], gu.shape, dn.shape, type(e).__name__),
            "qmm_w4_ffn megakernel declined for gu=%s dn=%s x_k=%d "
            "(%s: %s) — decode falls back to the ~25%% slower two-launch "
            "path" % (gu.shape, dn.shape, x.shape[-1],
                      type(e).__name__, str(e)[:200]))
        return None


# ---------------------------------------------------------------------------
# Layer megakernel: o-proj + residual + RMSNorm + gated FFN in ONE launch.
# ---------------------------------------------------------------------------

def qmm_w4_layer_matmul(attn: jnp.ndarray, h_resid: jnp.ndarray,
                        o_t: QTensor, gu: QTensor, dn: QTensor,
                        norm_w: jnp.ndarray, *, eps: float,
                        act: str = "silu", norm_offset: float = 0.0,
                        interpret: bool = False,
                        max_rows: int = 8) -> Optional[jnp.ndarray]:
    """h3 = h2 + FFN(rmsnorm(h2)) with h2 = h_resid + attn @ Wo^T — the
    whole post-attention half of a pre-norm gated llama layer as ONE
    Pallas launch (grid step 0 = o-proj prologue, steps 1..fb = the FFN
    megakernel sweep above).

    Per layer per token this removes the o launch's pipeline ramp and the
    o→FFN XLA seam (stage-out of o, residual add, norm, re-stage — the
    non-overlapped gaps in the round-4/5 decode traces), and lets Wo's
    9.6 MB stream ride the same pipelined grid as the 130 MB FFN stream
    instead of paying its own ramp-dominated launch (o standalone measured
    495 GB/s vs the megakernel's ~690, STATUS.md round-5 log).

    Semantics (bit-faithful to the unfused model path, models/llama.py):
      o_out  = W4A8(attn) @ Wo^T        (same activation quantization)
      h2     = h_resid + bf16(o_out)    (bf16 residual add)
      r      = rms_norm(h2, norm_w, eps, norm_offset)   (ops/norms.py)
      ffn    = megakernel(r)            (identical to qmm_w4_ffn above)
      h3     = h2 + bf16(ffn)           (bf16 residual add)
    The one divergence from composing the separate launches is o's f32
    accumulation order (single k-sweep vs the standalone kernel's bkc
    plan), inside the usual non-associativity noise.

    Eligibility: single-chip fused gu ([gate; up], 2F x E), o square
    [E, E] un-padded, o aux flavor == gu aux flavor, everything the FFN
    megakernel already requires.  Returns h3 in h_resid's dtype, or None.
    """
    if act not in ("silu", "gelu"):
        return None
    for w in (o_t, gu, dn):
        if (not w.hi_signed or w.aux is None or "precise" in w.aux
                or w.is_stacked or w.tp_axis is not None):
            return None
    E = o_t.shape[1]
    if o_t.shape != (E, E) or o_t.k_pad != E:
        return None
    if gu.shape[1] != E or dn.shape[0] != E:
        return None
    kc_e = E // 2
    if kc_e % 1024 or (E // 64) < 32:
        return None
    f_pad = dn.k_pad
    if gu.codes.shape[0] != 2 * f_pad:
        return None  # fused [gate; up] only (the single-chip serving fold)
    compact = "q6_t" in gu.aux
    if compact != ("q6_t" in dn.aux) or compact != ("q6_t" in o_t.aux):
        return None
    gu_sym = "sym" in gu.aux
    if ("sym" in o_t.aux) != gu_sym:
        return None  # o shares the x-group-sum layout with gate/up
    dn_sym = "sym" in dn.aux
    if not compact:
        for w, sym in ((gu, gu_sym), (o_t, gu_sym), (dn, dn_sym)):
            if not sym and "madj_t" not in w.aux:
                return None
    if os.environ.get("LKTPU_W4_BCAST", "0") == "1":
        return None  # layer kernel implements the default scale path only
    bf = _plan_bf(f_pad, compact=compact)
    if bf is None:
        return None
    lead_shape = attn.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if attn.shape[-1] != E or h_resid.shape != attn.shape or b_real > max_rows:
        return None
    bp = max(2, int(2 ** math.ceil(math.log2(max(b_real, 1)))))
    a2 = attn.reshape(b_real, E).astype(jnp.float32)
    h2d = h_resid.reshape(b_real, E)
    if bp != b_real:
        a2 = jnp.pad(a2, ((0, bp - b_real), (0, 0)))
        h2d = jnp.pad(h2d, ((0, bp - b_real), (0, 0)))
    nw = norm_w.reshape(1, E).astype(jnp.float32)
    y = _qmm_w4_layer(a2, h2d, o_t, gu, dn, nw, eps=float(eps),
                      offset=float(norm_offset), bf=bf, act=act,
                      interpret=interpret)
    if y is None:
        return None
    return y[:b_real].reshape(*lead_shape, E).astype(h_resid.dtype)


def _qmm_w4_layer(a_pad, h_pad, o_t: QTensor, gu: QTensor, dn: QTensor,
                  norm_w, *, eps: float, offset: float, bf: int, act: str,
                  interpret: bool) -> Optional[jnp.ndarray]:
    E = o_t.shape[1]
    f_pad = dn.k_pad
    bp = a_pad.shape[0]
    kc_e = E // 2
    nch_e = kc_e // CHUNK
    nch_f = (bf // 2) // CHUNK
    nsb_e = E // SPAN
    nsb = bf // SPAN
    fb = f_pad // bf
    compact = "q6_t" in gu.aux
    gu_sym = "sym" in gu.aux
    dn_sym = "sym" in dn.aux
    gx_cols = kc_e // 32 if gu_sym else E // 32
    # the o stage spans nch_o pipelined grid steps (OBKC plane cols each)
    # after a prep-only step 0, so Wo's stream overlaps compute instead of
    # serializing as one whole-tensor fetch before the first step
    OBKC = 1024
    nch_o = kc_e // OBKC
    och = OBKC // CHUNK
    n_steps = 1 + nch_o + fb

    def kernel(a_ref, h_ref, nw_ref, oc_ref, *rest):
        rest = list(rest)
        oslo_ref = oshi_ref = omin_ref = None
        ocm_blk = ocm_full = None
        gslo_ref = uslo_ref = gshi_ref = ushi_ref = gmadj_ref = umadj_ref = None
        gcm = ucm = dncm = None
        dnslo_ref = dnshi_ref = dnmadj_ref = None
        if compact:
            ocm_blk = (rest.pop(0), rest.pop(0))
            ocm_full = (rest.pop(0), rest.pop(0))
        else:
            oslo_ref, oshi_ref = rest.pop(0), rest.pop(0)
            # min-term plane over the FULL contraction: scw_lo (sym) or
            # madj_t (asym), const-fetched
            omin_ref = rest.pop(0)
        gc_ref, uc_ref = rest.pop(0), rest.pop(0)
        if compact:
            gcm = (rest.pop(0), rest.pop(0))
            ucm = (rest.pop(0), rest.pop(0))
        else:
            gslo_ref, uslo_ref = rest.pop(0), rest.pop(0)
            gshi_ref, ushi_ref = rest.pop(0), rest.pop(0)
            if not gu_sym:
                gmadj_ref, umadj_ref = rest.pop(0), rest.pop(0)
        dnc_ref = rest.pop(0)
        if compact:
            dncm = (rest.pop(0), rest.pop(0))
        else:
            dnslo_ref, dnshi_ref = rest.pop(0), rest.pop(0)
            if not dn_sym:
                dnmadj_ref = rest.pop(0)
        (out_ref, bdlo_scr, bdhi_scr, sx_scr, xg_scr,
         h2_scr, facc_scr, oacc_scr) = rest
        pid = pl.program_id(0)

        def prep(xb):
            # quantize + block-diagonal planes + min-term group sums
            # (identical to qmm_w4_ffn's step-0 prep)
            lo_parts, hi_parts, d_parts, q_parts = [], [], [], []
            for s in range(nsb_e):
                xs = xb[:, s * SPAN:(s + 1) * SPAN]
                amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
                d = amax / 127.0
                safe = jnp.where(d > 0, d, 1.0)
                q = jnp.clip(jnp.round(xs / safe), -127, 127).astype(jnp.int8)
                lo_parts.append(q[:, :SPAN // 2])
                hi_parts.append(q[:, SPAN // 2:])
                d_parts.append(d)
                if not gu_sym and not compact:
                    q_parts.append(q)
            x8_lo = jnp.concatenate(lo_parts, axis=-1)
            x8_hi = jnp.concatenate(hi_parts, axis=-1)
            sx_scr[...] = jnp.concatenate(d_parts, axis=-1)
            col_blk = (jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, kc_e), 1) // 32) % NG
            row_r = jax.lax.broadcasted_iota(
                jnp.int32, (bp * NG, kc_e), 0) % NG
            keep = col_blk == row_r
            bdlo_scr[...] = jnp.where(keep, jnp.repeat(x8_lo, NG, axis=0),
                                      jnp.int8(0))
            bdhi_scr[...] = jnp.where(keep, jnp.repeat(x8_hi, NG, axis=0),
                                      jnp.int8(0))
            if compact:
                half = gx_cols // 2
                gm = (jax.lax.broadcasted_iota(
                    jnp.int32, (kc_e, half), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (kc_e, half), 1)).astype(jnp.int8)
                gs_lo = jax.lax.dot_general(
                    x8_lo, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                gs_hi = jax.lax.dot_general(
                    x8_hi, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                dcat = jnp.concatenate(
                    [d_parts[s] for s in range(nsb_e) for _ in range(4)],
                    axis=-1)
                xg_scr[...] = jnp.concatenate(
                    [gs_lo * dcat, gs_hi * dcat], axis=-1)
            else:
                if gu_sym:
                    src, rep = x8_lo, 4
                else:
                    src, rep = jnp.concatenate(q_parts, axis=-1), 8
                gm = (jax.lax.broadcasted_iota(
                    jnp.int32, (src.shape[1], gx_cols), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (src.shape[1], gx_cols), 1)).astype(jnp.int8)
                gs = jax.lax.dot_general(
                    src, gm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                xg_scr[...] = gs * jnp.concatenate(
                    [d_parts[s] for s in range(nsb_e) for _ in range(rep)],
                    axis=-1)

        def half_dot(codes_ref, sclo_ref, schi_ref, madj_ref, cm, ncols):
            # one weight tensor's [bp, ncols] product from the bd scratch
            # planes (gu_half above, with the output width a parameter)
            if compact:
                q6 = cm[0][...]
                d_all, dmin_all = split_dd(cm[1][...])
                sc_lo_all = q6[0].astype(_F32) * d_all
                sc_hi_all = q6[1].astype(_F32) * (d_all * 0.0625)
            acc = jnp.zeros((bp, ncols), _F32)
            for t in range(nch_e):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                cw = codes_ref[:, sl]
                lo_w = pltpu.bitcast(cw & jnp.uint8(0x0F), jnp.int8)
                hi_w = pltpu.bitcast(cw & jnp.uint8(0xF0), jnp.int8)
                p_lo = jax.lax.dot_general(
                    bdlo_scr[:, sl], lo_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                p_hi = jax.lax.dot_general(
                    bdhi_scr[:, sl], hi_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                gsl = slice(t * NG, (t + 1) * NG)
                if compact:
                    sc_lo = jnp.tile(sc_lo_all[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(sc_hi_all[gsl, :], (bp, 1))
                else:
                    sc_lo = jnp.tile(sclo_ref[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(schi_ref[gsl, :], (bp, 1))
                contrib = (p_lo.astype(_F32) * sc_lo.astype(_F32)
                           + p_hi.astype(_F32) * sc_hi.astype(_F32))
                sxc = jnp.concatenate(
                    [sx_scr[:, 4 * t + q:4 * t + q + 1]
                     for q in range(4) for _ in range(4)],
                    axis=1)[:, :, None]
                acc = acc + (contrib.reshape(bp, NG, ncols) * sxc).sum(axis=1)
            if compact:
                half = gx_cols // 2
                mw_lo = dmin_all * q6[2].astype(_F32)
                mw_hi = dmin_all * q6[3].astype(_F32) - 128.0 * sc_hi_all
                return (acc
                        - jax.lax.dot_general(
                            xg_scr[:, :half], mw_lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32,
                            precision=jax.lax.Precision.HIGHEST)
                        - jax.lax.dot_general(
                            xg_scr[:, half:], mw_hi, (((1,), (0,)), ((), ())),
                            preferred_element_type=_F32,
                            precision=jax.lax.Precision.HIGHEST))
            mw = (sclo_ref[...] * 8.0 if gu_sym else madj_ref[...]).astype(_F32)
            return acc - jax.lax.dot_general(
                xg_scr[...], mw, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)

        @pl.when(pid == 0)
        def _prep_stage():
            prep(a_ref[...])
            oacc_scr[...] = jnp.zeros_like(oacc_scr)

        def o_step(ostep):
            # this step's blocked refs hold plane cols
            # [ostep*OBKC, (ostep+1)*OBKC); bd/sx slices use GLOBAL indices
            if compact:
                q6b = ocm_blk[0][...]                     # [4, OBKC//32, E]
                d_b, dmin_b = split_dd(ocm_blk[1][...])   # [OBKC//32, E]
                osc_lo = q6b[0].astype(_F32) * d_b
                osc_hi = q6b[1].astype(_F32) * (d_b * 0.0625)
            acc = jnp.zeros((bp, E), _F32)
            for tl in range(och):
                tg = ostep * och + tl
                cw = oc_ref[:, tl * CHUNK:(tl + 1) * CHUNK]
                lo_w = pltpu.bitcast(cw & jnp.uint8(0x0F), jnp.int8)
                hi_w = pltpu.bitcast(cw & jnp.uint8(0xF0), jnp.int8)
                sl_g = slice(tg * CHUNK, (tg + 1) * CHUNK)
                p_lo = jax.lax.dot_general(
                    bdlo_scr[:, sl_g], lo_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                p_hi = jax.lax.dot_general(
                    bdhi_scr[:, sl_g], hi_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                gsl = slice(tl * NG, (tl + 1) * NG)
                if compact:
                    sc_lo = jnp.tile(osc_lo[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(osc_hi[gsl, :], (bp, 1))
                else:
                    sc_lo = jnp.tile(oslo_ref[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(oshi_ref[gsl, :], (bp, 1))
                contrib = (p_lo.astype(_F32) * sc_lo.astype(_F32)
                           + p_hi.astype(_F32) * sc_hi.astype(_F32))
                sxc = jnp.concatenate(
                    [sx_scr[:, 4 * tg + q:4 * tg + q + 1]
                     for q in range(4) for _ in range(4)],
                    axis=1)[:, :, None]
                acc = acc + (contrib.reshape(bp, NG, E) * sxc).sum(axis=1)
            oacc_scr[...] += acc
            if ostep != nch_o - 1:
                return
            # ---- final o step: min term (full planes), residual, norm,
            # re-prep the bd scratch from the norm output
            o_out = oacc_scr[...]
            if compact:
                q6f = ocm_full[0][...]
                d_f, dmin_f = split_dd(ocm_full[1][...])
                osc_hi_f = q6f[1].astype(_F32) * (d_f * 0.0625)
                half = gx_cols // 2
                mw_lo = dmin_f * q6f[2].astype(_F32)
                mw_hi = dmin_f * q6f[3].astype(_F32) - 128.0 * osc_hi_f
                o_out = (o_out
                         - jax.lax.dot_general(
                             xg_scr[:, :half], mw_lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=_F32,
                             precision=jax.lax.Precision.HIGHEST)
                         - jax.lax.dot_general(
                             xg_scr[:, half:], mw_hi, (((1,), (0,)), ((), ())),
                             preferred_element_type=_F32,
                             precision=jax.lax.Precision.HIGHEST))
            else:
                mw = (omin_ref[...] * 8.0 if gu_sym
                      else omin_ref[...]).astype(_F32)
                o_out = o_out - jax.lax.dot_general(
                    xg_scr[...], mw, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)
            h2 = h_ref[...] + o_out.astype(h_ref.dtype)  # bf16 residual add
            h2_scr[...] = h2
            xf = h2.astype(_F32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            # op-for-op ops/norms.rms_norm (1/sqrt, not rsqrt; two mults)
            y = xf * (1.0 / jnp.sqrt(var + eps))
            r = y * (nw_ref[...] + offset)
            prep(r.astype(h_ref.dtype).astype(_F32))  # bf16-rounded norm out
            facc_scr[...] = jnp.zeros_like(facc_scr)

        for _ostep in range(nch_o):
            pl.when(pid == 1 + _ostep)(
                lambda _o=_ostep: o_step(_o))

        @pl.when(pid > nch_o)
        def _ffn_stage():
            g = half_dot(gc_ref, gslo_ref, gshi_ref, gmadj_ref, gcm, bf)
            u = half_dot(uc_ref, uslo_ref, ushi_ref, umadj_ref, ucm, bf)
            h = (_act_f32(act, g) * u).astype(jnp.bfloat16).astype(_F32)

            lo_parts, hi_parts, d_parts, q_parts = [], [], [], []
            for s in range(nsb):
                xs = h[:, s * SPAN:(s + 1) * SPAN]
                amax = jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
                d = amax / 127.0
                safe = jnp.where(d > 0, d, 1.0)
                q = jnp.clip(jnp.round(xs / safe), -127, 127).astype(jnp.int8)
                lo_parts.append(q[:, :SPAN // 2])
                hi_parts.append(q[:, SPAN // 2:])
                d_parts.append(d)
                q_parts.append(q)
            h8_lo = jnp.concatenate(lo_parts, axis=-1)
            h8_hi = jnp.concatenate(hi_parts, axis=-1)

            def bd(p):
                rep = jnp.repeat(p, NG, axis=0)
                col_blk = (jax.lax.broadcasted_iota(
                    jnp.int32, (bp * NG, bf // 2), 1) // 32) % NG
                row_r = jax.lax.broadcasted_iota(
                    jnp.int32, (bp * NG, bf // 2), 0) % NG
                return jnp.where(col_blk == row_r, rep, jnp.int8(0))

            bd_lo, bd_hi = bd(h8_lo), bd(h8_hi)

            if compact:
                q6d = dncm[0][...]
                dD_all, dminD_all = split_dd(dncm[1][...])
                scd_lo_all = q6d[0].astype(_F32) * dD_all
                scd_hi_all = q6d[1].astype(_F32) * (dD_all * 0.0625)
            acc = jnp.zeros((bp, E), _F32)
            for t in range(nch_f):
                sl = slice(t * CHUNK, (t + 1) * CHUNK)
                dn_cw = dnc_ref[:, sl]
                dlo_w = pltpu.bitcast(dn_cw & jnp.uint8(0x0F), jnp.int8)
                dhi_w = pltpu.bitcast(dn_cw & jnp.uint8(0xF0), jnp.int8)
                p_lo = jax.lax.dot_general(
                    bd_lo[:, sl], dlo_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                p_hi = jax.lax.dot_general(
                    bd_hi[:, sl], dhi_w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                gsl = slice(t * NG, (t + 1) * NG)
                sxc = jnp.concatenate(
                    [d_parts[4 * t + q] for q in range(4) for _ in range(4)],
                    axis=1)[:, :, None]
                if compact:
                    sc_lo = jnp.tile(scd_lo_all[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(scd_hi_all[gsl, :], (bp, 1))
                else:
                    sc_lo = jnp.tile(dnslo_ref[gsl, :], (bp, 1))
                    sc_hi = jnp.tile(dnshi_ref[gsl, :], (bp, 1))
                contrib = (p_lo.astype(_F32) * sc_lo.astype(_F32)
                           + p_hi.astype(_F32) * sc_hi.astype(_F32))
                acc = acc + (contrib.reshape(bp, NG, E) * sxc).sum(axis=1)

            if compact:
                halfF = bf // 64
                gmat = (jax.lax.broadcasted_iota(
                    jnp.int32, (bf // 2, halfF), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (bf // 2, halfF), 1)).astype(jnp.int8)
                gs_lo = jax.lax.dot_general(
                    h8_lo, gmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                gs_hi = jax.lax.dot_general(
                    h8_hi, gmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                dcat_h = jnp.concatenate(
                    [d_parts[s] for s in range(nsb) for _ in range(4)], axis=1)
                mw_lo = dminD_all * q6d[2].astype(_F32)
                mw_hi = dminD_all * q6d[3].astype(_F32) - 128.0 * scd_hi_all
                acc = acc - jax.lax.dot_general(
                    gs_lo * dcat_h, mw_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)
                acc = acc - jax.lax.dot_general(
                    gs_hi * dcat_h, mw_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)
            elif dn_sym:
                gmat = (jax.lax.broadcasted_iota(
                    jnp.int32, (bf // 2, bf // 64), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (bf // 2, bf // 64), 1)).astype(jnp.int8)
                gs = jax.lax.dot_general(
                    h8_lo, gmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                xg_h = gs * jnp.concatenate(
                    [d_parts[s] for s in range(nsb) for _ in range(4)], axis=1)
                acc = acc - 8.0 * jax.lax.dot_general(
                    xg_h, dnslo_ref[...].astype(_F32), (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                h8_el = jnp.concatenate(q_parts, axis=-1)
                gmat = (jax.lax.broadcasted_iota(
                    jnp.int32, (bf, bf // 32), 0) // 32
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (bf, bf // 32), 1)).astype(jnp.int8)
                gs = jax.lax.dot_general(
                    h8_el, gmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(_F32)
                xg_h = gs * jnp.concatenate(
                    [d_parts[s] for s in range(nsb) for _ in range(8)], axis=1)
                acc = acc - jax.lax.dot_general(
                    xg_h, dnmadj_ref[...].astype(_F32), (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)
            facc_scr[...] += acc

            @pl.when(pid == n_steps - 1)
            def _fin():
                # bf16 residual add, matching the model's
                # h3 = h2 + down.astype(h.dtype)
                out_ref[...] = (h2_scr[...]
                                + facc_scr[...].astype(out_ref.dtype))

    # ---- operands / specs -------------------------------------------------
    c0 = lambda s: (0, 0)
    # o stage occupies grid steps 1..nch_o; FFN blocks start at 1 + nch_o
    ob = lambda s: (0, jnp.clip(s - 1, 0, nch_o - 1))
    obr = lambda s: (jnp.clip(s - 1, 0, nch_o - 1), 0)
    fidx = lambda s: jnp.clip(s - 1 - nch_o, 0, fb - 1)
    ff = lambda s: (fidx(s), 0)
    ffu = lambda s: (fb + fidx(s), 0)
    fcol = lambda s: (0, fidx(s))
    fcolu = lambda s: (0, fb + fidx(s))
    in_specs = [
        pl.BlockSpec((bp, E), c0, memory_space=pltpu.VMEM),          # attn
        pl.BlockSpec((bp, E), c0, memory_space=pltpu.VMEM),          # h_resid
        pl.BlockSpec((1, E), c0, memory_space=pltpu.VMEM),           # norm_w
        pl.BlockSpec((E, OBKC), ob, memory_space=pltpu.VMEM),        # o codes
    ]
    operands = [a_pad, h_pad, norm_w, o_t.codes]
    if compact:
        in_specs += [
            # per-step scale blocks + full planes for the final min term
            pl.BlockSpec((4, OBKC // 32, E),
                         (lambda s: (0, jnp.clip(s - 1, 0, nch_o - 1), 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OBKC // 64, E), obr, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, E // 64, E), (lambda s: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 128, E), c0, memory_space=pltpu.VMEM),
        ]
        operands += [o_t.aux["q6_t"], o_t.aux["dd_t"],
                     o_t.aux["q6_t"], o_t.aux["dd_t"]]
    else:
        in_specs += [
            pl.BlockSpec((OBKC // 32, E), obr, memory_space=pltpu.VMEM),
            pl.BlockSpec((OBKC // 32, E), obr, memory_space=pltpu.VMEM),
            # full min-term plane: scw_lo (sym) or madj_t (asym)
            pl.BlockSpec((E // 64, E) if gu_sym else (E // 32, E), c0,
                         memory_space=pltpu.VMEM),
        ]
        operands += [o_t.aux["scw_lo"], o_t.aux["scw_hi"],
                     o_t.aux["scw_lo"] if gu_sym else o_t.aux["madj_t"]]
    in_specs += [
        pl.BlockSpec((bf, kc_e), ff, memory_space=pltpu.VMEM),       # gate
        pl.BlockSpec((bf, kc_e), ffu, memory_space=pltpu.VMEM),      # up
    ]
    operands += [gu.codes, gu.codes]
    if compact:
        in_specs += [
            pl.BlockSpec((4, E // 64, bf), (lambda s: (0, 0, fidx(s))),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 128, bf), fcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, E // 64, bf),
                         (lambda s: (0, 0, fb + fidx(s))),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 128, bf), fcolu, memory_space=pltpu.VMEM),
        ]
        operands += [gu.aux["q6_t"], gu.aux["dd_t"],
                     gu.aux["q6_t"], gu.aux["dd_t"]]
    else:
        in_specs += [
            pl.BlockSpec((E // 64, bf), fcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 64, bf), fcolu, memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 64, bf), fcol, memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 64, bf), fcolu, memory_space=pltpu.VMEM),
        ]
        operands += [gu.aux["scw_lo"], gu.aux["scw_lo"],
                     gu.aux["scw_hi"], gu.aux["scw_hi"]]
        if not gu_sym:
            in_specs += [
                pl.BlockSpec((E // 32, bf), fcol, memory_space=pltpu.VMEM),
                pl.BlockSpec((E // 32, bf), fcolu, memory_space=pltpu.VMEM),
            ]
            operands += [gu.aux["madj_t"], gu.aux["madj_t"]]
    in_specs += [pl.BlockSpec((E, bf // 2), fcol, memory_space=pltpu.VMEM)]
    operands += [dn.codes]
    if compact:
        in_specs += [
            pl.BlockSpec((4, bf // 64, E), (lambda s: (0, fidx(s), 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf // 128, E), ff, memory_space=pltpu.VMEM),
        ]
        operands += [dn.aux["q6_t"], dn.aux["dd_t"]]
    else:
        in_specs += [
            pl.BlockSpec((bf // 64, E), ff, memory_space=pltpu.VMEM),
            pl.BlockSpec((bf // 64, E), ff, memory_space=pltpu.VMEM),
        ]
        operands += [dn.aux["scw_lo"], dn.aux["scw_hi"]]
        if not dn_sym:
            in_specs += [pl.BlockSpec((bf // 32, E), ff,
                                      memory_space=pltpu.VMEM)]
            operands += [dn.aux["madj_t"]]
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bp, E), (lambda s: (0, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, E), h_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((bp * NG, kc_e), jnp.int8),
            pltpu.VMEM((bp * NG, kc_e), jnp.int8),
            pltpu.VMEM((bp, nsb_e), jnp.float32),
            pltpu.VMEM((bp, gx_cols), jnp.float32),
            pltpu.VMEM((bp, E), h_pad.dtype),
            pltpu.VMEM((bp, E), jnp.float32),
            pltpu.VMEM((bp, E), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(os.environ.get(
                "LKTPU_FFN_VMEM_MB", "96")) * 1024 * 1024,
        ),
    )(*operands)


def qmm_w4_layer_or_none(attn, h_resid, o_t, gu, dn, norm_w, **kw):
    """Layer-megakernel dispatch with the same loud-fallback contract as
    qmm_w4_ffn_or_none."""
    try:
        return qmm_w4_layer_matmul(attn, h_resid, o_t, gu, dn, norm_w, **kw)
    except Exception as e:
        from llama_kotlin_tpu.utils.warnonce import warn_once

        warn_once(
            ("layer", attn.shape[-1], gu.shape, dn.shape, type(e).__name__),
            "qmm_w4_layer megakernel declined for o=%s gu=%s dn=%s "
            "(%s: %s) — decode falls back to the separate o+FFN launches"
            % (o_t.shape, gu.shape, dn.shape,
               type(e).__name__, str(e)[:200]))
        return None
