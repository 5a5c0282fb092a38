"""Flash attention over the unified cell cache (Pallas TPU).

Computes the same masked GQA attention as ops/attention.py's reference
(the TPU-native analogue of llm_build_kqv's ggml_flash_attn_ext path,
reference src/llama.cpp:8826) without materialising [nt, cells] scores in
HBM: online-softmax accumulation over cell tiles.

Shapes: q [nt, H, D], k/v [KV, cells, D] (head-major cache layout),
mask int8/bool [nt, cells].  Grid (head, cell_tile); the q block and the
f32 accumulator live in VMEM across the cell sweep.  GQA maps query head
h to kv head h // (H // KV) in the k/v index maps.

Two serving-critical extensions over the reference design:
- `n_vis` bounds the cell sweep: the kernel reads only the first n_vis
  cells of the (larger) cache arrays, so attention cost scales with the
  bucketed live span, not allocated cells — no slice copy, the grid just
  stops early (the analogue of the reference's cache-prefix views,
  llama.cpp build path n_kv = cell range).
- int8 quantized K/V (type_k/type_v analogue, include/llama.h:304-311):
  codes ride the MXU dots raw and the per-row scales fold into the score
  tile (K) and the probability tile (V) — one [nt, Ct] multiply each,
  never a dequantized tile in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _sc_row(ref, hh):
    """One head's [Ct] scale row: 2D [kvps, Ct] blocks on the decode path
    (layout-free collapse of the cache's [L, KV, cells] planes) or 3D
    [kvps, 1, Ct] when the head block isn't a sublane multiple (see the
    call-site comment)."""
    return ref[hh] if len(ref.shape) == 2 else ref[hh, 0]


def _kernel(q_ref, k_ref, v_ref, mask_ref, *rest,
            scale, logit_softcap, n_ctiles, quantized, bits):
    """Per-grid-step attention over the kv heads in the block.

    Blocks carry `kvps` kv heads ([kvps, R, D] q where R = rep*nt rows per
    kv head, [kvps, Ct, Dk] k/v); a static python loop attends each head
    slice with its own rows of the stats scratch.  kvps=1 with R=nt is the
    per-query-head prefill sweep; decode packs every kv head (GQA) or 128
    rows' worth of heads (MHA) into one grid step, so the cell sweep costs
    one step instead of H (round-1 device trace: 36us/layer at nt=8, H=32
    — grid-step-overhead bound)."""
    if quantized:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = rest
    else:
        out_ref, acc_ref, m_ref, l_ref = rest
    c_i = pl.program_id(1)

    @pl.when(c_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    kvps = q_ref.shape[-3]
    for hh in range(kvps):
        _attend_head(q_ref, k_ref, v_ref, mask_ref,
                     ks_ref if quantized else None,
                     vs_ref if quantized else None,
                     out_ref, acc_ref, m_ref, l_ref,
                     hh=hh, c_i=c_i, scale=scale, logit_softcap=logit_softcap,
                     n_ctiles=n_ctiles, quantized=quantized, bits=bits)


def _attend_head(q_ref, k_ref, v_ref, mask_ref, ks_ref, vs_ref,
                 out_ref, acc_ref, m_ref, l_ref, *, hh, c_i,
                 scale, logit_softcap, n_ctiles, quantized, bits):
    # k/v blocks may carry a leading layer axis of size 1 (4D whole-cache
    # operands with a static-layer index map — the unrolled decode path
    # passes the ENTIRE stacked cache so XLA never materialises an 8 MB
    # per-layer slice copy); load one head tile either way
    kt = (lambda: k_ref[0, hh]) if len(k_ref.shape) == 4 else (lambda: k_ref[hh])
    vt = (lambda: v_ref[0, hh]) if len(v_ref.shape) == 4 else (lambda: v_ref[hh])
    q = q_ref[hh].astype(jnp.float32)  # [R, D]
    rs = hh  # per-head plane of the [kvps, R, ...] stats scratch
    vd = acc_ref.shape[-1]
    if quantized and bits == 4:
        # packed int4 K tile [Ct, D/2]: byte j = (code_j + 8) | the
        # two's-complement code_{j+D/2} << 4, so two byte-wide ANDs unpack
        # both planes (no shifts — the W4 weight-kernel scheme).  The lo
        # plane's +8 bias folds into a per-query-row constant and the hi
        # plane's 16x into the matching q columns.
        kb = kt()
        kl = pltpu.bitcast(kb & jnp.uint8(0x0F), jnp.int8).astype(jnp.float32)
        kh = pltpu.bitcast(kb & jnp.uint8(0xF0), jnp.int8).astype(jnp.float32)
        d2 = kb.shape[-1]
        ku = jnp.concatenate([kl, kh], axis=-1)  # [Ct, D] plane order
        qadj = jnp.concatenate([q[:, :d2], q[:, d2:] * (1.0 / 16.0)], axis=-1)
        s = jax.lax.dot_general(
            qadj, ku, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s - 8.0 * jnp.sum(q[:, :d2], axis=-1, keepdims=True)
        s = s * scale * _sc_row(ks_ref, hh)[None, :]
    else:
        k = kt().astype(jnp.float32)  # [Ct, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [R, Ct]
        if quantized:  # fold per-cell K scales into the score columns
            s = s * _sc_row(ks_ref, hh)[None, :]
    if logit_softcap > 0.0:
        s = jnp.tanh(s / logit_softcap) * logit_softcap
    visible = mask_ref[...] != 0
    s = jnp.where(visible, s, NEG_INF)

    m_prev = m_ref[rs]  # [R, 128] replicated stats
    l_prev = l_ref[rs]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [R, 1]
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)  # [R, 128]
    p = jnp.exp(s - m_new[:, :1])  # [R, Ct]
    p = jnp.where(visible, p, 0.0)
    l_ref[rs] = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
    )
    m_ref[rs] = m_new
    if quantized and bits == 4:
        vb = vt()  # [Ct, Dv/2] packed
        vl = pltpu.bitcast(vb & jnp.uint8(0x0F), jnp.int8).astype(jnp.float32)
        vh = pltpu.bitcast(vb & jnp.uint8(0xF0), jnp.int8).astype(jnp.float32)
        vu = jnp.concatenate([vl, vh], axis=-1)  # [Ct, Dv] plane order
        pt = p * _sc_row(vs_ref, hh)[None, :]
        pv = jax.lax.dot_general(
            pt, vu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [R, Dv]
        dv2 = vb.shape[-1]
        psum = jnp.sum(pt, axis=-1, keepdims=True)
        pv = jnp.concatenate(
            [pv[:, :dv2] - 8.0 * psum, pv[:, dv2:] * (1.0 / 16.0)], axis=-1)
    else:
        v = vt().astype(jnp.float32)  # [Ct, D]
        if quantized:  # fold per-cell V scales into the probability columns
            p = p * _sc_row(vs_ref, hh)[None, :]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [R, D]
    acc_ref[rs] = acc_ref[rs] * alpha[:, :vd] + pv

    @pl.when(c_i == n_ctiles - 1)
    def _final():
        l = l_ref[rs][:, :vd]
        safe = jnp.where(l > 0.0, l, 1.0)
        out_ref[hh] = (acc_ref[rs] / safe).astype(out_ref.dtype)


def flash_attention(q, k, v, mask, *, scale: float, logit_softcap: float = 0.0,
                    k_scale=None, v_scale=None, n_vis: Optional[int] = None,
                    out_dtype=None, kv_bits: int = 8, layer: Optional[int] = None,
                    interpret: bool = False) -> Optional[jnp.ndarray]:
    """q [nt, H, D], k/v [KV, cells, D], mask [nt, n_vis] -> [nt, H, D].

    n_vis (static) bounds the cell sweep to a prefix of the cache;
    defaults to the mask's cell extent.  k_scale/v_scale [KV, cells] f32
    enable the quantized cache path: int8 codes (kv_bits=8) or packed
    int4 nibbles in [KV, cells, D/2] uint8 arrays (kv_bits=4, the
    type_k/type_v=q4_0 analogue — half the cache HBM traffic).

    layer (static int) selects a layer of 4D whole-cache operands
    k/v [L, KV, cells, Dk] (+ scales [L, KV, cells]): the layer index is
    baked into the BlockSpec index maps, so the kernel streams tiles
    straight from the stacked cache — the unrolled decode path would
    otherwise materialise an 8 MB per-layer slice copy per operand per
    layer (round-3 device trace: slice-start/copy-start dominated MHA
    decode)."""
    nt, h, d = q.shape
    layered = layer is not None
    if layered != (k.ndim == 4):
        return None
    kv, cells = k.shape[-3], k.shape[-2]
    n_vis = n_vis if n_vis is not None else mask.shape[1]
    if h % kv != 0 or d not in (64, 128, 192, 256) or n_vis > cells:
        return None
    quantized = k_scale is not None
    packed = 2 if (quantized and kv_bits == 4) else 1
    if k.shape[-1] != d // packed:
        return None
    vd = v.shape[-1] * packed  # MLA (deepseek2): v head dim < q/k dim
    if vd not in (64, 128, 192, 256):
        return None
    rep = h // kv
    ct = next((c for c in (512, 256, 128) if n_vis % c == 0), 0)
    if ct == 0:
        return None
    n_ctiles = n_vis // ct
    if mask.shape[1] != n_vis:
        return None

    qh = q.swapaxes(0, 1)  # [H, nt, D]
    mask_i8 = mask.astype(jnp.int8) if mask.dtype != jnp.int8 else mask
    out_dtype = out_dtype or q.dtype

    # Head grouping (decode hot path).  A per-query-head grid re-reads
    # every k/v tile rep times and issues tiny [nt, D] dots (round-1
    # device trace: 36us/layer at nt=8, H=32 — grid-step-overhead bound).
    # Two stacked remedies:
    # - GQA: q [H, nt, D] -> [KV, rep*nt, D] (row r*nt + t = head g*rep+r,
    #   token t) so one grid step serves a kv head's whole rep group — k/v
    #   HBM traffic and grid steps drop by rep and the MXU sees
    #   [rep*nt, D] row blocks.
    # - kvps: pack several kv heads' tiles into one block ([kvps, Ct, Dk])
    #   and loop over them in-kernel, each head on its own rows of the
    #   shared stats scratch — the MHA (rep=1) analogue, where per-head
    #   q rows can't be stacked because every head has distinct k/v.
    # Gated to r_rows <= 256 so prefill buckets keep the per-head sweep
    # (score tiles stay small); kvps is VMEM-bounded so k+v blocks stay
    # under ~4MB (double-buffered fits comfortably in 16MB VMEM).
    r_rows = rep * nt
    grouped = r_rows <= 256
    if grouped:
        qh = qh.reshape(kv, r_rows, d)
        if rep > 1:
            mask_i8 = jnp.tile(mask_i8, (rep, 1))
        kv_tile_bytes = ct * (k.shape[-1] * k.dtype.itemsize
                              + v.shape[-1] * v.dtype.itemsize)
        kvps = 1
        for c in range(2, kv + 1):
            if kv % c == 0 and c * r_rows <= 256 \
                    and c * kv_tile_bytes <= 4 * 1024 * 1024:
                kvps = c
        groups = kv // kvps
        if layered:
            kv_map = lambda gi, ci: (layer, gi, ci, 0)
            # scales ride [L*KV, 1, cells]; first dim is in kvps-blocks
            sc_map = lambda gi, ci: ((layer * kv) // kvps + gi, 0, ci)
        else:
            kv_map = lambda gi, ci: (gi, ci, 0)
            sc_map = lambda gi, ci: (gi, 0, ci)
    else:
        groups, r_rows, kvps = h, nt, 1
        if layered:
            kv_map = lambda gi, ci: (layer, gi // rep, ci, 0)
            sc_map = lambda gi, ci: (layer * kv + gi // rep, 0, ci)
        else:
            kv_map = lambda gi, ci: (gi // rep, ci, 0)
            sc_map = lambda gi, ci: (gi // rep, 0, ci)

    grid = (groups, n_ctiles)
    kvb = ((1, kvps, ct) if layered else (kvps, ct))
    in_specs = [
        pl.BlockSpec((kvps, r_rows, d), (lambda gi, ci: (gi, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec(kvb + (k.shape[-1],), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(kvb + (v.shape[-1],), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((r_rows, ct), (lambda gi, ci: (0, ci)), memory_space=pltpu.VMEM),
    ]
    operands = [qh, k, v, mask_i8]
    if quantized:
        if kvps % 8 == 0:
            # Decode path (head block a sublane multiple): scales ride 2D
            # [L*KV, cells] — a LAYOUT-FREE collapse of the cache's
            # [L, KV, cells] f32 planes (kvps % 8 == 0 implies KV % 8 == 0,
            # so the collapse keeps bytes identical) with (kvps, ct)
            # blocks.  The previous [.., 1, cells] operand forced XLA to
            # relayout both whole scale planes (sublane dim 1 pads to 8)
            # EVERY STEP inside the decode loop — an O(L*KV*cells) strided
            # DMA storm that grew with context: round-5 device trace at 8k
            # cells showed 161 ms/step of slice-starts and q8_0 KV running
            # 4.1x SLOWER than bf16 at 32k.
            sc2 = lambda gi, ci: sc_map(gi, ci)[::2]  # (row, 0, ci) -> (row, ci)
            in_specs += [
                pl.BlockSpec((kvps, ct), sc2, memory_space=pltpu.VMEM),
                pl.BlockSpec((kvps, ct), sc2, memory_space=pltpu.VMEM),
            ]
            shape2 = (k.shape[0] * kv, cells) if layered else (kv, cells)
            operands += [k_scale.astype(jnp.float32).reshape(shape2),
                         v_scale.astype(jnp.float32).reshape(shape2)]
        else:
            # Per-head prefill sweep (kvps=1) and odd head counts: scales
            # ride as [KV, 1, cells] so the block's last-two dims are
            # (1, ct) — Mosaic requires second-minor block dims divisible
            # by 8 or equal to the array dim, which a bare [KV, cells]
            # layout breaks whenever the head-block count isn't a sublane
            # multiple.  The relayout this forces is amortised across the
            # prefill batch; decode never takes this branch for KV % 8 == 0
            # models.
            in_specs += [
                pl.BlockSpec((kvps, 1, ct), sc_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((kvps, 1, ct), sc_map, memory_space=pltpu.VMEM),
            ]
            if layered:  # [L, KV, cells] -> [L*KV, 1, cells]
                nL = k.shape[0]
                operands += [
                    k_scale.astype(jnp.float32).reshape(nL * kv, 1, cells),
                    v_scale.astype(jnp.float32).reshape(nL * kv, 1, cells)]
            else:
                operands += [k_scale.astype(jnp.float32)[:, None, :],
                             v_scale.astype(jnp.float32)[:, None, :]]
    out = pl.pallas_call(
        lambda *refs: _kernel(*refs, scale=scale, logit_softcap=logit_softcap,
                              n_ctiles=n_ctiles, quantized=quantized,
                              bits=kv_bits),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((kvps, r_rows, vd), (lambda gi, ci: (gi, 0, 0)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups * kvps, r_rows, vd), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kvps, r_rows, vd), jnp.float32),
            # softmax stats replicate across >= vd lanes (alpha slices to
            # the acc width, so 128 lanes alone break vd=192/256 heads)
            pltpu.VMEM((kvps, r_rows, max(128, vd)), jnp.float32),
            pltpu.VMEM((kvps, r_rows, max(128, vd)), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*operands)
    return out.reshape(h, nt, vd).swapaxes(0, 1)


def flash_attention_or_none(q, k, v, mask, *, scale, logit_softcap=0.0,
                            k_scale=None, v_scale=None, n_vis=None,
                            out_dtype=None, kv_bits=8, layer=None,
                            interpret=False):
    try:
        return flash_attention(q, k, v, mask, scale=scale,
                               logit_softcap=logit_softcap, k_scale=k_scale,
                               v_scale=v_scale, n_vis=n_vis,
                               out_dtype=out_dtype, kv_bits=kv_bits,
                               layer=layer, interpret=interpret)
    except Exception:
        return None
