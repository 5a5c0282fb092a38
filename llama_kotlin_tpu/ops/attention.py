"""Attention over the unified KV cell cache.

Design (TPU-first redesign of the reference's KQ-mask attention,
llm_build_kqv src/llama.cpp:8826): all sequences share one cell array; each
query token carries (pos, seq) and each cache cell carries (pos, seq-bitmask).
The attention mask is computed on device from this metadata, so continuous
batching, multi-sequence decode, sliding-window and causal masking all fall
out of one formula and the shapes stay static for XLA:

    visible[t, c] = (cell_seq_mask[c] >> token_seq[t]) & 1
                    and cell_pos[c] <= token_pos[t]
                    and token_pos[t] - cell_pos[c] < window   (if SWA)

Empty cells have cell_pos = -1 and an empty seq mask.  ALiBi slopes and
Gemma-2-style logit softcapping are supported like soft_max_ext.

The jnp path below is the reference; the Pallas flash kernel
(ops/pallas/flash.py) computes the same thing blockwise without
materialising [nt, cells] scores in HBM.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def alibi_slopes(n_head: int, max_bias: float) -> jnp.ndarray:
    """Per-head ALiBi slopes, matching ggml_compute_forward_soft_max's
    m0/m1 geometric schedule (reference ggml/src/ggml.c soft_max_ext):
    heads below the largest power of two get m0^(h+1); the rest interleave
    with m1^(2(h-n0)+1)."""
    import math

    n0 = 2 ** math.floor(math.log2(n_head))
    m0 = 2.0 ** (-max_bias / n0)
    m1 = 2.0 ** (-max_bias / 2.0 / n0)
    heads = jnp.arange(n_head)
    lo = m0 ** (heads + 1).astype(jnp.float32)
    hi = m1 ** (2 * (heads - n0) + 1).astype(jnp.float32)
    return jnp.where(heads < n0, lo, hi).astype(jnp.float32)


def visibility_mask(token_pos: jnp.ndarray, token_seq: jnp.ndarray,
                    cell_pos: jnp.ndarray, cell_seq_mask: jnp.ndarray,
                    window: int = 0, causal: bool = True) -> jnp.ndarray:
    """Boolean [nt, cells] visibility from cache-cell metadata.
    causal=False gives encoder-style bidirectional attention (bert)."""
    seq_ok = ((cell_seq_mask[None, :] >> token_seq[:, None]) & 1) != 0
    live = cell_pos[None, :] >= 0
    vis = seq_ok & live
    if causal:
        vis = vis & (cell_pos[None, :] <= token_pos[:, None])
    if window > 0:
        vis = vis & (token_pos[:, None] - cell_pos[None, :] < window)
    return vis


def attention(
    q: jnp.ndarray,  # [nt, n_head, head_dim]
    k_cache: jnp.ndarray,  # [n_kv_head, cells, head_dim]
    v_cache: jnp.ndarray,  # [n_kv_head, cells, head_dim]
    mask: jnp.ndarray,  # bool [nt, n_vis]
    *,
    scale: float,
    logit_softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,  # [n_head]
    token_pos: Optional[jnp.ndarray] = None,
    cell_pos: Optional[jnp.ndarray] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [n_kv_head, cells] (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
    kv_bits: int = 8,  # 4 = packed-nibble cache arrays [KV, cells, D/2]
    allow_pallas: bool = True,
    tp: int = 1,  # KV-head axis TP degree (KVCache.tp) — shard_map the kernel
    layer: Optional[int] = None,  # static layer index for 4D [L, KV, cells, D]
) -> jnp.ndarray:
    """Masked multi-head attention with GQA; returns [nt, n_head, head_dim].

    Scores in f32; output in q.dtype.  The cache arrays may be LARGER than
    the mask's cell extent (used-prefix bucketing): only the first
    mask.shape[1] cells are attended.  k_scale/v_scale mark an
    int8-quantized cache (per-row scales, runtime/kv_cache.py).

    tp > 1: the cache is head-sharded over the active mesh's tp axis
    (parallel/sharding.shard_cache) — the flash kernel runs per-shard
    under jax.shard_map (heads are independent, no collective).

    layer: pass the WHOLE stacked 4D cache with a static layer index —
    the flash kernel selects the layer in its BlockSpecs, so the unrolled
    decode path never materialises per-layer slice copies (round-3 device
    trace: those copies dominated MHA decode).  The non-flash fallback
    slices (XLA fuses a pure read slice).
    """
    from llama_kotlin_tpu.ops.qmatmul import _interpret_forced, _use_pallas

    n_vis = mask.shape[1]
    layered = k_cache.ndim == 4
    if (allow_pallas and _use_pallas()
            and n_vis <= int(os.environ.get("LKTPU_FLASH_XLA_BELOW", "0"))):
        # short-context escape hatch: at tiny visibility the flash launch
        # is pure ramp (~10 us/layer) while the XLA fallback fuses into
        # the surrounding graph — A/B knob for the decode headline
        allow_pallas = False
    if allow_pallas and alibi_slopes is None and _use_pallas():
        from llama_kotlin_tpu.ops.pallas.flash import flash_attention_or_none

        if tp > 1 and not layered:
            out = _tp_attention(q, k_cache, v_cache, mask, scale=scale,
                                logit_softcap=logit_softcap, k_scale=k_scale,
                                v_scale=v_scale, n_vis=n_vis, kv_bits=kv_bits,
                                tp=tp)
            if out is not None:
                return out
        elif tp == 1:
            out = flash_attention_or_none(q, k_cache, v_cache, mask,
                                          scale=scale, logit_softcap=logit_softcap,
                                          k_scale=k_scale, v_scale=v_scale,
                                          n_vis=n_vis, kv_bits=kv_bits,
                                          layer=layer if layered else None,
                                          interpret=_interpret_forced())
            if out is not None:
                return out
    if layered:
        k_cache, v_cache = k_cache[layer], v_cache[layer]
        if k_scale is not None:
            k_scale, v_scale = k_scale[layer], v_scale[layer]
    kf = k_cache[:, :n_vis]
    vf = v_cache[:, :n_vis]
    if k_scale is not None:
        from llama_kotlin_tpu.runtime.kv_cache import dequantize_cache_layer

        kf = dequantize_cache_layer(kf, k_scale[:, :n_vis], bits=kv_bits)
        vf = dequantize_cache_layer(vf, v_scale[:, :n_vis], bits=kv_bits)
    return attention_reference(
        q, kf, vf, mask, scale=scale, logit_softcap=logit_softcap,
        alibi_slopes=alibi_slopes, token_pos=token_pos, cell_pos=cell_pos,
    )


def _tp_attention(q, k_cache, v_cache, mask, *, scale, logit_softcap,
                  k_scale, v_scale, n_vis, kv_bits, tp):
    """Flash attention per-shard under jax.shard_map over the tp-split head
    axis (XLA cannot partition the Pallas custom call).  q [nt, H, D] splits
    on H; the cache layer [KV, cells, D] and per-row scales split on KV;
    the mask replicates.  GQA grouping is shard-local (H/tp : KV/tp keeps
    the same rep ratio).  Falls back inside the shard to the reference
    attention (numerics-identical math) if the kernel declines the local
    shapes; returns None when no mesh is active or heads don't divide."""
    from llama_kotlin_tpu.ops.pallas.flash import flash_attention_or_none
    from llama_kotlin_tpu.ops.qmatmul import _interpret_forced
    from llama_kotlin_tpu.parallel.mesh import get_active_mesh
    from jax.sharding import PartitionSpec as P

    mesh = get_active_mesh()
    if mesh is None:
        return None
    mesh_tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
    h, kv = q.shape[1], k_cache.shape[0]
    if mesh_tp != tp or h % tp or kv % tp:
        return None
    quant = k_scale is not None
    itp = _interpret_forced()

    def f(ql, kl, vl, ml, *rest):
        ksl, vsl = rest if rest else (None, None)
        out = flash_attention_or_none(ql, kl, vl, ml, scale=scale,
                                      logit_softcap=logit_softcap,
                                      k_scale=ksl, v_scale=vsl, n_vis=n_vis,
                                      kv_bits=kv_bits, interpret=itp)
        if out is not None:
            return out
        kf, vf = kl[:, :n_vis], vl[:, :n_vis]
        if ksl is not None:
            from llama_kotlin_tpu.runtime.kv_cache import dequantize_cache_layer

            kf = dequantize_cache_layer(kf, ksl[:, :n_vis], bits=kv_bits)
            vf = dequantize_cache_layer(vf, vsl[:, :n_vis], bits=kv_bits)
        return attention_reference(ql, kf.astype(ql.dtype), vf.astype(ql.dtype),
                                   ml, scale=scale, logit_softcap=logit_softcap)

    args = [q, k_cache, v_cache, mask]
    in_specs = [P(None, "tp", None), P("tp", None, None),
                P("tp", None, None), P(None, None)]
    if quant:
        args += [k_scale, v_scale]
        in_specs += [P("tp", None), P("tp", None)]
    fn = jax.shard_map(f, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=P(None, "tp", None), check_vma=False)
    return fn(*args)


def attention_reference(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    scale: float,
    logit_softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    token_pos: Optional[jnp.ndarray] = None,
    cell_pos: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    nt, n_head, head_dim = q.shape
    n_kv, cells, _ = k_cache.shape
    rep = n_head // n_kv

    qf = q.astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    # [nt, n_head, cells] — group query heads onto their kv head
    qg = qf.reshape(nt, n_kv, rep, head_dim)
    scores = jnp.einsum("tgrd,gcd->tgrc", qg, kf) * scale
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if alibi_slopes is not None:
        # ALiBi bias: -slope * |token_pos - cell_pos| (llama_set_inputs uses
        # -fabs so the same form covers bidirectional jina-bert-v2)
        bias = -jnp.abs(token_pos[:, None] - cell_pos[None, :]).astype(jnp.float32)
        slopes = alibi_slopes.reshape(1, n_kv, rep, 1)
        scores = scores + slopes * bias[:, None, None, :]
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # fully-masked rows (no visible cells) -> zero output, not NaN
    any_visible = jnp.any(mask, axis=-1)[:, None, None, None]
    probs = jnp.where(any_visible, probs, 0.0)
    out = jnp.einsum("tgrc,gcd->tgrd", probs, vf)
    return out.reshape(nt, n_head, v_cache.shape[-1]).astype(q.dtype)
