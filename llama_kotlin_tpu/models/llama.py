"""Llama-family decoder (functional, jit-once).

TPU-first redesign of the reference graph builders (build_llama,
src/llama.cpp:9558, plus the shared helpers llm_build_norm/ffn/kqv/kv):
instead of rebuilding an op graph every ubatch, one jitted function with
static shapes (n_tokens bucket x cell count) executes the whole step.
Continuous batching works on a flat token list — each token carries
(pos, seq) like llama_ubatch — and attention visibility comes from cache
cell metadata (see ops/attention.py), so mixed prefill+decode across many
sequences is ONE program.

Covers: LLaMA 1/2/3 (+GQA +rope freq-factors), Mistral, TinyLlama, Qwen2
(qkv bias), Gemma 1/2 (gelu, embd scale, norm offset, logit softcaps,
sliding window, pre/post-ffn norms), StableLM-ish variants via config.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Optional

import jax
import jax.numpy as jnp

from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.ops.activations import ACTIVATIONS
from llama_kotlin_tpu.ops.attention import alibi_slopes, attention, visibility_mask
from llama_kotlin_tpu.ops.norms import layer_norm, rms_norm
from llama_kotlin_tpu.ops.qmatmul import (qmatmul, qmm_ffn, qmm_layer,
                                          take_rows)
from llama_kotlin_tpu.ops.rope import apply_rope
from llama_kotlin_tpu.runtime.kv_cache import KVCache


def layer_params(p: dict, i: int) -> dict:
    return p["layers"][i]


def can_stack(params: dict, cfg: ModelConfig) -> bool:
    """Layers can scan when uniform in structure (llama-family yes; models
    with per-layer mask patterns like gemma2 SWA use the unrolled path)."""
    layers = params.get("layers")
    if not layers or len(layers) < 2 or cfg.swa_window > 0:
        return False
    if cfg.max_alibi_bias > 0:  # ALiBi needs the reference attention path
        return False
    if cfg.n_head_arr or cfg.n_head_kv_arr or cfg.n_ff_arr:
        return False  # per-layer shapes (openelm) can't ride one scan body
    keys = set(layers[0])
    return all(set(l) == keys for l in layers)


def stack_layers(params: dict) -> dict:
    """Stack per-layer weights along a leading L axis for lax.scan.

    QTensor leaves stack per-array; static metadata stays per-layer-shaped
    (scan slices the leading axis back off inside the loop).
    """
    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    out["n_layer"] = len(layers)
    return out


def forward(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [nt] int32
    token_pos: jnp.ndarray,  # [nt] int32
    token_seq: jnp.ndarray,  # [nt] int32 sequence index per token
    slots: jnp.ndarray,  # [nt] int32 cache cell index per token
    cache: KVCache,
    cell_pos: jnp.ndarray,  # [cells] int32 (post-insert metadata)
    cell_seq: jnp.ndarray,  # [cells] int32 bitmask
    out_ids: jnp.ndarray,  # [n_out] int32 token rows to produce logits for
    *,
    compute_dtype=jnp.bfloat16,
    collect_stats: bool = False,
    collect_layer_outputs: bool = False,
    inp_embd: Optional[jnp.ndarray] = None,  # [nt, n_embd]: embedding input
) -> tuple[jnp.ndarray, KVCache, jnp.ndarray]:
    """One ubatch step. Returns (logits [n_out, vocab] f32, updated cache,
    embeddings [n_out, n_embd] f32 — final-norm hidden states, cf.
    llama_get_embeddings).

    `cell_pos`/`cell_seq` must already reflect the inserted tokens
    (CellMetadata.commit before the call), mirroring how llama_set_inputs
    fills inp_KQ_mask after find_slot.

    Optional extras in `params`:
    - "control_vectors": [n_layer, n_embd] additive steering vectors
      (parity: llama_control_vector_apply, llama.h:556)
    - LoRA adapters ride on weights as LoraWeight wrappers (ops/qmatmul).
    """
    nt = tokens.shape[0]
    rope = cfg.rope_params()
    freq_factors = params.get("rope_freqs")

    # embedding input (llava image embeds riding llama_batch.embd,
    # reference llava.cpp:394 llava_eval_image_embed)
    if inp_embd is not None:
        h = inp_embd.astype(compute_dtype)
    else:
        with jax.named_scope("embed"):
            h = take_rows(params["tok_embd"], tokens, dtype=compute_dtype)
    if cfg.embd_scale != 1.0:
        h = (h.astype(jnp.float32) * cfg.embd_scale).astype(compute_dtype)
    if cfg.learned_pos_embd and params.get("pos_embd") is not None:
        # absolute position embedding (gpt2/starcoder); padded rows carry
        # pos == -1 and are never read, clamp keeps the gather in-bounds
        h = h + take_rows(params["pos_embd"], jnp.maximum(token_pos, 0),
                          dtype=compute_dtype)
    if cfg.add_type_embd and params.get("token_types_embd") is not None:
        h = h + params["token_types_embd"][0].astype(compute_dtype)  # bert type 0
    if cfg.token_embd_norm and params.get("tok_norm") is not None:
        h = layer_norm(h, params["tok_norm"], params.get("tok_norm_b"), cfg.norm_eps)

    # visibility masks shared across layers (full + sliding-window variants)
    mask_full = visibility_mask(token_pos, token_seq, cell_pos, cell_seq,
                                causal=cfg.causal_attn)
    mask_swa = (
        visibility_mask(token_pos, token_seq, cell_pos, cell_seq, window=cfg.swa_window)
        if cfg.swa_window > 0
        else None
    )
    n_vis = cell_pos.shape[0]  # cache may carry a scratch row beyond the masked cells

    control_vectors = params.get("control_vectors")
    alibi = (
        alibi_slopes(cfg.n_head, cfg.max_alibi_bias)
        if cfg.max_alibi_bias > 0
        else None
    )
    stats: dict[str, jnp.ndarray] = {}  # imatrix activation sums (collect_stats)

    def record(name: str, x):
        if collect_stats:
            stats[name] = jnp.sum(x.astype(jnp.float32) ** 2, axis=0)

    def lnorm(lp, key, x):
        """Arch norm: RMSNorm (llama family) or biased LayerNorm (gpt2
        family) — cf. llm_build_norm's LLM_NORM vs LLM_NORM_RMS.  A
        missing weight means OLMo-style non-parametric LayerNorm."""
        if cfg.use_rms_norm:
            return rms_norm(x, lp[key], cfg.rms_eps, cfg.norm_weight_offset)
        return layer_norm(x, lp.get(key), lp.get(key + "_b"), cfg.norm_eps)

    def attn_in(lp, h):
        """Attention input norm.  attn_norm_2 (falcon-40b's ln_attn) wins
        when present; attn_norm then feeds the parallel FFN branch.
        Post-norm archs (bert) attend on the raw residual stream."""
        if cfg.post_norm:
            return h
        key = "attn_norm_2" if lp.get("attn_norm_2") is not None else "attn_norm"
        return lnorm(lp, key, h)

    def qkv_mla(lp, x, li):
        """deepseek2 multi-head latent attention (cf. build_deepseek2,
        reference src/llama.cpp:13525): q through an optional LoRA
        bottleneck, k/v decompressed from a shared latent; rope applies to
        the last rope_dim of each qk head, the rope key is shared across
        heads."""
        rope_d = cfg.rope_dim
        nope = cfg.head_dim - rope_d
        v_dim = cfg.v_head_dim
        if lp.get("wq_a") is not None:
            q = qmatmul(x, lp["wq_a"], compute_dtype=compute_dtype)
            q = rms_norm(q, lp["attn_q_a_norm"], cfg.rms_eps)
            q = qmatmul(q, lp["wq_b"], compute_dtype=compute_dtype)
        else:  # deepseek2-lite
            q = qmatmul(x, lp["wq"], compute_dtype=compute_dtype)
        q = q.reshape(nt, cfg.n_head, cfg.head_dim)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        kv_pe = qmatmul(x, lp["wkv_a_mqa"], compute_dtype=compute_dtype)
        kv_rank = kv_pe.shape[-1] - rope_d
        kv_c = rms_norm(kv_pe[:, :kv_rank], lp["attn_kv_a_norm"], cfg.rms_eps)
        k_pe = kv_pe[:, kv_rank:].reshape(nt, 1, rope_d)
        kv = qmatmul(kv_c, lp["wkv_b"], compute_dtype=compute_dtype)
        kv = kv.reshape(nt, cfg.n_head, nope + v_dim)
        k_nope, v = kv[..., :nope], kv[..., nope:]

        rope_pe = replace(rope, n_rot=rope_d)
        q_pe = apply_rope(q_pe, token_pos, rope_pe, freq_factors)
        k_pe = apply_rope(k_pe, token_pos, rope_pe, freq_factors)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (nt, cfg.n_head, rope_d))], axis=-1
        )
        return q, k, v

    def qkv(lp, x, li):
        """Shared attention front half: projections, rope (input already
        normed by attn_in)."""
        record(f"blk.{li}.attn_qkv", x)
        if lp.get("wkv_a_mqa") is not None:
            return qkv_mla(lp, x, li)
        if lp.get("wqkv_fused") is not None:
            # serving fold (quant/qtensor.py concat_qtensors): one kernel
            # launch for q|k|v — static row slices recover the projections
            qd = cfg.n_head * cfg.head_dim
            kvd = cfg.n_head_kv * cfg.head_dim
            y = qmatmul(x, lp["wqkv_fused"], compute_dtype=compute_dtype)
            q, k, v = y[:, :qd], y[:, qd:qd + kvd], y[:, qd + kvd:]
        else:
            q = qmatmul(x, lp["wq"], compute_dtype=compute_dtype)
            k = qmatmul(x, lp["wk"], compute_dtype=compute_dtype)
            v = qmatmul(x, lp["wv"], compute_dtype=compute_dtype)
        if lp.get("wq_scale") is not None:  # bitnet per-projection scales
            q = q * lp["wq_scale"]
            k = k * lp["wk_scale"]
            v = v * lp["wv_scale"]
        if lp.get("bq") is not None:
            q = q + lp["bq"]
            k = k + lp["bk"]
            v = v + lp["bv"]
        if cfg.clamp_kqv > 0.0:  # olmo
            q = jnp.clip(q, -cfg.clamp_kqv, cfg.clamp_kqv)
            k = jnp.clip(k, -cfg.clamp_kqv, cfg.clamp_kqv)
            v = jnp.clip(v, -cfg.clamp_kqv, cfg.clamp_kqv)
        # per-layer head counts (openelm) fall back to the uniform scalars;
        # li is only a concrete int on the unrolled path, which is forced
        # whenever per-layer arrays are present (can_stack)
        n_h = cfg.layer_n_head(li) if isinstance(li, int) and li >= 0 else cfg.n_head
        n_kv = cfg.layer_n_head_kv(li) if isinstance(li, int) and li >= 0 else cfg.n_head_kv
        q = q.reshape(nt, n_h, cfg.head_dim)
        k = k.reshape(nt, n_kv, cfg.head_dim)
        v = v.reshape(nt, n_kv, cfg.head_dim)
        if lp.get("attn_q_norm") is not None:
            # per-head-dim norm; command-r's weights are [n_head, head_dim]
            # and broadcast, stablelm-style are [head_dim]
            if cfg.use_rms_norm:
                q = rms_norm(q, lp["attn_q_norm"], cfg.rms_eps, cfg.norm_weight_offset)
                k = rms_norm(k, lp["attn_k_norm"], cfg.rms_eps, cfg.norm_weight_offset)
            else:
                q = layer_norm(q, lp["attn_q_norm"], lp.get("attn_q_norm_b"),
                               cfg.norm_eps)
                k = layer_norm(k, lp["attn_k_norm"], lp.get("attn_k_norm_b"),
                               cfg.norm_eps)
        q = apply_rope(q, token_pos, rope, freq_factors)
        k = apply_rope(k, token_pos, rope, freq_factors)
        return q, k, v

    def post_attn_ffn(lp: dict, h, attn, cvec, li):
        """Shared second half: output projection, FFN/MoE, residuals.

        Sequential (llama): h += attn; h += ffn(ffn_norm(h)).
        Parallel (falcon/gptneox/phi2): h += attn + ffn(x'), where x' is
        ffn_norm(h) when present (gptneox) else the shared attn norm of h
        (falcon/phi2) — cf. build_falcon's use of attn_norm for the FFN.
        """
        record(f"blk.{li}.attn_output", attn)
        if (not collect_stats
                and not cfg.post_norm and not cfg.parallel_residual
                and cfg.use_rms_norm and cfg.ffn_gated
                and lp.get("ffn_gateup_fused") is not None
                and lp.get("ffn_norm") is not None
                and all(lp.get(kk) is None for kk in (
                    "attn_sub_norm", "wo_scale", "bo", "post_attn_norm",
                    "ffn_gate_inp", "ffn_gate_b", "ffn_up_b",
                    "ffn_gate_scale", "ffn_up_scale", "ffn_sub_norm",
                    "ffn_down_b", "ffn_down_scale", "post_ffn_norm",
                    "ffn_norm_exps"))):
            # fused layer half: o-proj + residual + rmsnorm + gated FFN in
            # one launch (ops/qmatmul.qmm_layer); declines -> normal path
            h3 = qmm_layer(attn, h, lp["wo"], lp["ffn_gateup_fused"],
                           lp["ffn_down"], lp["ffn_norm"],
                           eps=cfg.rms_eps, act=cfg.act,
                           norm_offset=cfg.norm_weight_offset)
            if h3 is not None:
                if cvec is not None:
                    h3 = h3 + cvec.astype(h3.dtype)
                return h3
        if lp.get("attn_sub_norm") is not None:  # bitnet: norm before wo
            attn = rms_norm(attn, lp["attn_sub_norm"], cfg.rms_eps)
        attn_out = qmatmul(attn, lp["wo"], compute_dtype=compute_dtype)
        if lp.get("wo_scale") is not None:
            attn_out = attn_out * lp["wo_scale"]
        if lp.get("bo") is not None:
            attn_out = attn_out + lp["bo"]
        if lp.get("post_attn_norm") is not None:  # gemma2
            attn_out = rms_norm(attn_out, lp["post_attn_norm"], cfg.rms_eps,
                                cfg.norm_weight_offset)
        if cfg.post_norm:  # bert: norm AFTER each residual add
            h_res = lnorm(lp, "attn_out_norm", h + attn_out.astype(h.dtype))
            if lp.get("attn_norm_2") is not None:  # jina-bert-v2 re-adds input
                h_res = lnorm(lp, "attn_norm_2", h_res + h)
            h = h_res
            x = h
        elif cfg.parallel_residual:
            key = "ffn_norm" if lp.get("ffn_norm") is not None else "attn_norm"
            x = lnorm(lp, key, h)
            h = h + attn_out.astype(h.dtype)
        else:
            h = h + attn_out.astype(h.dtype)
            # dbrx names its pre-FFN norm attn_output_norm
            seq_key = ("ffn_norm" if lp.get("ffn_norm") is not None
                       else "attn_out_norm" if lp.get("attn_out_norm") is not None
                       else "ffn_norm")
            x = lnorm(lp, seq_key, h)
        record(f"blk.{li}.ffn_gate_up", x)
        act = ACTIVATIONS[cfg.act]

        def moe_ffn(lp, x):
            # MoE: top-k routed experts (cf. llm_build_moe_ffn + mul_mat_id,
            # src/llama.cpp:8725-8824).  Stacked dense experts use grouped
            # ragged matmuls (only routed experts' weights/FLOPs,
            # ops/moe.py); per-expert QTensor lists use the dense sweep
            # fallback.  Returns f32.
            router = qmatmul(x, lp["ffn_gate_inp"], compute_dtype=compute_dtype)
            probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
            top_w, top_i = jax.lax.top_k(probs, cfg.n_expert_used)  # [nt, k]
            if cfg.moe_norm_topk:  # mixtral yes; qwen2moe keeps raw probs
                top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
            if cfg.moe_expert_scale != 1.0:  # deepseek2 scale_w
                top_w = top_w * cfg.moe_expert_scale
            gate_w, up_w, down_w = (lp["ffn_gate_exps"], lp["ffn_up_exps"],
                                    lp["ffn_down_exps"])
            from llama_kotlin_tpu.quant.qtensor import QTensor

            if (getattr(gate_w, "ndim", 0) == 3
                    and getattr(up_w, "ndim", 0) == 3
                    and getattr(down_w, "ndim", 0) == 3):
                # stacked dense experts: grouped ragged matmuls read only
                # the routed experts' weights (ops/moe.py, the
                # ggml_mul_mat_id analogue)
                from llama_kotlin_tpu.ops.moe import moe_grouped_ffn

                down = moe_grouped_ffn(
                    x.astype(compute_dtype), gate_w, up_w, down_w,
                    top_i, top_w, act,
                )
            elif (isinstance(gate_w, QTensor) and gate_w.is_stacked
                    and nt * cfg.n_expert_used <= 64
                    and nt * cfg.n_expert_used < cfg.n_expert):
                # quantized expert stacks, decode-shaped AND fewer routed
                # slots than experts: gather only the routed experts' codes
                # (mul_mat_id access pattern) — it touches S/E of the bytes
                # and dequant work (mixtral decode S/E = 1/4, arctic
                # 2/128).  When S >= E (batched decode on few experts) or
                # on prefill the sweep wins: it reads/dequantizes each
                # expert exactly once, the gather would copy duplicates.
                from llama_kotlin_tpu.ops.moe import moe_gathered_quant

                down = moe_gathered_quant(
                    x.astype(compute_dtype), gate_w, up_w, down_w,
                    top_i, top_w, act, compute_dtype=compute_dtype,
                )
            else:
                down = _moe_sweep(lp, x, top_i, top_w, act)
            return _moe_shared(lp, x, down)

        def _moe_sweep(lp, x, top_i, top_w, act):
            # dense expert sweep fallback (quantized per-expert QTensors):
            # every expert computed, non-routed tokens weighted 0
            down = jnp.zeros((nt, cfg.n_embd), jnp.float32)
            for e in range(cfg.n_expert):
                w_tok = jnp.sum(jnp.where(top_i == e, top_w, 0.0), axis=-1)  # [nt]
                gate_e = qmatmul(x, lp["ffn_gate_exps"][e], compute_dtype=compute_dtype)
                up_e = qmatmul(x, lp["ffn_up_exps"][e], compute_dtype=compute_dtype)
                ffn_e = act(gate_e) * up_e
                down_e = qmatmul(ffn_e.astype(compute_dtype), lp["ffn_down_exps"][e],
                                 compute_dtype=compute_dtype)
                down = down + w_tok[:, None] * down_e.astype(jnp.float32)
            return down

        def _moe_shared(lp, x, down):
            if lp.get("ffn_gate_shexp") is not None:
                # shared expert: always-on gated-silu FFN; qwen2moe modulates
                # it by a sigmoid gate (silu(x)/x == σ(x)), deepseek2 adds it
                # directly (cf. build_qwen2moe / build_deepseek2)
                sh_g = act(qmatmul(x, lp["ffn_gate_shexp"], compute_dtype=compute_dtype))
                sh_u = qmatmul(x, lp["ffn_up_shexp"], compute_dtype=compute_dtype)
                sh = qmatmul((sh_g * sh_u).astype(compute_dtype), lp["ffn_down_shexp"],
                             compute_dtype=compute_dtype)
                sh = sh.astype(jnp.float32)
                if lp.get("ffn_gate_inp_shexp") is not None:
                    g_in = qmatmul(x, lp["ffn_gate_inp_shexp"], compute_dtype=compute_dtype)
                    sh = jax.nn.sigmoid(g_in.astype(jnp.float32)) * sh
                down = down + sh
            return down

        ffn_inp = h  # post-attn residual; arctic's parallel MoE reads it
        if (lp.get("ffn_gate_inp") is not None
                and lp.get("ffn_norm_exps") is None):
            down = moe_ffn(lp, x).astype(h.dtype)
        elif cfg.ffn_gated and lp.get("ffn_gateup_fused") is not None:
            # fused-FFN megakernel: gate|up|down in ONE launch when the W4
            # layouts qualify (decode batches; ops/pallas/qmm_w4_ffn.py)
            down = None if collect_stats else qmm_ffn(
                x, lp["ffn_gateup_fused"], lp["ffn_down"], act=cfg.act)
            if down is None:
                # serving fold: gate|up in one launch (concat_qtensors)
                y = qmatmul(x, lp["ffn_gateup_fused"],
                            compute_dtype=compute_dtype)
                gate, up = y[:, :cfg.n_ff], y[:, cfg.n_ff:]
                ffn = act(gate) * up
                record(f"blk.{li}.ffn_down", ffn)
                down = qmatmul(ffn.astype(compute_dtype), lp["ffn_down"],
                               compute_dtype=compute_dtype)
        elif cfg.ffn_gated and lp.get("ffn_gate") is not None:
            # separate-tensor megakernel (incl. per-shard under a tp mesh —
            # ops/qmatmul._tp_qmm_ffn): plain gated FFN only; any bitnet
            # scale/bias/sub-norm variant needs the intermediates
            plain = all(lp.get(k) is None for k in (
                "ffn_gate_scale", "ffn_gate_b", "ffn_up_scale", "ffn_up_b",
                "ffn_sub_norm", "ffn_down_scale"))
            down = None if collect_stats or not plain else qmm_ffn(
                x, lp["ffn_gate"], lp["ffn_down"], act=cfg.act,
                up=lp["ffn_up"])
            if down is None:
                gate = qmatmul(x, lp["ffn_gate"], compute_dtype=compute_dtype)
                if lp.get("ffn_gate_scale") is not None:  # bitnet
                    gate = gate * lp["ffn_gate_scale"]
                if lp.get("ffn_gate_b") is not None:
                    gate = gate + lp["ffn_gate_b"]
                up = qmatmul(x, lp["ffn_up"], compute_dtype=compute_dtype)
                if lp.get("ffn_up_scale") is not None:
                    up = up * lp["ffn_up_scale"]
                if lp.get("ffn_up_b") is not None:
                    up = up + lp["ffn_up_b"]
                ffn = act(gate) * up
                if lp.get("ffn_sub_norm") is not None:  # bitnet: norm before down
                    ffn = rms_norm(ffn, lp["ffn_sub_norm"], cfg.rms_eps)
                record(f"blk.{li}.ffn_down", ffn)
                down = qmatmul(ffn.astype(compute_dtype), lp["ffn_down"], compute_dtype=compute_dtype)
                if lp.get("ffn_down_scale") is not None:
                    down = down * lp["ffn_down_scale"]
        else:
            up = qmatmul(x, lp["ffn_up"], compute_dtype=compute_dtype)
            if lp.get("ffn_up_b") is not None:
                up = up + lp["ffn_up_b"]
            if cfg.swiglu_packed:  # chatglm: up packs [gate|up] halves
                g_half, u_half = jnp.split(up, 2, axis=-1)
                ffn = ACTIVATIONS["silu"](g_half) * u_half
            else:
                ffn = act(up)
            down = qmatmul(ffn.astype(compute_dtype), lp["ffn_down"], compute_dtype=compute_dtype)
        if lp.get("ffn_down_b") is not None:
            down = down + lp["ffn_down_b"]
        if lp.get("post_ffn_norm") is not None:  # gemma2
            down = rms_norm(down, lp["post_ffn_norm"], cfg.rms_eps, cfg.norm_weight_offset)
        if cfg.post_norm:
            h = lnorm(lp, "layer_out_norm", h + down.astype(h.dtype))
        else:
            h = h + down.astype(h.dtype)
        if lp.get("ffn_norm_exps") is not None and lp.get("ffn_gate_inp") is not None:
            # arctic: the MoE branch runs in parallel with the dense FFN,
            # normed from the post-attention residual (cf. build_arctic)
            x_moe = rms_norm(ffn_inp, lp["ffn_norm_exps"], cfg.rms_eps)
            h = h + moe_ffn(lp, x_moe).astype(h.dtype)
        if cvec is not None:
            h = h + cvec.astype(h.dtype)
        return h

    kv_quant = cache.quantized

    def layer_body(lp: dict, h, k_layer, v_layer, mask, cvec=None, li: int = -1,
                   ks_layer=None, vs_layer=None, whole=False):
        """Unrolled-path layer: scatter K/V into the carried cache, then
        attend over it (per-layer masks, e.g. gemma2 SWA).

        whole=True: k_layer/v_layer are the FULL stacked 4D cache arrays —
        the scatter targets [li, :, slots] and attention reads the stacked
        array with a static layer index baked into the flash BlockSpecs.
        The slice-out/write-back alternative costs 4 HBM copies of the
        ~8 MB layer slice per layer per token (round-3 device trace:
        slice-start/copy-start dominated MHA decode at 50 t/s)."""
        with jax.named_scope("qkv"):
            q, k, v = qkv(lp, attn_in(lp, h), li)
        kvl = k.shape[1]  # per-layer kv head count (cache dim covers max)
        # cache layout is head-major [n_kv, cells, head_dim]; padded batch
        # rows carry slot == n_cells, dropped by the OOB scatter mode
        kh, vh = k.swapaxes(0, 1), v.swapaxes(0, 1)  # [KV_l, nt, D]
        if kv_quant:
            from llama_kotlin_tpu.runtime.kv_cache import (
                quantize_rows,
                quantize_rows_q4,
            )

            qr = quantize_rows_q4 if cache.kv_bits == 4 else quantize_rows
            kh, ks = qr(kh)
            vh, vs = qr(vh)
        if whole:
            # at[li, :, slots]: the int layer index and the slot array are
            # BOTH advanced indices separated by a slice, so their axes
            # move to the front — the value must be [nt, KV, ...]-ordered
            if kv_quant:
                ks_layer = ks_layer.at[li, :, slots].set(
                    ks.swapaxes(0, 1), mode="drop")
                vs_layer = vs_layer.at[li, :, slots].set(
                    vs.swapaxes(0, 1), mode="drop")
            k_layer = k_layer.at[li, :, slots].set(
                kh.swapaxes(0, 1).astype(k_layer.dtype), mode="drop")
            v_layer = v_layer.at[li, :, slots].set(
                vh.swapaxes(0, 1).astype(v_layer.dtype), mode="drop")
            att_k, att_v = k_layer, v_layer
            att_ks, att_vs = ks_layer, vs_layer
            att_layer = li
        else:
            if kv_quant:
                ks_layer = ks_layer.at[:kvl, slots].set(ks, mode="drop")
                vs_layer = vs_layer.at[:kvl, slots].set(vs, mode="drop")
            k_layer = k_layer.at[:kvl, slots].set(kh.astype(k_layer.dtype), mode="drop")
            v_layer = v_layer.at[:kvl, slots].set(vh.astype(v_layer.dtype), mode="drop")
            att_k, att_v = k_layer[:kvl], v_layer[:kvl]
            att_ks = None if ks_layer is None else ks_layer[:kvl]
            att_vs = None if vs_layer is None else vs_layer[:kvl]
            att_layer = None
        with jax.named_scope("attn"):
            attn = attention(
                q.astype(compute_dtype), att_k, att_v, mask,
                scale=cfg.attn_scale, logit_softcap=cfg.attn_logit_softcap,
                alibi_slopes=alibi, token_pos=token_pos, cell_pos=cell_pos,
                k_scale=att_ks, v_scale=att_vs,
                kv_bits=cache.kv_bits, tp=cache.tp, layer=att_layer,
            )
        attn = attn.astype(compute_dtype).reshape(nt, -1)
        with jax.named_scope("ffn"):
            h = post_attn_ffn(lp, h, attn, cvec, li)
        return h, k_layer, v_layer, ks_layer, vs_layer

    if "layers_stacked" in params:
        if collect_stats or collect_layer_outputs:
            raise ValueError(
                "collect_stats/collect_layer_outputs need unstacked layers "
                "(per-layer names can't escape a lax.scan body); load the "
                "model with prefer_unrolled=True")
        # lax.scan over stacked layers: one-layer compile regardless of
        # depth, and NOTHING big moves per layer:
        # - matmul weights are closed over whole and layer-indexed inside
        #   the qmm_stacked kernel (scalar prefetch) — no slice copies
        # - the KV cache is NOT carried: attention reads the old cache via
        #   flash_attention_stacked (new tokens' cells masked out) and the
        #   fresh K/V rows merge in the kernel's final step; the per-layer
        #   rows come back as scan outputs and scatter into the cache once
        # - only norms/biases ride as scan xs
        from llama_kotlin_tpu.ops.qmatmul import StackedSlice
        from llama_kotlin_tpu.ops.attention import attention_reference
        from llama_kotlin_tpu.ops.pallas.flash_stacked import (
            flash_attention_stacked_or_none,
        )

        stacked = params["layers_stacked"]
        # NOTE: a zero-copy StackedSlice scalar-prefetch kernel measured
        # ~20x slower than plain qmm (prefetch-indexed blocks defeat
        # Mosaic's pipelining; kernel removed, see git history), so ALL
        # weights ride as scan xs (slice copies); the unrolled path avoids
        # that cost and is preferred for serving (prefer_unrolled=True).
        small = stacked

        # visibility: old cells (new tokens' cells excluded) + intra-batch
        slot_taken = jnp.zeros(n_vis, bool).at[slots].set(True, mode="drop")
        mask_cells = mask_full & ~slot_taken[None, :]
        # intra-batch visibility from the committed cell bitmasks (multi-seq
        # tokens, e.g. lookahead branches, share cells across sequences —
        # primary-seq equality alone would hide them from sibling branches)
        safe_slots = jnp.minimum(slots, n_vis - 1)
        token_mask = jnp.where(slots < n_vis, cell_seq[safe_slots], 0)
        mask_new = (
            (((token_mask[None, :] >> token_seq[:, None]) & 1) != 0)
            & (token_pos[None, :] >= 0)
        )
        if cfg.causal_attn:
            mask_new = mask_new & (token_pos[None, :] <= token_pos[:, None])

        use_flash = (jax.default_backend() not in ("cpu",)
                     and cache.k.shape[-1] == cache.v.shape[-1]
                     and cache.kv_bits == 8  # stacked kernel: int8 only;
                     # q4 caches take the unrolled path (prefer_unrolled)
                     and cache.tp == 1)  # tp-sharded caches use the
                     # unrolled path's shard_map'd flash (ops/attention.py)

        def attend(q, k, v, i):
            qc = q.astype(compute_dtype)
            kc_ = k.astype(compute_dtype)
            vc_ = v.astype(compute_dtype)
            if use_flash:
                out = flash_attention_stacked_or_none(
                    qc, cache.k, cache.v, i, kc_, vc_, mask_cells, mask_new,
                    scale=cfg.attn_scale, logit_softcap=cfg.attn_logit_softcap,
                    k_scale=cache.k_scale, v_scale=cache.v_scale, n_vis=n_vis,
                )
                if out is not None:
                    return out
            k_old, v_old = cache.k[i][:, :n_vis], cache.v[i][:, :n_vis]
            if cache.quantized:
                from llama_kotlin_tpu.runtime.kv_cache import (
                    dequantize_cache_layer,
                )

                k_old = dequantize_cache_layer(
                    k_old, cache.k_scale[i][:, :n_vis], bits=cache.kv_bits)
                v_old = dequantize_cache_layer(
                    v_old, cache.v_scale[i][:, :n_vis], bits=cache.kv_bits)
            k_cat = jnp.concatenate([k_old.astype(compute_dtype),
                                     kc_.swapaxes(0, 1)], axis=1)
            v_cat = jnp.concatenate([v_old.astype(compute_dtype),
                                     vc_.swapaxes(0, 1)], axis=1)
            m_cat = jnp.concatenate([mask_cells, mask_new], axis=1)
            return attention_reference(
                qc, k_cat, v_cat, m_cat,
                scale=cfg.attn_scale, logit_softcap=cfg.attn_logit_softcap,
            )

        def scan_body(h, xs):
            small_sliced, i, cvec = xs
            lp = dict(small_sliced)
            q, k, v = qkv(lp, attn_in(lp, h), i)
            if kv_quant:
                # quantize first and attend over the dequantized values so
                # this step's tokens see exactly what later steps will read
                from llama_kotlin_tpu.runtime.kv_cache import (
                    quantize_rows,
                    quantize_rows_q4,
                    unpack_q4_rows,
                )

                qr = quantize_rows_q4 if cache.kv_bits == 4 else quantize_rows
                kh, ks = qr(k.swapaxes(0, 1))
                vh, vs = qr(v.swapaxes(0, 1))
                kf = unpack_q4_rows(kh) if cache.kv_bits == 4 else kh.astype(jnp.float32)
                vf = unpack_q4_rows(vh) if cache.kv_bits == 4 else vh.astype(jnp.float32)
                k = (kf * ks[..., None]).swapaxes(0, 1)
                v = (vf * vs[..., None]).swapaxes(0, 1)
            attn = attend(q, k, v, i).astype(compute_dtype).reshape(nt, cfg.attn_out_dim)
            h = post_attn_ffn(lp, h, attn, cvec, i)
            if kv_quant:
                return h, (kh, vh, ks, vs)
            return h, (k.swapaxes(0, 1).astype(cache.k.dtype),
                       v.swapaxes(0, 1).astype(cache.v.dtype),
                       jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

        cvecs = control_vectors
        if cvecs is None:
            cvecs = jnp.zeros((cfg.n_layer, h.shape[-1]), jnp.float32)
        h, (k_rows, v_rows, ks_rows, vs_rows) = jax.lax.scan(
            scan_body, h,
            (small, jnp.arange(cfg.n_layer, dtype=jnp.int32), cvecs),
        )
        # one scatter for all layers: k_rows [L, KV, nt, D] -> cache cells
        new_k = cache.k.at[:, :, slots].set(k_rows, mode="drop")
        new_v = cache.v.at[:, :, slots].set(v_rows, mode="drop")
        new_ks = cache.k_scale
        new_vs = cache.v_scale
        if kv_quant:
            new_ks = new_ks.at[:, :, slots].set(ks_rows, mode="drop")
            new_vs = new_vs.at[:, :, slots].set(vs_rows, mode="drop")
    else:
        new_k = cache.k
        new_v = cache.v
        new_ks = cache.k_scale
        new_vs = cache.v_scale
        # whole-cache mode: every layer writes/reads the stacked 4D arrays
        # in place (static layer index in the flash BlockSpecs / a fused
        # read slice on the fallback) — no per-layer slice copies.  Needs a
        # uniform kv-head count (openelm's per-layer counts keep slicing)
        # and an unsharded cache (the tp shard_map path takes 3D operands).
        whole = (cache.tp == 1
                 and all(cfg.layer_n_head_kv(i) == cache.k.shape[1]
                         for i in range(cfg.n_layer)))
        for i in range(cfg.n_layer):
            lp = layer_params(params, i)
            window = cfg.layer_swa_window(i)
            mask = mask_swa if (window > 0 and mask_swa is not None) else mask_full
            cvec = None if control_vectors is None else control_vectors[i]
            if whole:
                h, new_k, new_v, new_ks, new_vs = layer_body(
                    lp, h, new_k, new_v, mask, cvec, li=i,
                    ks_layer=new_ks, vs_layer=new_vs, whole=True,
                )
            else:
                h, kl, vl, ksl, vsl = layer_body(
                    lp, h, new_k[i], new_v[i], mask, cvec, li=i,
                    ks_layer=None if new_ks is None else new_ks[i],
                    vs_layer=None if new_vs is None else new_vs[i],
                )
                new_k = new_k.at[i].set(kl)
                new_v = new_v.at[i].set(vl)
                if ksl is not None:
                    new_ks = new_ks.at[i].set(ksl)
                    new_vs = new_vs.at[i].set(vsl)
            if collect_layer_outputs:  # cvector extraction (cb "l_out")
                stats[f"l_out.{i}"] = h.astype(jnp.float32)

    # logits only for requested rows (cf. inp_out_ids, llama.cpp:9637)
    h_out = h[out_ids]
    if cfg.post_norm and params.get("output_norm") is None:
        pass  # bert: layers end normalized, no final norm
    elif cfg.use_rms_norm:
        h_out = rms_norm(h_out, params["output_norm"], cfg.rms_eps, cfg.norm_weight_offset)
    else:
        h_out = layer_norm(h_out, params.get("output_norm"),
                           params.get("output_norm_b"), cfg.norm_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["tok_embd"]  # tied embeddings
    with jax.named_scope("lm_head"):
        logits = qmatmul(h_out, out_w, compute_dtype=compute_dtype).astype(jnp.float32)
    if params.get("output_b") is not None:
        logits = logits + params["output_b"]
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap > 0.0:
        logits = jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
    out_cache = replace(cache, k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs)
    if collect_stats or collect_layer_outputs:
        return logits, out_cache, h_out.astype(jnp.float32), stats
    return logits, out_cache, h_out.astype(jnp.float32)
