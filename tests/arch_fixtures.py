"""Fixtures for the LayerNorm arch family (gpt2/gptneox/falcon/mpt/
starcoder/phi2/bloom): build a tiny random model simultaneously as a GGUF
weight dict (our naming, [out, in] orientation, contiguous q|k|v fused QKV
— what the reference's HF converters emit) and as the matching transformers
model, so logits can be cross-checked against an independent oracle.

Covers the per-arch HF quirks: Conv1D transposition (gpt2), per-head QKV
interleaving (gptneox/bloom), per-kv-group interleaving (falcon new
decoder), MQA (starcoder), parallel residual with shared norm (phi2).
"""

from __future__ import annotations

import numpy as np

from llama_kotlin_tpu.gguf import GGUFWriter
from llama_kotlin_tpu.quant.formats import GGMLQuantType


def write_arch_gguf(path, arch: str, md: dict, weights: dict) -> None:
    w = GGUFWriter()
    w.add_kv("general.architecture", arch)
    w.add_kv("general.name", f"tiny-{arch}")
    for k, v in md.items():
        w.add_kv(k, v)
    for name, arr in weights.items():
        w.add_tensor(name, arr.astype(np.float32), GGMLQuantType.F32)
    w.write(path)


def interleave_head_qkv(q, k, v, n_head, hd):
    """Contiguous q|k|v -> per-head [q_h, k_h, v_h] (HF gptneox/bloom)."""
    rest = q.shape[1:]
    qh = q.reshape(n_head, hd, *rest)
    kh = k.reshape(n_head, hd, *rest)
    vh = v.reshape(n_head, hd, *rest)
    return np.stack([qh, kh, vh], axis=1).reshape(3 * n_head * hd, *rest)


def interleave_group_qkv(q, k, v, n_kv, rep, hd):
    """Contiguous q|k|v -> per-kv-group [q_g..., k_g, v_g] (HF falcon
    new_decoder_architecture)."""
    rest = q.shape[1:]
    qg = q.reshape(n_kv, rep, hd, *rest)
    kg = k.reshape(n_kv, 1, hd, *rest)
    vg = v.reshape(n_kv, 1, hd, *rest)
    return np.concatenate([qg, kg, vg], axis=1).reshape((rep + 2) * n_kv * hd, *rest)


class _W:
    """Weight factory with deterministic rng helpers."""

    def __init__(self, rng, scale=0.05):
        self.rng, self.scale = rng, scale

    def mat(self, n, k):
        return (self.rng.standard_normal((n, k)) * self.scale).astype(np.float32)

    def vec(self, n):
        return (self.rng.standard_normal(n) * self.scale).astype(np.float32)

    def norm(self, n):
        return (1.0 + 0.1 * self.rng.standard_normal(n)).astype(np.float32)


def _to_torch(sd):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


# ---------------------------------------------------------------- gpt2


def make_gpt2(rng, E=64, L=2, H=4, F=128, V=160, n_ctx=128):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "position_embd.weight": w.mat(n_ctx, E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat(3 * E, E)
        ws[p + "attn_qkv.bias"] = w.vec(3 * E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_norm.bias"] = w.vec(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
    md = {
        "gpt2.embedding_length": np.uint32(E),
        "gpt2.block_count": np.uint32(L),
        "gpt2.attention.head_count": np.uint32(H),
        "gpt2.feed_forward_length": np.uint32(F),
        "gpt2.context_length": np.uint32(n_ctx),
        "gpt2.attention.layer_norm_epsilon": np.float32(1e-5),
        "gpt2.vocab_size": np.uint32(V),
    }
    cfg = GPT2Config(
        vocab_size=V, n_positions=n_ctx, n_embd=E, n_layer=L, n_head=H, n_inner=F,
        activation_function="gelu_new", layer_norm_epsilon=1e-5,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    m = GPT2LMHeadModel(cfg)
    sd = {
        "transformer.wte.weight": ws["token_embd.weight"],
        "transformer.wpe.weight": ws["position_embd.weight"],
        "transformer.ln_f.weight": ws["output_norm.weight"],
        "transformer.ln_f.bias": ws["output_norm.bias"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"transformer.h.{i}."
        sd[hf + "ln_1.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "ln_1.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "attn.c_attn.weight"] = ws[p + "attn_qkv.weight"].T  # Conv1D
        sd[hf + "attn.c_attn.bias"] = ws[p + "attn_qkv.bias"]
        sd[hf + "attn.c_proj.weight"] = ws[p + "attn_output.weight"].T
        sd[hf + "attn.c_proj.bias"] = ws[p + "attn_output.bias"]
        sd[hf + "ln_2.weight"] = ws[p + "ffn_norm.weight"]
        sd[hf + "ln_2.bias"] = ws[p + "ffn_norm.bias"]
        sd[hf + "mlp.c_fc.weight"] = ws[p + "ffn_up.weight"].T
        sd[hf + "mlp.c_fc.bias"] = ws[p + "ffn_up.bias"]
        sd[hf + "mlp.c_proj.weight"] = ws[p + "ffn_down.weight"].T
        sd[hf + "mlp.c_proj.bias"] = ws[p + "ffn_down.bias"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "gpt2", md, ws, m


# ------------------------------------------------------------- gptneox


def make_gptneox(rng, E=64, L=2, H=4, F=128, V=160, n_ctx=128, rotary_pct=0.5):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    hd = E // H
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
        "output.weight": w.mat(V, E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat(3 * E, E)
        ws[p + "attn_qkv.bias"] = w.vec(3 * E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_norm.bias"] = w.vec(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
    md = {
        "gptneox.embedding_length": np.uint32(E),
        "gptneox.block_count": np.uint32(L),
        "gptneox.attention.head_count": np.uint32(H),
        "gptneox.feed_forward_length": np.uint32(F),
        "gptneox.context_length": np.uint32(n_ctx),
        "gptneox.attention.layer_norm_epsilon": np.float32(1e-5),
        "gptneox.rope.dimension_count": np.uint32(int(hd * rotary_pct)),
        "gptneox.use_parallel_residual": True,
        "gptneox.vocab_size": np.uint32(V),
    }
    cfg = GPTNeoXConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=F, rotary_pct=rotary_pct, max_position_embeddings=n_ctx,
        layer_norm_eps=1e-5, hidden_act="gelu_new", use_parallel_residual=True,
        rope_theta=10000.0, attention_dropout=0.0, hidden_dropout=0.0,
    )
    m = GPTNeoXForCausalLM(cfg)
    sd = {
        "gpt_neox.embed_in.weight": ws["token_embd.weight"],
        "gpt_neox.final_layer_norm.weight": ws["output_norm.weight"],
        "gpt_neox.final_layer_norm.bias": ws["output_norm.bias"],
        "embed_out.weight": ws["output.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"gpt_neox.layers.{i}."
        q, k, v = np.split(ws[p + "attn_qkv.weight"], 3, axis=0)
        bq, bk, bv = np.split(ws[p + "attn_qkv.bias"], 3, axis=0)
        sd[hf + "input_layernorm.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "input_layernorm.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "attention.query_key_value.weight"] = interleave_head_qkv(q, k, v, H, hd)
        sd[hf + "attention.query_key_value.bias"] = interleave_head_qkv(bq, bk, bv, H, hd)
        sd[hf + "attention.dense.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "attention.dense.bias"] = ws[p + "attn_output.bias"]
        sd[hf + "post_attention_layernorm.weight"] = ws[p + "ffn_norm.weight"]
        sd[hf + "post_attention_layernorm.bias"] = ws[p + "ffn_norm.bias"]
        sd[hf + "mlp.dense_h_to_4h.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.dense_h_to_4h.bias"] = ws[p + "ffn_up.bias"]
        sd[hf + "mlp.dense_4h_to_h.weight"] = ws[p + "ffn_down.weight"]
        sd[hf + "mlp.dense_4h_to_h.bias"] = ws[p + "ffn_down.bias"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "gptneox", md, ws, m


# -------------------------------------------------------------- falcon


def make_falcon(rng, E=64, L=2, H=4, KV=2, V=160, n_ctx=128):
    from transformers import FalconConfig, FalconForCausalLM

    hd = E // H
    F = 4 * E
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)  # ln_mlp (feeds the FFN)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_norm_2.weight"] = w.norm(E)  # ln_attn (feeds attention)
        ws[p + "attn_norm_2.bias"] = w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat((H + 2 * KV) * hd, E)
        ws[p + "attn_output.weight"] = w.mat(E, H * hd)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
    md = {
        "falcon.embedding_length": np.uint32(E),
        "falcon.block_count": np.uint32(L),
        "falcon.attention.head_count": np.uint32(H),
        "falcon.attention.head_count_kv": np.uint32(KV),
        "falcon.feed_forward_length": np.uint32(F),
        "falcon.context_length": np.uint32(n_ctx),
        "falcon.attention.layer_norm_epsilon": np.float32(1e-5),
        "falcon.vocab_size": np.uint32(V),
    }
    cfg = FalconConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L, num_attention_heads=H,
        num_kv_heads=KV, new_decoder_architecture=True, parallel_attn=True,
        bias=False, alibi=False, rope_theta=10000.0, layer_norm_epsilon=1e-5,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    m = FalconForCausalLM(cfg)
    sd = {
        "transformer.word_embeddings.weight": ws["token_embd.weight"],
        "transformer.ln_f.weight": ws["output_norm.weight"],
        "transformer.ln_f.bias": ws["output_norm.bias"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"transformer.h.{i}."
        fused = ws[p + "attn_qkv.weight"]
        q, k, v = fused[: H * hd], fused[H * hd : (H + KV) * hd], fused[(H + KV) * hd :]
        sd[hf + "ln_attn.weight"] = ws[p + "attn_norm_2.weight"]
        sd[hf + "ln_attn.bias"] = ws[p + "attn_norm_2.bias"]
        sd[hf + "ln_mlp.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "ln_mlp.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "self_attention.query_key_value.weight"] = interleave_group_qkv(
            q, k, v, KV, H // KV, hd
        )
        sd[hf + "self_attention.dense.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "mlp.dense_h_to_4h.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.dense_4h_to_h.weight"] = ws[p + "ffn_down.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "falcon", md, ws, m


# ----------------------------------------------------------------- mpt


def make_mpt(rng, E=64, L=2, H=4, V=160, n_ctx=128):
    from transformers import MptConfig, MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptAttentionConfig

    F = 4 * E
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_qkv.weight"] = w.mat(3 * E, E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
    md = {
        "mpt.embedding_length": np.uint32(E),
        "mpt.block_count": np.uint32(L),
        "mpt.attention.head_count": np.uint32(H),
        "mpt.feed_forward_length": np.uint32(F),
        "mpt.context_length": np.uint32(n_ctx),
        "mpt.attention.layer_norm_epsilon": np.float32(1e-5),
        "mpt.attention.max_alibi_bias": np.float32(8.0),
        "mpt.vocab_size": np.uint32(V),
    }
    cfg = MptConfig(
        d_model=E, n_heads=H, n_layers=L, expansion_ratio=4, max_seq_len=n_ctx,
        vocab_size=V, layer_norm_epsilon=1e-5, no_bias=True,
        attn_config=MptAttentionConfig(alibi=True, alibi_bias_max=8, attn_pdrop=0.0),
        emb_pdrop=0.0, resid_pdrop=0.0,
    )
    m = MptForCausalLM(cfg)
    sd = {
        "transformer.wte.weight": ws["token_embd.weight"],
        "transformer.norm_f.weight": ws["output_norm.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"transformer.blocks.{i}."
        sd[hf + "norm_1.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "attn.Wqkv.weight"] = ws[p + "attn_qkv.weight"]
        sd[hf + "attn.out_proj.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "norm_2.weight"] = ws[p + "ffn_norm.weight"]
        sd[hf + "ffn.up_proj.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "ffn.down_proj.weight"] = ws[p + "ffn_down.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "mpt", md, ws, m


# ----------------------------------------------------- starcoder (MQA)


def make_starcoder(rng, E=64, L=2, H=4, F=128, V=160, n_ctx=128):
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    hd = E // H
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "position_embd.weight": w.mat(n_ctx, E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat(E + 2 * hd, E)  # MQA: 1 kv head
        ws[p + "attn_qkv.bias"] = w.vec(E + 2 * hd)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_norm.bias"] = w.vec(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
    md = {
        "starcoder.embedding_length": np.uint32(E),
        "starcoder.block_count": np.uint32(L),
        "starcoder.attention.head_count": np.uint32(H),
        "starcoder.attention.head_count_kv": np.uint32(1),
        "starcoder.feed_forward_length": np.uint32(F),
        "starcoder.context_length": np.uint32(n_ctx),
        "starcoder.attention.layer_norm_epsilon": np.float32(1e-5),
        "starcoder.vocab_size": np.uint32(V),
    }
    cfg = GPTBigCodeConfig(
        vocab_size=V, n_positions=n_ctx, n_embd=E, n_layer=L, n_head=H, n_inner=F,
        activation_function="gelu_pytorch_tanh", multi_query=True,
        layer_norm_epsilon=1e-5, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    m = GPTBigCodeForCausalLM(cfg)
    sd = {
        "transformer.wte.weight": ws["token_embd.weight"],
        "transformer.wpe.weight": ws["position_embd.weight"],
        "transformer.ln_f.weight": ws["output_norm.weight"],
        "transformer.ln_f.bias": ws["output_norm.bias"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"transformer.h.{i}."
        sd[hf + "ln_1.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "ln_1.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "attn.c_attn.weight"] = ws[p + "attn_qkv.weight"]
        sd[hf + "attn.c_attn.bias"] = ws[p + "attn_qkv.bias"]
        sd[hf + "attn.c_proj.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "attn.c_proj.bias"] = ws[p + "attn_output.bias"]
        sd[hf + "ln_2.weight"] = ws[p + "ffn_norm.weight"]
        sd[hf + "ln_2.bias"] = ws[p + "ffn_norm.bias"]
        sd[hf + "mlp.c_fc.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.c_fc.bias"] = ws[p + "ffn_up.bias"]
        sd[hf + "mlp.c_proj.weight"] = ws[p + "ffn_down.weight"]
        sd[hf + "mlp.c_proj.bias"] = ws[p + "ffn_down.bias"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "starcoder", md, ws, m


# ---------------------------------------------------------------- phi2


def make_phi2(rng, E=64, L=2, H=4, F=128, V=160, n_ctx=128):
    from transformers import PhiConfig, PhiForCausalLM

    hd = E // H
    rot = hd // 2
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
        "output.weight": w.mat(V, E),
        "output.bias": w.vec(V),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_q.weight"] = w.mat(E, E)
        ws[p + "attn_q.bias"] = w.vec(E)
        ws[p + "attn_k.weight"] = w.mat(E, E)
        ws[p + "attn_k.bias"] = w.vec(E)
        ws[p + "attn_v.weight"] = w.mat(E, E)
        ws[p + "attn_v.bias"] = w.vec(E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
    md = {
        "phi2.embedding_length": np.uint32(E),
        "phi2.block_count": np.uint32(L),
        "phi2.attention.head_count": np.uint32(H),
        "phi2.attention.head_count_kv": np.uint32(H),
        "phi2.feed_forward_length": np.uint32(F),
        "phi2.context_length": np.uint32(n_ctx),
        "phi2.attention.layer_norm_epsilon": np.float32(1e-5),
        "phi2.rope.dimension_count": np.uint32(rot),
        "phi2.vocab_size": np.uint32(V),
    }
    cfg = PhiConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=H,
        partial_rotary_factor=rot / hd, layer_norm_eps=1e-5, hidden_act="gelu_new",
        tie_word_embeddings=False, rope_theta=10000.0, attention_dropout=0.0,
        embd_pdrop=0.0, resid_pdrop=0.0, qk_layernorm=False,
    )
    m = PhiForCausalLM(cfg)
    sd = {
        "model.embed_tokens.weight": ws["token_embd.weight"],
        "model.final_layernorm.weight": ws["output_norm.weight"],
        "model.final_layernorm.bias": ws["output_norm.bias"],
        "lm_head.weight": ws["output.weight"],
        "lm_head.bias": ws["output.bias"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"model.layers.{i}."
        sd[hf + "input_layernorm.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "input_layernorm.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "self_attn.q_proj.weight"] = ws[p + "attn_q.weight"]
        sd[hf + "self_attn.q_proj.bias"] = ws[p + "attn_q.bias"]
        sd[hf + "self_attn.k_proj.weight"] = ws[p + "attn_k.weight"]
        sd[hf + "self_attn.k_proj.bias"] = ws[p + "attn_k.bias"]
        sd[hf + "self_attn.v_proj.weight"] = ws[p + "attn_v.weight"]
        sd[hf + "self_attn.v_proj.bias"] = ws[p + "attn_v.bias"]
        sd[hf + "self_attn.dense.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "self_attn.dense.bias"] = ws[p + "attn_output.bias"]
        sd[hf + "mlp.fc1.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.fc1.bias"] = ws[p + "ffn_up.bias"]
        sd[hf + "mlp.fc2.weight"] = ws[p + "ffn_down.weight"]
        sd[hf + "mlp.fc2.bias"] = ws[p + "ffn_down.bias"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "phi2", md, ws, m


# --------------------------------------------------------------- bloom


def make_bloom(rng, E=64, L=2, H=4, V=160, n_ctx=128):
    from transformers import BloomConfig, BloomForCausalLM

    hd = E // H
    F = 4 * E
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "token_embd_norm.weight": w.norm(E),
        "token_embd_norm.bias": w.vec(E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat(3 * E, E)
        ws[p + "attn_qkv.bias"] = w.vec(3 * E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_norm.bias"] = w.vec(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
    md = {
        "bloom.embedding_length": np.uint32(E),
        "bloom.block_count": np.uint32(L),
        "bloom.attention.head_count": np.uint32(H),
        "bloom.feed_forward_length": np.uint32(F),
        "bloom.context_length": np.uint32(n_ctx),
        "bloom.attention.layer_norm_epsilon": np.float32(1e-5),
        "bloom.vocab_size": np.uint32(V),
    }
    cfg = BloomConfig(
        vocab_size=V, hidden_size=E, n_layer=L, n_head=H, layer_norm_epsilon=1e-5,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    m = BloomForCausalLM(cfg)
    sd = {
        "transformer.word_embeddings.weight": ws["token_embd.weight"],
        "transformer.word_embeddings_layernorm.weight": ws["token_embd_norm.weight"],
        "transformer.word_embeddings_layernorm.bias": ws["token_embd_norm.bias"],
        "transformer.ln_f.weight": ws["output_norm.weight"],
        "transformer.ln_f.bias": ws["output_norm.bias"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"transformer.h.{i}."
        q, k, v = np.split(ws[p + "attn_qkv.weight"], 3, axis=0)
        bq, bk, bv = np.split(ws[p + "attn_qkv.bias"], 3, axis=0)
        sd[hf + "input_layernorm.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "input_layernorm.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "self_attention.query_key_value.weight"] = interleave_head_qkv(q, k, v, H, hd)
        sd[hf + "self_attention.query_key_value.bias"] = interleave_head_qkv(bq, bk, bv, H, hd)
        sd[hf + "self_attention.dense.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "self_attention.dense.bias"] = ws[p + "attn_output.bias"]
        sd[hf + "post_attention_layernorm.weight"] = ws[p + "ffn_norm.weight"]
        sd[hf + "post_attention_layernorm.bias"] = ws[p + "ffn_norm.bias"]
        sd[hf + "mlp.dense_h_to_4h.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.dense_h_to_4h.bias"] = ws[p + "ffn_up.bias"]
        sd[hf + "mlp.dense_4h_to_h.weight"] = ws[p + "ffn_down.weight"]
        sd[hf + "mlp.dense_4h_to_h.bias"] = ws[p + "ffn_down.bias"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "bloom", md, ws, m


# ----------------------------------------------------------- command-r


def make_commandr(rng, E=64, L=2, H=4, KV=2, F=128, V=160, n_ctx=128):
    from transformers import CohereConfig, CohereForCausalLM

    hd = E // H
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_q.weight"] = w.mat(H * hd, E)
        ws[p + "attn_k.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_v.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_q_norm.weight"] = w.norm(H * hd).reshape(H, hd)
        ws[p + "attn_k_norm.weight"] = w.norm(KV * hd).reshape(KV, hd)
        ws[p + "attn_output.weight"] = w.mat(E, H * hd)
        ws[p + "ffn_gate.weight"] = w.mat(F, E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
    md = {
        "command-r.embedding_length": np.uint32(E),
        "command-r.block_count": np.uint32(L),
        "command-r.attention.head_count": np.uint32(H),
        "command-r.attention.head_count_kv": np.uint32(KV),
        "command-r.feed_forward_length": np.uint32(F),
        "command-r.context_length": np.uint32(n_ctx),
        "command-r.attention.layer_norm_epsilon": np.float32(1e-5),
        "command-r.logit_scale": np.float32(0.25),
        "command-r.rope.freq_base": np.float32(10000.0),
        "command-r.vocab_size": np.uint32(V),
    }
    cfg = CohereConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=KV,
        max_position_embeddings=n_ctx, rope_theta=10000.0, layer_norm_eps=1e-5,
        logit_scale=0.25, use_qk_norm=True, tie_word_embeddings=True,
        attention_bias=False, attention_dropout=0.0,
    )
    m = CohereForCausalLM(cfg)
    sd = {
        "model.embed_tokens.weight": ws["token_embd.weight"],
        "model.norm.weight": ws["output_norm.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"model.layers.{i}."
        sd[hf + "input_layernorm.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "self_attn.q_proj.weight"] = ws[p + "attn_q.weight"]
        sd[hf + "self_attn.k_proj.weight"] = ws[p + "attn_k.weight"]
        sd[hf + "self_attn.v_proj.weight"] = ws[p + "attn_v.weight"]
        sd[hf + "self_attn.q_norm.weight"] = ws[p + "attn_q_norm.weight"]
        sd[hf + "self_attn.k_norm.weight"] = ws[p + "attn_k_norm.weight"]
        sd[hf + "self_attn.o_proj.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "mlp.gate_proj.weight"] = ws[p + "ffn_gate.weight"]
        sd[hf + "mlp.up_proj.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.down_proj.weight"] = ws[p + "ffn_down.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "command-r", md, ws, m


# ------------------------------------------------------------ qwen2moe


def make_qwen2moe(rng, E=64, L=2, H=4, KV=2, V=160, n_ctx=128,
                  n_expert=4, n_used=2, moe_F=96, shared_F=128):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    hd = E // H
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output.weight": w.mat(V, E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_q.weight"] = w.mat(H * hd, E)
        ws[p + "attn_q.bias"] = w.vec(H * hd)
        ws[p + "attn_k.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_k.bias"] = w.vec(KV * hd)
        ws[p + "attn_v.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_v.bias"] = w.vec(KV * hd)
        ws[p + "attn_output.weight"] = w.mat(E, H * hd)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_gate_inp.weight"] = w.mat(n_expert, E)
        ws[p + "ffn_gate_exps.weight"] = np.stack([w.mat(moe_F, E) for _ in range(n_expert)])
        ws[p + "ffn_up_exps.weight"] = np.stack([w.mat(moe_F, E) for _ in range(n_expert)])
        ws[p + "ffn_down_exps.weight"] = np.stack([w.mat(E, moe_F) for _ in range(n_expert)])
        ws[p + "ffn_gate_inp_shexp.weight"] = w.mat(1, E)
        ws[p + "ffn_gate_shexp.weight"] = w.mat(shared_F, E)
        ws[p + "ffn_up_shexp.weight"] = w.mat(shared_F, E)
        ws[p + "ffn_down_shexp.weight"] = w.mat(E, shared_F)
    md = {
        "qwen2moe.embedding_length": np.uint32(E),
        "qwen2moe.block_count": np.uint32(L),
        "qwen2moe.attention.head_count": np.uint32(H),
        "qwen2moe.attention.head_count_kv": np.uint32(KV),
        "qwen2moe.feed_forward_length": np.uint32(moe_F),
        "qwen2moe.context_length": np.uint32(n_ctx),
        "qwen2moe.attention.layer_norm_rms_epsilon": np.float32(1e-5),
        "qwen2moe.expert_count": np.uint32(n_expert),
        "qwen2moe.expert_used_count": np.uint32(n_used),
        "qwen2moe.rope.freq_base": np.float32(10000.0),
        "qwen2moe.vocab_size": np.uint32(V),
    }
    cfg = Qwen2MoeConfig(
        vocab_size=V, hidden_size=E, intermediate_size=shared_F,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        moe_intermediate_size=moe_F, shared_expert_intermediate_size=shared_F,
        num_experts=n_expert, num_experts_per_tok=n_used, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[], max_position_embeddings=n_ctx,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_dropout=0.0, router_aux_loss_coef=0.0,
    )
    m = Qwen2MoeForCausalLM(cfg)
    sd = {
        "model.embed_tokens.weight": ws["token_embd.weight"],
        "model.norm.weight": ws["output_norm.weight"],
        "lm_head.weight": ws["output.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"model.layers.{i}."
        sd[hf + "input_layernorm.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "self_attn.q_proj.weight"] = ws[p + "attn_q.weight"]
        sd[hf + "self_attn.q_proj.bias"] = ws[p + "attn_q.bias"]
        sd[hf + "self_attn.k_proj.weight"] = ws[p + "attn_k.weight"]
        sd[hf + "self_attn.k_proj.bias"] = ws[p + "attn_k.bias"]
        sd[hf + "self_attn.v_proj.weight"] = ws[p + "attn_v.weight"]
        sd[hf + "self_attn.v_proj.bias"] = ws[p + "attn_v.bias"]
        sd[hf + "self_attn.o_proj.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "post_attention_layernorm.weight"] = ws[p + "ffn_norm.weight"]
        sd[hf + "mlp.gate.weight"] = ws[p + "ffn_gate_inp.weight"]
        for e in range(n_expert):
            sd[hf + f"mlp.experts.{e}.gate_proj.weight"] = ws[p + "ffn_gate_exps.weight"][e]
            sd[hf + f"mlp.experts.{e}.up_proj.weight"] = ws[p + "ffn_up_exps.weight"][e]
            sd[hf + f"mlp.experts.{e}.down_proj.weight"] = ws[p + "ffn_down_exps.weight"][e]
        sd[hf + "mlp.shared_expert_gate.weight"] = ws[p + "ffn_gate_inp_shexp.weight"]
        sd[hf + "mlp.shared_expert.gate_proj.weight"] = ws[p + "ffn_gate_shexp.weight"]
        sd[hf + "mlp.shared_expert.up_proj.weight"] = ws[p + "ffn_up_shexp.weight"]
        sd[hf + "mlp.shared_expert.down_proj.weight"] = ws[p + "ffn_down_shexp.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "qwen2moe", md, ws, m


MAKERS = {
    "gpt2": make_gpt2,
    "gptneox": make_gptneox,
    "falcon": make_falcon,
    "mpt": make_mpt,
    "starcoder": make_starcoder,
    "phi2": make_phi2,
    "bloom": make_bloom,
    "command-r": make_commandr,
    "qwen2moe": make_qwen2moe,
}


# ----------------------------------------------- deepseek2 (no HF oracle)


def make_deepseek2_weights(rng, E=64, L=2, H=4, V=160, n_ctx=128,
                           nope=16, rope=16, v_dim=16, q_rank=24, kv_rank=16,
                           n_expert=4, n_used=2, moe_F=64, shared_F=64,
                           dense_lead=1):
    """GGUF weights+metadata for a tiny deepseek2 (MLA + dense-lead + MoE
    with shared expert).  transformers has no offline DeepseekV2, so this
    fixture backs self-consistency tests only."""
    hd = nope + rope
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output.weight": w.mat(V, E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_q_a.weight"] = w.mat(q_rank, E)
        ws[p + "attn_q_a_norm.weight"] = w.norm(q_rank)
        ws[p + "attn_q_b.weight"] = w.mat(H * hd, q_rank)
        ws[p + "attn_kv_a_mqa.weight"] = w.mat(kv_rank + rope, E)
        ws[p + "attn_kv_a_norm.weight"] = w.norm(kv_rank)
        ws[p + "attn_kv_b.weight"] = w.mat(H * (nope + v_dim), kv_rank)
        ws[p + "attn_output.weight"] = w.mat(E, H * v_dim)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        if i < dense_lead:
            ws[p + "ffn_gate.weight"] = w.mat(moe_F, E)
            ws[p + "ffn_up.weight"] = w.mat(moe_F, E)
            ws[p + "ffn_down.weight"] = w.mat(E, moe_F)
        else:
            ws[p + "ffn_gate_inp.weight"] = w.mat(n_expert, E)
            ws[p + "ffn_gate_exps.weight"] = np.stack([w.mat(moe_F, E) for _ in range(n_expert)])
            ws[p + "ffn_up_exps.weight"] = np.stack([w.mat(moe_F, E) for _ in range(n_expert)])
            ws[p + "ffn_down_exps.weight"] = np.stack([w.mat(E, moe_F) for _ in range(n_expert)])
            ws[p + "ffn_gate_shexp.weight"] = w.mat(shared_F, E)
            ws[p + "ffn_up_shexp.weight"] = w.mat(shared_F, E)
            ws[p + "ffn_down_shexp.weight"] = w.mat(E, shared_F)
    md = {
        "deepseek2.embedding_length": np.uint32(E),
        "deepseek2.block_count": np.uint32(L),
        "deepseek2.attention.head_count": np.uint32(H),
        "deepseek2.attention.head_count_kv": np.uint32(H),
        "deepseek2.attention.key_length": np.uint32(hd),
        "deepseek2.attention.value_length": np.uint32(v_dim),
        "deepseek2.feed_forward_length": np.uint32(moe_F),
        "deepseek2.context_length": np.uint32(n_ctx),
        "deepseek2.attention.layer_norm_rms_epsilon": np.float32(1e-5),
        "deepseek2.rope.dimension_count": np.uint32(rope),
        "deepseek2.rope.freq_base": np.float32(10000.0),
        "deepseek2.attention.q_lora_rank": np.uint32(q_rank),
        "deepseek2.attention.kv_lora_rank": np.uint32(kv_rank),
        "deepseek2.leading_dense_block_count": np.uint32(dense_lead),
        "deepseek2.expert_count": np.uint32(n_expert),
        "deepseek2.expert_used_count": np.uint32(n_used),
        "deepseek2.expert_weights_scale": np.float32(2.0),
        "deepseek2.rope.scaling.yarn_log_multiplier": np.float32(0.1),
        "deepseek2.vocab_size": np.uint32(V),
    }
    return md, ws


# --------------------------------------------------- bitnet (no HF oracle)


def make_bitnet_weights(rng, E=64, L=2, H=4, KV=2, F=128, V=160, n_ctx=128):
    """Tiny bitnet b1.58: ternary-ish weights with per-projection scalar
    scales and pre-projection sub-norms (cf. build_bitnet)."""
    hd = E // H
    w = _W(rng)

    def ternary(n, k):
        return rng.integers(-1, 2, (n, k)).astype(np.float32)

    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_sub_norm.weight"] = w.norm(H * hd)
        ws[p + "attn_q.weight"] = ternary(H * hd, E)
        ws[p + "attn_q.scale"] = np.array([0.02], np.float32)
        ws[p + "attn_k.weight"] = ternary(KV * hd, E)
        ws[p + "attn_k.scale"] = np.array([0.03], np.float32)
        ws[p + "attn_v.weight"] = ternary(KV * hd, E)
        ws[p + "attn_v.scale"] = np.array([0.025], np.float32)
        ws[p + "attn_output.weight"] = ternary(E, H * hd)
        ws[p + "attn_output.scale"] = np.array([0.04], np.float32)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_sub_norm.weight"] = w.norm(F)
        ws[p + "ffn_gate.weight"] = ternary(F, E)
        ws[p + "ffn_gate.scale"] = np.array([0.02], np.float32)
        ws[p + "ffn_up.weight"] = ternary(F, E)
        ws[p + "ffn_up.scale"] = np.array([0.02], np.float32)
        ws[p + "ffn_down.weight"] = ternary(E, F)
        ws[p + "ffn_down.scale"] = np.array([0.03], np.float32)
    md = {
        "bitnet.embedding_length": np.uint32(E),
        "bitnet.block_count": np.uint32(L),
        "bitnet.attention.head_count": np.uint32(H),
        "bitnet.attention.head_count_kv": np.uint32(KV),
        "bitnet.feed_forward_length": np.uint32(F),
        "bitnet.context_length": np.uint32(n_ctx),
        "bitnet.attention.layer_norm_rms_epsilon": np.float32(1e-5),
        "bitnet.rope.freq_base": np.float32(10000.0),
        "bitnet.vocab_size": np.uint32(V),
    }
    return md, ws


# ---------------------------------------------------------------- olmo


def make_olmo(rng, E=64, L=2, H=4, KV=2, F=128, V=160, n_ctx=128):
    from transformers import OlmoConfig, OlmoForCausalLM

    hd = E // H
    w = _W(rng)

    def permute(x, n_head):
        out_dim = x.shape[0]
        return (x.reshape(n_head, 2, out_dim // n_head // 2, *x.shape[1:])
                .swapaxes(1, 2).reshape(x.shape))

    q = w.mat(H * hd, E)
    ws = {"token_embd.weight": w.mat(V, E), "output.weight": w.mat(V, E)}
    hf_qk = {}
    for i in range(L):
        p = f"blk.{i}."
        hf_qk[p + "q"] = w.mat(H * hd, E)
        hf_qk[p + "k"] = w.mat(KV * hd, E)
        ws[p + "attn_q.weight"] = permute(hf_qk[p + "q"], H)
        ws[p + "attn_k.weight"] = permute(hf_qk[p + "k"], KV)
        ws[p + "attn_v.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_output.weight"] = w.mat(E, H * hd)
        ws[p + "ffn_gate.weight"] = w.mat(F, E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
    md = {
        "olmo.embedding_length": np.uint32(E),
        "olmo.block_count": np.uint32(L),
        "olmo.attention.head_count": np.uint32(H),
        "olmo.attention.head_count_kv": np.uint32(KV),
        "olmo.feed_forward_length": np.uint32(F),
        "olmo.context_length": np.uint32(n_ctx),
        "olmo.attention.layer_norm_epsilon": np.float32(1e-5),
        "olmo.attention.clamp_kqv": np.float32(8.0),
        "olmo.rope.freq_base": np.float32(10000.0),
        "olmo.vocab_size": np.uint32(V),
    }
    cfg = OlmoConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=KV, clip_qkv=8.0,
        max_position_embeddings=n_ctx, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, attention_dropout=0.0,
    )
    m = OlmoForCausalLM(cfg)
    sd = {
        "model.embed_tokens.weight": ws["token_embd.weight"],
        "lm_head.weight": ws["output.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"model.layers.{i}."
        sd[hf + "self_attn.q_proj.weight"] = hf_qk[p + "q"]
        sd[hf + "self_attn.k_proj.weight"] = hf_qk[p + "k"]
        sd[hf + "self_attn.v_proj.weight"] = ws[p + "attn_v.weight"]
        sd[hf + "self_attn.o_proj.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "mlp.gate_proj.weight"] = ws[p + "ffn_gate.weight"]
        sd[hf + "mlp.up_proj.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.down_proj.weight"] = ws[p + "ffn_down.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "olmo", md, ws, m


# ------------------------------------------------------------ nemotron


def make_nemotron(rng, E=64, L=2, H=4, KV=2, F=128, V=160, n_ctx=128):
    from transformers import NemotronConfig, NemotronForCausalLM

    hd = E // H
    rot = hd // 2
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output.weight": w.mat(V, E),
    }
    hf_norms = {}
    for i in range(L):
        p = f"blk.{i}."
        # HF Nemotron LayerNorm1P computes LN(x)*(1+w)+b; the GGUF stores w+1
        hf_norms[p + "an"] = (0.1 * rng.standard_normal(E)).astype(np.float32)
        hf_norms[p + "fn"] = (0.1 * rng.standard_normal(E)).astype(np.float32)
        ws[p + "attn_norm.weight"] = 1.0 + hf_norms[p + "an"]
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "ffn_norm.weight"] = 1.0 + hf_norms[p + "fn"]
        ws[p + "ffn_norm.bias"] = w.vec(E)
        ws[p + "attn_q.weight"] = w.mat(H * hd, E)
        ws[p + "attn_k.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_v.weight"] = w.mat(KV * hd, E)
        ws[p + "attn_output.weight"] = w.mat(E, H * hd)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
    hf_norms["on"] = (0.1 * rng.standard_normal(E)).astype(np.float32)
    ws["output_norm.weight"] = 1.0 + hf_norms["on"]
    ws["output_norm.bias"] = w.vec(E)
    md = {
        "nemotron.embedding_length": np.uint32(E),
        "nemotron.block_count": np.uint32(L),
        "nemotron.attention.head_count": np.uint32(H),
        "nemotron.attention.head_count_kv": np.uint32(KV),
        "nemotron.feed_forward_length": np.uint32(F),
        "nemotron.context_length": np.uint32(n_ctx),
        "nemotron.attention.layer_norm_epsilon": np.float32(1e-5),
        "nemotron.rope.dimension_count": np.uint32(rot),
        "nemotron.rope.freq_base": np.float32(10000.0),
        "nemotron.vocab_size": np.uint32(V),
    }
    cfg = NemotronConfig(
        vocab_size=V, hidden_size=E, intermediate_size=F, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=KV,
        max_position_embeddings=n_ctx, rope_theta=10000.0,
        partial_rotary_factor=rot / hd, hidden_act="relu2", norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=False, attention_dropout=0.0,
    )
    m = NemotronForCausalLM(cfg)
    sd = {
        "model.embed_tokens.weight": ws["token_embd.weight"],
        "model.norm.weight": hf_norms["on"],
        "model.norm.bias": ws["output_norm.bias"],
        "lm_head.weight": ws["output.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"model.layers.{i}."
        sd[hf + "input_layernorm.weight"] = hf_norms[p + "an"]
        sd[hf + "input_layernorm.bias"] = ws[p + "attn_norm.bias"]
        sd[hf + "post_attention_layernorm.weight"] = hf_norms[p + "fn"]
        sd[hf + "post_attention_layernorm.bias"] = ws[p + "ffn_norm.bias"]
        sd[hf + "self_attn.q_proj.weight"] = ws[p + "attn_q.weight"]
        sd[hf + "self_attn.k_proj.weight"] = ws[p + "attn_k.weight"]
        sd[hf + "self_attn.v_proj.weight"] = ws[p + "attn_v.weight"]
        sd[hf + "self_attn.o_proj.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "mlp.up_proj.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "mlp.down_proj.weight"] = ws[p + "ffn_down.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "nemotron", md, ws, m


# ------------------------------------- chatglm / jais / exaone (no oracle)


def make_chatglm_weights(rng, E=64, L=2, H=4, KV=2, F=96, V=160, n_ctx=128):
    hd = E // H
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output.weight": w.mat(V, E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_qkv.weight"] = w.mat(E + 2 * KV * hd, E)
        ws[p + "attn_qkv.bias"] = w.vec(E + 2 * KV * hd)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_up.weight"] = w.mat(2 * F, E)  # packed [gate|up]
        ws[p + "ffn_down.weight"] = w.mat(E, F)
    md = {
        "chatglm.embedding_length": np.uint32(E),
        "chatglm.block_count": np.uint32(L),
        "chatglm.attention.head_count": np.uint32(H),
        "chatglm.attention.head_count_kv": np.uint32(KV),
        "chatglm.feed_forward_length": np.uint32(F),
        "chatglm.context_length": np.uint32(n_ctx),
        "chatglm.attention.layer_norm_rms_epsilon": np.float32(1e-5),
        "chatglm.rope.dimension_count": np.uint32(hd // 2),
        "chatglm.rope.freq_base": np.float32(10000.0),
        "chatglm.vocab_size": np.uint32(V),
    }
    return md, ws


def make_jais_weights(rng, E=64, L=2, H=4, F=96, V=160, n_ctx=128):
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
        "output_norm.bias": w.vec(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_norm.bias"] = w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat(3 * E, E)
        ws[p + "attn_qkv.bias"] = w.vec(3 * E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_norm.bias"] = w.vec(E)
        ws[p + "ffn_gate.weight"] = w.mat(F, E)
        ws[p + "ffn_gate.bias"] = w.vec(F)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
    md = {
        "jais.embedding_length": np.uint32(E),
        "jais.block_count": np.uint32(L),
        "jais.attention.head_count": np.uint32(H),
        "jais.feed_forward_length": np.uint32(F),
        "jais.context_length": np.uint32(n_ctx),
        "jais.attention.layer_norm_epsilon": np.float32(1e-5),
        "jais.attention.max_alibi_bias": np.float32(8.0),
        "jais.vocab_size": np.uint32(V),
    }
    return md, ws


MAKERS.update({"olmo": make_olmo, "nemotron": make_nemotron})


# ---------------------------------------------------------------- bert


def make_bert(rng, E=64, L=2, H=4, F=128, V=160, n_ctx=128):
    from transformers import BertConfig, BertModel

    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "position_embd.weight": w.mat(n_ctx, E),
        "token_types.weight": w.mat(2, E),
        "token_embd_norm.weight": w.norm(E),
        "token_embd_norm.bias": w.vec(E),
    }
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_q.weight"] = w.mat(E, E)
        ws[p + "attn_q.bias"] = w.vec(E)
        ws[p + "attn_k.weight"] = w.mat(E, E)
        ws[p + "attn_k.bias"] = w.vec(E)
        ws[p + "attn_v.weight"] = w.mat(E, E)
        ws[p + "attn_v.bias"] = w.vec(E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output.bias"] = w.vec(E)
        ws[p + "attn_output_norm.weight"] = w.norm(E)
        ws[p + "attn_output_norm.bias"] = w.vec(E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_up.bias"] = w.vec(F)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_down.bias"] = w.vec(E)
        ws[p + "layer_output_norm.weight"] = w.norm(E)
        ws[p + "layer_output_norm.bias"] = w.vec(E)
    md = {
        "bert.embedding_length": np.uint32(E),
        "bert.block_count": np.uint32(L),
        "bert.attention.head_count": np.uint32(H),
        "bert.feed_forward_length": np.uint32(F),
        "bert.context_length": np.uint32(n_ctx),
        "bert.attention.layer_norm_epsilon": np.float32(1e-5),
        "bert.attention.causal": False,
        "bert.vocab_size": np.uint32(V),
    }
    cfg = BertConfig(
        vocab_size=V, hidden_size=E, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=F, max_position_embeddings=n_ctx,
        hidden_act="gelu_new", layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    m = BertModel(cfg)
    sd = {
        "embeddings.word_embeddings.weight": ws["token_embd.weight"],
        "embeddings.position_embeddings.weight": ws["position_embd.weight"],
        "embeddings.token_type_embeddings.weight": ws["token_types.weight"],
        "embeddings.LayerNorm.weight": ws["token_embd_norm.weight"],
        "embeddings.LayerNorm.bias": ws["token_embd_norm.bias"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"encoder.layer.{i}."
        sd[hf + "attention.self.query.weight"] = ws[p + "attn_q.weight"]
        sd[hf + "attention.self.query.bias"] = ws[p + "attn_q.bias"]
        sd[hf + "attention.self.key.weight"] = ws[p + "attn_k.weight"]
        sd[hf + "attention.self.key.bias"] = ws[p + "attn_k.bias"]
        sd[hf + "attention.self.value.weight"] = ws[p + "attn_v.weight"]
        sd[hf + "attention.self.value.bias"] = ws[p + "attn_v.bias"]
        sd[hf + "attention.output.dense.weight"] = ws[p + "attn_output.weight"]
        sd[hf + "attention.output.dense.bias"] = ws[p + "attn_output.bias"]
        sd[hf + "attention.output.LayerNorm.weight"] = ws[p + "attn_output_norm.weight"]
        sd[hf + "attention.output.LayerNorm.bias"] = ws[p + "attn_output_norm.bias"]
        sd[hf + "intermediate.dense.weight"] = ws[p + "ffn_up.weight"]
        sd[hf + "intermediate.dense.bias"] = ws[p + "ffn_up.bias"]
        sd[hf + "output.dense.weight"] = ws[p + "ffn_down.weight"]
        sd[hf + "output.dense.bias"] = ws[p + "ffn_down.bias"]
        sd[hf + "output.LayerNorm.weight"] = ws[p + "layer_output_norm.weight"]
        sd[hf + "output.LayerNorm.bias"] = ws[p + "layer_output_norm.bias"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "bert", md, ws, m


# --------------------------------------------------------------- mamba


def make_mamba(rng, E=64, L=2, V=160, d_state=16, d_conv=4, expand=2, n_ctx=128):
    from transformers import MambaConfig, MambaForCausalLM

    di = expand * E
    dtr = max(1, E // 16)
    w = _W(rng)
    ws = {
        "token_embd.weight": w.mat(V, E),
        "output_norm.weight": w.norm(E),
    }
    hf_alog = {}
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "ssm_in.weight"] = w.mat(2 * di, E)
        ws[p + "ssm_conv1d.weight"] = w.mat(di, d_conv)
        ws[p + "ssm_conv1d.bias"] = w.vec(di)
        ws[p + "ssm_x.weight"] = w.mat(dtr + 2 * d_state, di)
        ws[p + "ssm_dt.weight"] = w.mat(di, dtr)
        ws[p + "ssm_dt.bias"] = w.vec(di)
        hf_alog[i] = np.log(1.0 + rng.random((di, d_state)).astype(np.float32) * 15)
        ws[p + "ssm_a"] = -np.exp(hf_alog[i])  # converter stores A = -exp(A_log)
        ws[p + "ssm_d"] = (1.0 + 0.1 * rng.standard_normal(di)).astype(np.float32)
        ws[p + "ssm_out.weight"] = w.mat(E, di)
    md = {
        "mamba.embedding_length": np.uint32(E),
        "mamba.block_count": np.uint32(L),
        "mamba.attention.head_count": np.uint32(0),
        "mamba.context_length": np.uint32(n_ctx),
        "mamba.feed_forward_length": np.uint32(0),
        "mamba.attention.layer_norm_rms_epsilon": np.float32(1e-5),
        "mamba.ssm.conv_kernel": np.uint32(d_conv),
        "mamba.ssm.inner_size": np.uint32(di),
        "mamba.ssm.state_size": np.uint32(d_state),
        "mamba.ssm.time_step_rank": np.uint32(dtr),
        "mamba.vocab_size": np.uint32(V),
    }
    cfg = MambaConfig(
        vocab_size=V, hidden_size=E, state_size=d_state, num_hidden_layers=L,
        conv_kernel=d_conv, expand=expand, time_step_rank=dtr,
        use_bias=False, use_conv_bias=True, layer_norm_epsilon=1e-5,
        tie_word_embeddings=True,
    )
    m = MambaForCausalLM(cfg)
    sd = {
        "backbone.embeddings.weight": ws["token_embd.weight"],
        "backbone.norm_f.weight": ws["output_norm.weight"],
    }
    for i in range(L):
        p, hf = f"blk.{i}.", f"backbone.layers.{i}."
        sd[hf + "norm.weight"] = ws[p + "attn_norm.weight"]
        sd[hf + "mixer.in_proj.weight"] = ws[p + "ssm_in.weight"]
        sd[hf + "mixer.conv1d.weight"] = ws[p + "ssm_conv1d.weight"][:, None, :]
        sd[hf + "mixer.conv1d.bias"] = ws[p + "ssm_conv1d.bias"]
        sd[hf + "mixer.x_proj.weight"] = ws[p + "ssm_x.weight"]
        sd[hf + "mixer.dt_proj.weight"] = ws[p + "ssm_dt.weight"]
        sd[hf + "mixer.dt_proj.bias"] = ws[p + "ssm_dt.bias"]
        sd[hf + "mixer.A_log"] = hf_alog[i]
        sd[hf + "mixer.D"] = ws[p + "ssm_d"]
        sd[hf + "mixer.out_proj.weight"] = ws[p + "ssm_out.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "mamba", md, ws, m


# ------------------------------------------------------------------ t5


def make_t5(rng, E=64, L=2, H=4, dkv=16, F=128, V=160, n_buckets=32):
    from transformers import T5Config, T5ForConditionalGeneration

    inner = H * dkv
    w = _W(rng)
    ws = {"token_embd.weight": w.mat(V, E), "output.weight": w.mat(V, E),
          "enc.output_norm.weight": w.norm(E), "dec.output_norm.weight": w.norm(E)}
    for i in range(L):
        for side in ("enc", "dec"):
            p = f"{side}.blk.{i}."
            ws[p + "attn_norm.weight"] = w.norm(E)
            ws[p + "attn_q.weight"] = w.mat(inner, E)
            ws[p + "attn_k.weight"] = w.mat(inner, E)
            ws[p + "attn_v.weight"] = w.mat(inner, E)
            ws[p + "attn_o.weight"] = w.mat(E, inner)
            if i == 0:
                ws[p + "attn_rel_b.weight"] = w.mat(n_buckets, H)
            ws[p + "ffn_norm.weight"] = w.norm(E)
            ws[p + "ffn_up.weight"] = w.mat(F, E)
            ws[p + "ffn_down.weight"] = w.mat(E, F)
        p = f"dec.blk.{i}."
        ws[p + "cross_attn_norm.weight"] = w.norm(E)
        ws[p + "cross_attn_q.weight"] = w.mat(inner, E)
        ws[p + "cross_attn_k.weight"] = w.mat(inner, E)
        ws[p + "cross_attn_v.weight"] = w.mat(inner, E)
        ws[p + "cross_attn_o.weight"] = w.mat(E, inner)
    md = {
        "t5.embedding_length": np.uint32(E),
        "t5.block_count": np.uint32(L),
        "t5.attention.head_count": np.uint32(H),
        "t5.attention.key_length": np.uint32(dkv),
        "t5.attention.value_length": np.uint32(dkv),
        "t5.feed_forward_length": np.uint32(F),
        "t5.context_length": np.uint32(128),
        "t5.attention.layer_norm_rms_epsilon": np.float32(1e-6),
        "t5.attention.relative_buckets_count": np.uint32(n_buckets),
        "t5.decoder_start_token_id": np.uint32(0),
        "t5.vocab_size": np.uint32(V),
    }
    cfg = T5Config(
        vocab_size=V, d_model=E, d_kv=dkv, d_ff=F, num_layers=L,
        num_decoder_layers=L, num_heads=H,
        relative_attention_num_buckets=n_buckets,
        relative_attention_max_distance=128, feed_forward_proj="relu",
        tie_word_embeddings=False, layer_norm_epsilon=1e-6, dropout_rate=0.0,
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
    )
    m = T5ForConditionalGeneration(cfg)
    sd = {"shared.weight": ws["token_embd.weight"],
          "lm_head.weight": ws["output.weight"],
          "encoder.final_layer_norm.weight": ws["enc.output_norm.weight"],
          "decoder.final_layer_norm.weight": ws["dec.output_norm.weight"]}
    for i in range(L):
        for side, hfside in (("enc", "encoder"), ("dec", "decoder")):
            p, hf = f"{side}.blk.{i}.", f"{hfside}.block.{i}."
            sd[hf + "layer.0.SelfAttention.q.weight"] = ws[p + "attn_q.weight"]
            sd[hf + "layer.0.SelfAttention.k.weight"] = ws[p + "attn_k.weight"]
            sd[hf + "layer.0.SelfAttention.v.weight"] = ws[p + "attn_v.weight"]
            sd[hf + "layer.0.SelfAttention.o.weight"] = ws[p + "attn_o.weight"]
            sd[hf + "layer.0.layer_norm.weight"] = ws[p + "attn_norm.weight"]
            if i == 0:
                sd[hf + "layer.0.SelfAttention.relative_attention_bias.weight"] = \
                    ws[p + "attn_rel_b.weight"]
            fidx = 1 if side == "enc" else 2
            sd[hf + f"layer.{fidx}.DenseReluDense.wi.weight"] = ws[p + "ffn_up.weight"]
            sd[hf + f"layer.{fidx}.DenseReluDense.wo.weight"] = ws[p + "ffn_down.weight"]
            sd[hf + f"layer.{fidx}.layer_norm.weight"] = ws[p + "ffn_norm.weight"]
        p, hf = f"dec.blk.{i}.", f"decoder.block.{i}."
        sd[hf + "layer.1.EncDecAttention.q.weight"] = ws[p + "cross_attn_q.weight"]
        sd[hf + "layer.1.EncDecAttention.k.weight"] = ws[p + "cross_attn_k.weight"]
        sd[hf + "layer.1.EncDecAttention.v.weight"] = ws[p + "cross_attn_v.weight"]
        sd[hf + "layer.1.EncDecAttention.o.weight"] = ws[p + "cross_attn_o.weight"]
        sd[hf + "layer.1.layer_norm.weight"] = ws[p + "cross_attn_norm.weight"]
    m.load_state_dict(_to_torch(sd), strict=False)
    m.eval()
    return "t5", md, ws, m
