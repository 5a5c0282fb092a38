"""Test fixtures: synthetic tiny-llama GGUF files.

Mirrors the reference's TestGGUFGenerator fixture pattern (synthesize GGUF
in memory) plus the HF->GGUF conversion conventions of
archive/python/convert_hf_to_gguf.py (q/k row permutation between HF's
rotate-half RoPE layout and the GGUF NORM layout) so that logits can be
cross-checked against transformers' LlamaForCausalLM as an independent
oracle.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from llama_kotlin_tpu.gguf import GGUFWriter
from llama_kotlin_tpu.quant.formats import GGMLQuantType


def tiny_llama_dims(n_embd=64, n_layer=2, n_head=4, n_head_kv=2, n_ff=96, vocab=160,
                    n_ctx=256, rope_base=10000.0):
    return dict(n_embd=n_embd, n_layer=n_layer, n_head=n_head, n_head_kv=n_head_kv,
                n_ff=n_ff, vocab=vocab, n_ctx=n_ctx, rope_base=rope_base)


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half layout -> GGUF NORM (adjacent-pair) layout, the same
    row permutation conversion scripts apply to q_proj/k_proj."""
    out_dim = w.shape[0]
    return (
        w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def spm_vocab_kvs(vocab_size: int, fim: bool = False) -> dict:
    """Minimal SPM tokenizer metadata for CLI/tool tests.  With fim=True,
    ids 3-6 become <PRE>/<SUF>/<MID>/<EOT> infill specials."""
    import string

    toks = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    if fim:
        toks += ["<PRE>", "<SUF>", "<MID>", "<EOT>"]
        types += [3, 3, 3, 3]
    pieces = (["▁"] + list(string.ascii_lowercase)
              + ["▁" + c for c in string.ascii_lowercase]
              + list(string.digits) + [".", ",", "!", "?"])
    i = 0
    while len(toks) < vocab_size:
        toks.append(pieces[i] if i < len(pieces) else f"tok{i}")
        types.append(1)
        i += 1
    scores = [-float(i) for i in range(len(toks))]
    kv = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": [np.float32(s) for s in scores],
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.bos_token_id": np.uint32(1),
        "tokenizer.ggml.eos_token_id": np.uint32(2),
        "tokenizer.ggml.unknown_token_id": np.uint32(0),
    }
    if fim:
        kv.update({
            "tokenizer.ggml.prefix_token_id": np.uint32(3),
            "tokenizer.ggml.suffix_token_id": np.uint32(4),
            "tokenizer.ggml.middle_token_id": np.uint32(5),
            "tokenizer.ggml.eot_token_id": np.uint32(6),
        })
    return kv


def write_llama_gguf(path: Path, weights: dict[str, np.ndarray], dims: dict,
                     qtype=GGMLQuantType.F32, quant_keys=("attn", "ffn", "embd", "output"),
                     extra_kv: dict | None = None):
    """Write a llama-arch GGUF from numpy weights (our naming, already in
    GGUF orientation [out, in] and NORM rope layout)."""
    w = GGUFWriter()
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "tiny-test")
    w.add_kv("llama.embedding_length", np.uint32(dims["n_embd"]))
    w.add_kv("llama.block_count", np.uint32(dims["n_layer"]))
    w.add_kv("llama.attention.head_count", np.uint32(dims["n_head"]))
    w.add_kv("llama.attention.head_count_kv", np.uint32(dims["n_head_kv"]))
    w.add_kv("llama.feed_forward_length", np.uint32(dims["n_ff"]))
    w.add_kv("llama.context_length", np.uint32(dims["n_ctx"]))
    w.add_kv("llama.rope.freq_base", np.float32(dims["rope_base"]))
    w.add_kv("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add_kv("llama.vocab_size", np.uint32(dims["vocab"]))
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)

    def pick_type(name: str) -> GGMLQuantType:
        if name.endswith("_norm.weight") or name == "output_norm.weight":
            return GGMLQuantType.F32
        if qtype == GGMLQuantType.F32:
            return GGMLQuantType.F32
        # quantized types need K % block == 0
        from llama_kotlin_tpu.quant.formats import TYPE_TRAITS

        bs = TYPE_TRAITS[qtype].block_size
        if weights[name].shape[-1] % bs != 0:
            return GGMLQuantType.F32
        return qtype

    for name, arr in weights.items():
        w.add_tensor(name, arr.astype(np.float32), pick_type(name))
    w.write(path)


def random_llama_weights(dims: dict, rng, scale=0.05) -> dict[str, np.ndarray]:
    E, L = dims["n_embd"], dims["n_layer"]
    H, KV, F, V = dims["n_head"], dims["n_head_kv"], dims["n_ff"], dims["vocab"]
    hd = E // H

    def mat(n, k):
        return (rng.standard_normal((n, k)) * scale).astype(np.float32)

    ws = {
        "token_embd.weight": mat(V, E),
        "output_norm.weight": 1.0 + 0.1 * rng.standard_normal(E).astype(np.float32),
        "output.weight": mat(V, E),
    }
    for i in range(L):
        ws[f"blk.{i}.attn_norm.weight"] = 1.0 + 0.1 * rng.standard_normal(E).astype(np.float32)
        ws[f"blk.{i}.attn_q.weight"] = mat(H * hd, E)
        ws[f"blk.{i}.attn_k.weight"] = mat(KV * hd, E)
        ws[f"blk.{i}.attn_v.weight"] = mat(KV * hd, E)
        ws[f"blk.{i}.attn_output.weight"] = mat(E, H * hd)
        ws[f"blk.{i}.ffn_norm.weight"] = 1.0 + 0.1 * rng.standard_normal(E).astype(np.float32)
        ws[f"blk.{i}.ffn_gate.weight"] = mat(F, E)
        ws[f"blk.{i}.ffn_up.weight"] = mat(F, E)
        ws[f"blk.{i}.ffn_down.weight"] = mat(E, F)
    return ws


def build_hf_llama(weights: dict[str, np.ndarray], dims: dict):
    """Construct a transformers LlamaForCausalLM carrying the same weights
    (inverse q/k permutation applied)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    E, H, KV = dims["n_embd"], dims["n_head"], dims["n_head_kv"]
    hd = E // H
    cfg = LlamaConfig(
        vocab_size=dims["vocab"], hidden_size=E, intermediate_size=dims["n_ff"],
        num_hidden_layers=dims["n_layer"], num_attention_heads=H,
        num_key_value_heads=KV, max_position_embeddings=dims["n_ctx"],
        rope_theta=dims["rope_base"], rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    sd = {}

    def inv_permute(w, n_head):
        out_dim = w.shape[0]
        return (
            w.reshape(n_head, out_dim // n_head // 2, 2, *w.shape[1:])
            .swapaxes(1, 2)
            .reshape(w.shape)
        )

    sd["model.embed_tokens.weight"] = weights["token_embd.weight"]
    sd["model.norm.weight"] = weights["output_norm.weight"]
    sd["lm_head.weight"] = weights["output.weight"]
    for i in range(dims["n_layer"]):
        sd[f"model.layers.{i}.input_layernorm.weight"] = weights[f"blk.{i}.attn_norm.weight"]
        sd[f"model.layers.{i}.self_attn.q_proj.weight"] = inv_permute(
            weights[f"blk.{i}.attn_q.weight"], H
        )
        sd[f"model.layers.{i}.self_attn.k_proj.weight"] = inv_permute(
            weights[f"blk.{i}.attn_k.weight"], KV
        )
        sd[f"model.layers.{i}.self_attn.v_proj.weight"] = weights[f"blk.{i}.attn_v.weight"]
        sd[f"model.layers.{i}.self_attn.o_proj.weight"] = weights[f"blk.{i}.attn_output.weight"]
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = weights[f"blk.{i}.ffn_norm.weight"]
        sd[f"model.layers.{i}.mlp.gate_proj.weight"] = weights[f"blk.{i}.ffn_gate.weight"]
        sd[f"model.layers.{i}.mlp.up_proj.weight"] = weights[f"blk.{i}.ffn_up.weight"]
        sd[f"model.layers.{i}.mlp.down_proj.weight"] = weights[f"blk.{i}.ffn_down.weight"]
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})
    model.eval()
    return model


def tiny_mixtral_dims(n_embd=64, n_layer=2, n_head=4, n_head_kv=2, n_ff=96,
                      vocab=160, n_expert=4, n_expert_used=2, n_ctx=256,
                      rope_base=10000.0):
    d = tiny_llama_dims(n_embd, n_layer, n_head, n_head_kv, n_ff, vocab, n_ctx, rope_base)
    d["n_expert"] = n_expert
    d["n_expert_used"] = n_expert_used
    return d


def random_mixtral_weights(dims: dict, rng, scale=0.05) -> dict[str, np.ndarray]:
    ws = random_llama_weights(dims, rng, scale)
    E, F = dims["n_embd"], dims["n_ff"]
    ne = dims["n_expert"]
    for i in range(dims["n_layer"]):
        del ws[f"blk.{i}.ffn_gate.weight"]
        del ws[f"blk.{i}.ffn_up.weight"]
        del ws[f"blk.{i}.ffn_down.weight"]
        ws[f"blk.{i}.ffn_gate_inp.weight"] = (rng.standard_normal((ne, E)) * scale).astype(np.float32)
        ws[f"blk.{i}.ffn_gate_exps.weight"] = (rng.standard_normal((ne, F, E)) * scale).astype(np.float32)
        ws[f"blk.{i}.ffn_up_exps.weight"] = (rng.standard_normal((ne, F, E)) * scale).astype(np.float32)
        ws[f"blk.{i}.ffn_down_exps.weight"] = (rng.standard_normal((ne, E, F)) * scale).astype(np.float32)
    return ws


def write_mixtral_gguf(path, weights, dims, qtype=GGMLQuantType.F32,
                       extra_kv: dict | None = None):
    from llama_kotlin_tpu.gguf import GGUFWriter

    w = GGUFWriter()
    for k, v in (extra_kv or {}).items():
        w.add_kv(k, v)
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "tiny-moe")
    w.add_kv("llama.embedding_length", np.uint32(dims["n_embd"]))
    w.add_kv("llama.block_count", np.uint32(dims["n_layer"]))
    w.add_kv("llama.attention.head_count", np.uint32(dims["n_head"]))
    w.add_kv("llama.attention.head_count_kv", np.uint32(dims["n_head_kv"]))
    w.add_kv("llama.feed_forward_length", np.uint32(dims["n_ff"]))
    w.add_kv("llama.context_length", np.uint32(dims["n_ctx"]))
    w.add_kv("llama.rope.freq_base", np.float32(dims["rope_base"]))
    w.add_kv("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add_kv("llama.vocab_size", np.uint32(dims["vocab"]))
    w.add_kv("llama.expert_count", np.uint32(dims["n_expert"]))
    w.add_kv("llama.expert_used_count", np.uint32(dims["n_expert_used"]))
    for name, arr in weights.items():
        t = GGMLQuantType.F32 if (arr.ndim == 1 or "norm" in name) else qtype
        from llama_kotlin_tpu.quant.formats import TYPE_TRAITS

        if arr.shape[-1] % TYPE_TRAITS[t].block_size != 0:
            t = GGMLQuantType.F32
        w.add_tensor(name, arr.astype(np.float32), t)
    w.write(path)


def build_hf_mixtral(weights: dict, dims: dict):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    E, H, KV = dims["n_embd"], dims["n_head"], dims["n_head_kv"]
    cfg = MixtralConfig(
        vocab_size=dims["vocab"], hidden_size=E, intermediate_size=dims["n_ff"],
        num_hidden_layers=dims["n_layer"], num_attention_heads=H,
        num_key_value_heads=KV, max_position_embeddings=dims["n_ctx"],
        rope_theta=dims["rope_base"], rms_norm_eps=1e-5,
        num_local_experts=dims["n_expert"], num_experts_per_tok=dims["n_expert_used"],
        tie_word_embeddings=False, router_aux_loss_coef=0.0,
    )
    model = MixtralForCausalLM(cfg)
    sd = {}

    def inv_permute(w, n_head):
        out_dim = w.shape[0]
        return (w.reshape(n_head, out_dim // n_head // 2, 2, *w.shape[1:])
                .swapaxes(1, 2).reshape(w.shape))

    sd["model.embed_tokens.weight"] = weights["token_embd.weight"]
    sd["model.norm.weight"] = weights["output_norm.weight"]
    sd["lm_head.weight"] = weights["output.weight"]
    for i in range(dims["n_layer"]):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = weights[f"blk.{i}.attn_norm.weight"]
        sd[p + "self_attn.q_proj.weight"] = inv_permute(weights[f"blk.{i}.attn_q.weight"], H)
        sd[p + "self_attn.k_proj.weight"] = inv_permute(weights[f"blk.{i}.attn_k.weight"], KV)
        sd[p + "self_attn.v_proj.weight"] = weights[f"blk.{i}.attn_v.weight"]
        sd[p + "self_attn.o_proj.weight"] = weights[f"blk.{i}.attn_output.weight"]
        sd[p + "post_attention_layernorm.weight"] = weights[f"blk.{i}.ffn_norm.weight"]
        sd[p + "block_sparse_moe.gate.weight"] = weights[f"blk.{i}.ffn_gate_inp.weight"]
        for e in range(dims["n_expert"]):
            sd[p + f"block_sparse_moe.experts.{e}.w1.weight"] = weights[f"blk.{i}.ffn_gate_exps.weight"][e]
            sd[p + f"block_sparse_moe.experts.{e}.w2.weight"] = weights[f"blk.{i}.ffn_down_exps.weight"][e]
            sd[p + f"block_sparse_moe.experts.{e}.w3.weight"] = weights[f"blk.{i}.ffn_up_exps.weight"][e]
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})
    model.eval()
    return model
