"""HuggingFace checkpoint -> GGUF converter.

Parity target: archive/python/convert_hf_to_gguf.py (llama-family
coverage): maps HF config + safetensors/bin weights + tokenizer.json into
a GGUF with our tensor naming, the q/k RoPE row permutation, and the
tokenizer tables (BPE vocab+merges or Unigram pieces+scores).

Usage:
    python -m llama_kotlin_tpu.tools.convert_hf /path/to/hf_model out.gguf [--dtype f16]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from llama_kotlin_tpu.gguf import GGUFWriter
from llama_kotlin_tpu.quant.formats import GGMLQuantType

ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",
    "Qwen2ForCausalLM": "qwen2",
    "Gemma2ForCausalLM": "gemma2",
    "GemmaForCausalLM": "gemma",
    "GPT2LMHeadModel": "gpt2",
    "GPTNeoXForCausalLM": "gptneox",
}


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    out_dim = w.shape[0]
    return (w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def load_hf_weights(model_dir: Path):
    """Yield (name, numpy array) for every weight, without torch graphs."""
    idx_file = model_dir / "model.safetensors.index.json"
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        try:
            from safetensors.numpy import load_file

            for f in st_files:
                for name, arr in load_file(str(f)).items():
                    yield name, arr
            return
        except ImportError:
            pass
    import torch

    bins = sorted(model_dir.glob("pytorch_model*.bin")) or [model_dir / "pytorch_model.bin"]
    for b in bins:
        sd = torch.load(b, map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.to(torch.float32).numpy()


def map_tensor_name(hf_name: str) -> str | None:
    """HF llama-family name -> GGUF name (None = skip)."""
    n = hf_name
    if n == "model.embed_tokens.weight":
        return "token_embd.weight"
    if n == "model.norm.weight":
        return "output_norm.weight"
    if n == "lm_head.weight":
        return "output.weight"
    if not n.startswith("model.layers."):
        return None
    rest = n[len("model.layers."):]
    i, _, tail = rest.partition(".")
    m = {
        "input_layernorm.weight": "attn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "self_attn.q_proj.bias": "attn_q.bias",
        "self_attn.k_proj.bias": "attn_k.bias",
        "self_attn.v_proj.bias": "attn_v.bias",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
        "block_sparse_moe.gate.weight": "ffn_gate_inp.weight",
    }.get(tail)
    if m is None:
        # mixtral experts: block_sparse_moe.experts.E.w{1,2,3}.weight
        if tail.startswith("block_sparse_moe.experts."):
            return f"__expert__.{i}.{tail}"
        return None
    return f"blk.{i}.{m}"


def export_tokenizer(w: GGUFWriter, model_dir: Path, arch: str = "llama") -> None:
    tok_json = model_dir / "tokenizer.json"
    if not tok_json.exists():
        return
    tok = json.loads(tok_json.read_text(encoding="utf-8"))
    model = tok.get("model", {})
    added = {a["id"]: a for a in tok.get("added_tokens", [])}
    cfg = {}
    cfg_file = model_dir / "tokenizer_config.json"
    if cfg_file.exists():
        cfg = json.loads(cfg_file.read_text(encoding="utf-8"))

    if model.get("type") == "BPE":
        vocab = model["vocab"]  # token -> id
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        tokens = [t for t, _ in ordered]
        types = np.full(len(tokens), 1, np.int32)
        for tid, a in added.items():
            if tid < len(types):
                types[tid] = 3 if a.get("special") else 4
        merges = model.get("merges", [])
        merges = [m if isinstance(m, str) else " ".join(m) for m in merges]
        w.add_kv("tokenizer.ggml.model", "gpt2")
        # pretokenizer family per arch (the reference converter detects it
        # from a tokenizer hash; arch is an adequate proxy for the models
        # this converter covers)
        pre = {"qwen2": "qwen2", "gpt2": "gpt-2", "gptneox": "gpt-2",
               "gemma": "default", "gemma2": "default"}.get(arch, "llama-bpe")
        w.add_kv("tokenizer.ggml.pre", pre)
        w.add_kv("tokenizer.ggml.tokens", tokens)
        w.add_kv("tokenizer.ggml.token_type", types)
        w.add_kv("tokenizer.ggml.merges", merges)
    elif model.get("type") == "Unigram":
        pieces = model["vocab"]  # [piece, score] pairs
        tokens = [p[0] for p in pieces]
        scores = np.asarray([p[1] for p in pieces], np.float32)
        types = np.full(len(tokens), 1, np.int32)
        unk = model.get("unk_id")
        if unk is not None:
            types[unk] = 2
        for tid, a in added.items():
            if tid < len(types):
                types[tid] = 3 if a.get("special") else 4
        for i, t in enumerate(tokens):
            if t.startswith("<0x") and t.endswith(">") and len(t) == 6:
                types[i] = 6
        w.add_kv("tokenizer.ggml.model", "llama")
        w.add_kv("tokenizer.ggml.tokens", tokens)
        w.add_kv("tokenizer.ggml.scores", scores)
        w.add_kv("tokenizer.ggml.token_type", types)
    else:
        return
    if "chat_template" in cfg:
        w.add_kv("tokenizer.chat_template", cfg["chat_template"])
    for key, kv in (("bos_token_id", "tokenizer.ggml.bos_token_id"),
                    ("eos_token_id", "tokenizer.ggml.eos_token_id")):
        gen = model_dir / "generation_config.json"
        val = None
        if gen.exists():
            val = json.loads(gen.read_text()).get(key)
        if isinstance(val, list):
            val = val[0]
        if val is not None:
            w.add_kv(kv, np.uint32(val))


# (gguf name, transform) — transform: None | "T" (Conv1D) | "qkv_head"
_GPT2_MAP = {
    "wte.weight": ("token_embd.weight", None),
    "wpe.weight": ("position_embd.weight", None),
    "ln_f.weight": ("output_norm.weight", None),
    "ln_f.bias": ("output_norm.bias", None),
    "ln_1.weight": ("attn_norm.weight", None),
    "ln_1.bias": ("attn_norm.bias", None),
    "attn.c_attn.weight": ("attn_qkv.weight", "T"),
    "attn.c_attn.bias": ("attn_qkv.bias", None),
    "attn.c_proj.weight": ("attn_output.weight", "T"),
    "attn.c_proj.bias": ("attn_output.bias", None),
    "ln_2.weight": ("ffn_norm.weight", None),
    "ln_2.bias": ("ffn_norm.bias", None),
    "mlp.c_fc.weight": ("ffn_up.weight", "T"),
    "mlp.c_fc.bias": ("ffn_up.bias", None),
    "mlp.c_proj.weight": ("ffn_down.weight", "T"),
    "mlp.c_proj.bias": ("ffn_down.bias", None),
}

_NEOX_MAP = {
    "embed_in.weight": ("token_embd.weight", None),
    "final_layer_norm.weight": ("output_norm.weight", None),
    "final_layer_norm.bias": ("output_norm.bias", None),
    "input_layernorm.weight": ("attn_norm.weight", None),
    "input_layernorm.bias": ("attn_norm.bias", None),
    "attention.query_key_value.weight": ("attn_qkv.weight", "qkv_head"),
    "attention.query_key_value.bias": ("attn_qkv.bias", "qkv_head"),
    "attention.dense.weight": ("attn_output.weight", None),
    "attention.dense.bias": ("attn_output.bias", None),
    "post_attention_layernorm.weight": ("ffn_norm.weight", None),
    "post_attention_layernorm.bias": ("ffn_norm.bias", None),
    "mlp.dense_h_to_4h.weight": ("ffn_up.weight", None),
    "mlp.dense_h_to_4h.bias": ("ffn_up.bias", None),
    "mlp.dense_4h_to_h.weight": ("ffn_down.weight", None),
    "mlp.dense_4h_to_h.bias": ("ffn_down.bias", None),
}


def _deinterleave_qkv(arr: np.ndarray, n_head: int) -> np.ndarray:
    """HF gptneox per-head [q,k,v] rows -> contiguous q|k|v."""
    hd = arr.shape[0] // (3 * n_head)
    a = arr.reshape(n_head, 3, hd, *arr.shape[1:])
    return np.concatenate([a[:, 0], a[:, 1], a[:, 2]], axis=0).reshape(arr.shape)


def _convert_gpt_family(w: GGUFWriter, arch: str, hf_cfg: dict, model_dir: Path,
                        out_t, progress=None) -> None:
    """GPT-2 (Conv1D layout, learned positions) and GPT-NeoX (interleaved
    fused qkv, partial rope, parallel residual) conversion — cf. the
    GPT2Model / GPTNeoXModel classes of the reference converter."""
    if arch == "gpt2":
        E = hf_cfg["n_embd"]
        H = hf_cfg["n_head"]
        L = hf_cfg["n_layer"]
        w.add_kv("gpt2.embedding_length", np.uint32(E))
        w.add_kv("gpt2.block_count", np.uint32(L))
        w.add_kv("gpt2.attention.head_count", np.uint32(H))
        w.add_kv("gpt2.feed_forward_length",
                 np.uint32(hf_cfg.get("n_inner") or 4 * E))
        w.add_kv("gpt2.context_length", np.uint32(hf_cfg.get("n_positions", 1024)))
        w.add_kv("gpt2.attention.layer_norm_epsilon",
                 np.float32(hf_cfg.get("layer_norm_epsilon", 1e-5)))
        w.add_kv("gpt2.vocab_size", np.uint32(hf_cfg["vocab_size"]))
        prefix, layer_prefix, tmap = "transformer.", "h.", _GPT2_MAP
    else:  # gptneox
        E = hf_cfg["hidden_size"]
        H = hf_cfg["num_attention_heads"]
        L = hf_cfg["num_hidden_layers"]
        hd = E // H
        w.add_kv("gptneox.embedding_length", np.uint32(E))
        w.add_kv("gptneox.block_count", np.uint32(L))
        w.add_kv("gptneox.attention.head_count", np.uint32(H))
        w.add_kv("gptneox.feed_forward_length", np.uint32(hf_cfg["intermediate_size"]))
        w.add_kv("gptneox.context_length",
                 np.uint32(hf_cfg.get("max_position_embeddings", 2048)))
        w.add_kv("gptneox.attention.layer_norm_epsilon",
                 np.float32(hf_cfg.get("layer_norm_eps", 1e-5)))
        w.add_kv("gptneox.rope.dimension_count",
                 np.uint32(int(hd * hf_cfg.get("rotary_pct", 1.0))))
        w.add_kv("gptneox.rope.freq_base",
                 np.float32(hf_cfg.get("rope_theta",
                                       hf_cfg.get("rotary_emb_base", 10000.0))))
        w.add_kv("gptneox.use_parallel_residual",
                 bool(hf_cfg.get("use_parallel_residual", True)))
        w.add_kv("gptneox.vocab_size", np.uint32(hf_cfg["vocab_size"]))
        prefix, layer_prefix, tmap = "gpt_neox.", "layers.", _NEOX_MAP

    export_tokenizer(w, model_dir, arch)
    count = 0
    for hf_name, arr in load_hf_weights(model_dir):
        n = hf_name
        if n == "embed_out.weight":  # neox untied head
            name, tf = "output.weight", None
        elif n.startswith(prefix):
            rest = n[len(prefix):]
            if rest.startswith(layer_prefix):
                li, _, tail = rest[len(layer_prefix):].partition(".")
                hit = tmap.get(tail)
                if hit is None:
                    continue
                name, tf = f"blk.{li}.{hit[0]}", hit[1]
            else:
                hit = tmap.get(rest)
                if hit is None:
                    continue
                name, tf = hit
        else:
            continue
        arr = np.asarray(arr, np.float32)
        if tf == "T":
            arr = arr.T
        elif tf == "qkv_head":
            arr = _deinterleave_qkv(arr, H)
        t = GGMLQuantType.F32 if arr.ndim == 1 or "norm" in name else out_t
        w.add_tensor(name, np.ascontiguousarray(arr), t)
        count += 1
        if progress:
            progress(count, name)


def convert(model_dir: str | Path, out_path: str | Path, dtype: str = "f16",
            progress=None) -> None:
    model_dir = Path(model_dir)
    hf_cfg = json.loads((model_dir / "config.json").read_text())
    arch_cls = (hf_cfg.get("architectures") or ["LlamaForCausalLM"])[0]
    arch = ARCH_MAP.get(arch_cls, "llama")
    out_t0 = GGMLQuantType.F16 if dtype == "f16" else \
        GGMLQuantType.BF16 if dtype == "bf16" else GGMLQuantType.F32
    if arch in ("gpt2", "gptneox"):
        w = GGUFWriter()
        w.add_kv("general.architecture", arch)
        w.add_kv("general.name", model_dir.name)
        _convert_gpt_family(w, arch, hf_cfg, model_dir, out_t0, progress)
        w.write(out_path)
        return
    n_head = hf_cfg["num_attention_heads"]
    n_kv = hf_cfg.get("num_key_value_heads", n_head)
    n_embd = hf_cfg["hidden_size"]

    w = GGUFWriter()
    w.add_kv("general.architecture", arch)
    w.add_kv("general.name", model_dir.name)
    w.add_kv(f"{arch}.embedding_length", np.uint32(n_embd))
    w.add_kv(f"{arch}.block_count", np.uint32(hf_cfg["num_hidden_layers"]))
    w.add_kv(f"{arch}.attention.head_count", np.uint32(n_head))
    w.add_kv(f"{arch}.attention.head_count_kv", np.uint32(n_kv))
    w.add_kv(f"{arch}.feed_forward_length", np.uint32(hf_cfg["intermediate_size"]))
    w.add_kv(f"{arch}.context_length", np.uint32(hf_cfg.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.rope.freq_base", np.float32(hf_cfg.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             np.float32(hf_cfg.get("rms_norm_eps", 1e-5)))
    w.add_kv(f"{arch}.vocab_size", np.uint32(hf_cfg["vocab_size"]))
    head_dim = hf_cfg.get("head_dim") or n_embd // n_head
    w.add_kv(f"{arch}.attention.key_length", np.uint32(head_dim))
    w.add_kv(f"{arch}.rope.dimension_count", np.uint32(head_dim))
    if hf_cfg.get("num_local_experts"):
        w.add_kv(f"{arch}.expert_count", np.uint32(hf_cfg["num_local_experts"]))
        w.add_kv(f"{arch}.expert_used_count", np.uint32(hf_cfg.get("num_experts_per_tok", 2)))
    rope_scaling = hf_cfg.get("rope_scaling") or {}
    if rope_scaling.get("type") == "linear" or rope_scaling.get("rope_type") == "linear":
        w.add_kv(f"{arch}.rope.scaling.type", "linear")
        w.add_kv(f"{arch}.rope.scaling.factor", np.float32(rope_scaling.get("factor", 1.0)))

    export_tokenizer(w, model_dir, arch)

    out_t = GGMLQuantType.F16 if dtype == "f16" else \
        GGMLQuantType.BF16 if dtype == "bf16" else GGMLQuantType.F32
    experts: dict[tuple[str, str], dict[int, np.ndarray]] = {}
    count = 0
    for hf_name, arr in load_hf_weights(model_dir):
        name = map_tensor_name(hf_name)
        if name is None:
            continue
        arr = np.asarray(arr, np.float32)
        if name.startswith("__expert__."):
            _, i, tail = name.split(".", 2)
            parts = tail.split(".")
            e_idx = int(parts[2])
            kind = {"w1": "ffn_gate_exps", "w2": "ffn_down_exps", "w3": "ffn_up_exps"}[parts[3]]
            experts.setdefault((i, kind), {})[e_idx] = arr
            continue
        # q/k row permutation applies ONLY to NORM-rope (adjacent-pair)
        # arches — the llama family.  NEOX-rope arches (qwen2, gemma 1/2,
        # gptneox) rotate half-split dims, exactly the HF layout, so their
        # rows must stay unpermuted (cf. llama_rope_type, src/llama.cpp).
        norm_rope = arch == "llama"
        if norm_rope and (name.endswith("attn_q.weight")
                          or name.endswith("attn_q.bias")):
            arr = permute_qk(arr, n_head)
        elif norm_rope and (name.endswith("attn_k.weight")
                            or name.endswith("attn_k.bias")):
            arr = permute_qk(arr, n_kv)
        t = GGMLQuantType.F32 if arr.ndim == 1 or "norm" in name else out_t
        w.add_tensor(name, arr, t)
        count += 1
        if progress:
            progress(count, name)
    for (i, kind), emap in sorted(experts.items()):
        stacked = np.stack([emap[e] for e in sorted(emap)])
        w.add_tensor(f"blk.{i}.{kind}.weight", stacked, out_t)
    w.write(out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("output")
    ap.add_argument("--dtype", choices=["f16", "bf16", "f32"], default="f16")
    args = ap.parse_args()

    def progress(i, name):
        sys.stderr.write(f"[{i}] {name}\n")

    convert(args.model_dir, args.output, args.dtype, progress=progress)
    print(args.output)


if __name__ == "__main__":
    main()
