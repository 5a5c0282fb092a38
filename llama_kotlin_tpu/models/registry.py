"""Architecture registry.

Tracks coverage of the reference's 44-arch zoo (llm_arch,
src/llama.cpp:171-216).  An arch is SUPPORTED when config_from_metadata +
the decoder in llama.py reproduce its forward pass; PLANNED archs need the
listed structural features.

The llama-family decoder already covers every arch whose block is
RMSNorm -> (GQA attention + RoPE) -> gated/ungated FFN with optional
qk-norms, biases, softcaps, sliding windows and MoE.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ArchInfo:
    name: str
    status: str  # "supported" | "planned" | "out-of-scope"
    notes: str = ""


ARCHES = [
    ArchInfo("llama", "supported", "LLaMA 1/2/3, Mistral, TinyLlama; rope freq-factors; MoE (Mixtral)"),
    ArchInfo("gemma", "supported", "gelu, embd scale sqrt(E), (1+w) norms, tied head"),
    ArchInfo("gemma2", "supported", "logit softcaps, pre/post-ffn norms, alternating SWA"),
    ArchInfo("qwen2", "supported", "qkv bias, NEOX rope"),
    ArchInfo("qwen2moe", "supported", "shared expert + sigmoid gate, raw top-k probs"),
    ArchInfo("stablelm", "supported", "qkv bias, NEOX rope, partial rotary via rope_dim"),
    ArchInfo("phi3", "supported", "NEOX rope, SWA; fused qkv split at load planned"),
    ArchInfo("internlm2", "supported", "llama-shaped"),
    ArchInfo("minicpm", "supported", "llama-shaped + scale factors"),
    ArchInfo("command-r", "supported", "parallel block, per-head qk LayerNorm, logit scale"),
    ArchInfo("deepseek2", "supported", "MLA (q/kv LoRA latents, split k/v dims), yarn mscale, scaled MoE + shared expert"),
    ArchInfo("falcon", "supported", "LayerNorm, dual norms (40B), parallel residual, GQA"),
    ArchInfo("gpt2", "supported", "LayerNorm, learned positions, fused qkv split at load"),
    ArchInfo("gptneox", "supported", "LayerNorm, parallel residual, partial rope"),
    ArchInfo("mpt", "supported", "ALiBi attention, LayerNorm, fused qkv"),
    ArchInfo("starcoder", "supported", "MQA, LayerNorm, learned positions"),
    ArchInfo("phi2", "supported", "parallel residual w/ shared norm, partial rope, output bias"),
    ArchInfo("bloom", "supported", "embedding LayerNorm, ALiBi, per-head fused qkv"),
    ArchInfo("starcoder2", "supported", "llama-shaped with biases"),
    ArchInfo("olmo", "supported", "non-parametric LayerNorm, clamp_kqv"),
    ArchInfo("chatglm", "supported", "fused qkv+bias, packed swiglu, half-dim rope"),
    ArchInfo("nemotron", "supported", "LayerNorm1P (+1 folded at convert), relu^2 FFN, partial rope"),
    ArchInfo("exaone", "supported", "llama-shaped, own metadata namespace"),
    ArchInfo("jais", "supported", "LayerNorm + ALiBi + biased gated swiglu"),
    ArchInfo("xverse", "supported", "llama-shaped"),
    ArchInfo("orion", "supported", "biased LayerNorm, llama-shaped otherwise"),
    ArchInfo("plamo", "supported", "shared-norm parallel residual"),
    ArchInfo("baichuan", "supported", "7B llama-shaped; 13B ALiBi (by layer count)"),
    ArchInfo("qwen", "supported", "fused qkv+bias, NEOX rope, rms"),
    ArchInfo("refact", "supported", "RMS norms + ALiBi, no rope"),
    ArchInfo("dbrx", "supported", "biasless LayerNorm, clamped fused qkv, normalized-top-k MoE"),
    ArchInfo("arctic", "supported", "dense FFN + parallel MoE branch (ffn_norm_exps)"),
    ArchInfo("codeshell", "supported", "LayerNorm+bias, gelu FFN, NEOX partial rope"),
    ArchInfo("grok", "supported", "scaled embd/logits, 30-softcap attention, gelu MoE, pre-residual out-norms"),
    ArchInfo("bert", "supported", "encoder-only: bidirectional post-norm blocks, token types, WPM tokenizer"),
    ArchInfo("openelm", "supported", "per-layer head/kv/ff arrays, fused qkv, per-head qk RMS norm, tied output"),
    ArchInfo("nomic-bert", "supported", "rope encoder, gated silu FFN"),
    ArchInfo("jina-bert-v2", "supported", "bidirectional ALiBi, gated gelu, mid-block re-norm"),
    ArchInfo("t5", "supported", "enc-dec: relative-position buckets, unscaled attention, cross-attention (models/t5.py T5Context)"),
    ArchInfo("t5encoder", "supported", "encoder-only t5 via the same loader/encode path"),
    ArchInfo("mamba", "supported", "selective SSM via lax.scan, recurrent-state MambaContext (models/mamba.py)"),
    ArchInfo("bitnet", "supported", "per-projection scalar scales, attn/ffn sub-norms, tied head"),
]


def support_status(arch: str) -> str:
    for a in ARCHES:
        if a.name == arch:
            return a.status
    return "unknown"
