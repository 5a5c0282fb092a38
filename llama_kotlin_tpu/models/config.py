"""Model hyper-parameters, mapped from GGUF metadata.

Parity target: llama_hparams + llm_load_hparams (reference src/llama.cpp:
2195-2370, 5108) — the subset needed by the llama-family archs first, with
the registry growing per arch (reference supports 44; see
models/registry.py for our coverage table).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from llama_kotlin_tpu.ops.rope import (
    ROPE_TYPE_NEOX,
    ROPE_TYPE_NONE,
    ROPE_TYPE_NORM,
    RopeParams,
)


@dataclass(eq=False)  # identity hash/eq: usable as a jit static argument
class ModelConfig:
    arch: str = "llama"
    name: str = ""
    vocab_size: int = 32000
    n_embd: int = 4096
    n_layer: int = 32
    n_head: int = 32
    n_head_kv: int = 32
    n_ff: int = 11008
    head_dim: int = 0  # 0 -> n_embd // n_head (the q/k head dim)
    v_head_dim: int = 0  # 0 -> head_dim (deepseek2 MLA: k=192, v=128)
    n_ctx_train: int = 2048
    rms_eps: float = 1e-5
    norm_eps: float = 1e-5
    use_rms_norm: bool = True
    norm_weight_offset: float = 0.0  # 1.0 for gemma's (1+w)
    act: str = "silu"
    ffn_gated: bool = True
    rope_type: int = ROPE_TYPE_NORM
    rope_freq_base: float = 10000.0
    rope_freq_scale: float = 1.0
    rope_dim: int = 0  # 0 -> head_dim
    rope_yarn_ext_factor: float = 0.0
    rope_yarn_attn_factor: float = 1.0
    rope_yarn_beta_fast: float = 32.0
    rope_yarn_beta_slow: float = 1.0
    rope_orig_ctx: int = 0
    n_expert: int = 0
    n_expert_used: int = 0
    embd_scale: float = 1.0  # gemma: sqrt(n_embd)
    attn_logit_softcap: float = 0.0  # gemma2
    final_logit_softcap: float = 0.0  # gemma2
    swa_window: int = 0  # sliding-window attention width (0 = off)
    swa_pattern: int = 1  # every Nth layer is full-attention (gemma2: 2)
    attn_qkv_bias: bool = False
    attn_out_bias: bool = False
    tie_word_embeddings: bool = False
    # LayerNorm-family arch knobs (gpt2/gptneox/falcon/mpt/starcoder/phi2/bloom)
    parallel_residual: bool = False  # h = h + attn(x) + ffn(x') (falcon/neox/phi2)
    clamp_kqv: float = 0.0  # olmo/dbrx q/k/v clamping (0 = off)
    swiglu_packed: bool = False  # chatglm: up proj packs [gate|up], silu-gated
    causal_attn: bool = True  # False for encoder-only (bert)
    post_norm: bool = False  # bert: norm AFTER each residual add
    logit_scale: float = 1.0  # command-r final logit multiplier
    moe_norm_topk: bool = True  # renormalize top-k router weights (mixtral yes, qwen2moe no)
    moe_expert_scale: float = 1.0  # deepseek2 expert_weights_scale (scale_w)
    rope_yarn_log_mul: float = 0.0  # deepseek2 yarn mscale correction
    learned_pos_embd: bool = False  # absolute position embedding table (gpt2)
    max_alibi_bias: float = 0.0  # ALiBi slope max (mpt/bloom); 0 = off
    token_embd_norm: bool = False  # LayerNorm right after embedding (bloom)
    add_type_embd: bool = False  # bert: add token-type-0 embedding
    # per-layer head/ff arrays (openelm; cf. hparams.n_head(il) arrays,
    # reference src/llama.cpp:2213-2215); None = uniform (the scalars).
    # The scalar fields then hold the MAX so cache shapes cover every layer.
    n_head_arr: Optional[tuple[int, ...]] = None
    n_head_kv_arr: Optional[tuple[int, ...]] = None
    n_ff_arr: Optional[tuple[int, ...]] = None
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.head_dim == 0:
            self.head_dim = self.n_embd // self.n_head
        if self.v_head_dim == 0:
            self.v_head_dim = self.head_dim
        if self.rope_dim == 0:
            self.rope_dim = self.head_dim

    @property
    def attn_scale(self) -> float:
        if self.rope_yarn_log_mul and self.rope_freq_scale != 1.0:
            # deepseek2 YaRN mscale² correction (cf. build_deepseek2 kq_scale)
            import math

            mscale = self.rope_yarn_attn_factor_base * (
                1.0 + self.rope_yarn_log_mul * math.log(1.0 / self.rope_freq_scale)
            )
            return mscale * mscale / (self.head_dim**0.5)
        return 1.0 / (self.head_dim**0.5)

    @property
    def rope_yarn_attn_factor_base(self) -> float:
        return 1.0  # cparams yarn_attn_factor default

    @property
    def attn_out_dim(self) -> int:
        return self.n_head * self.v_head_dim

    def rope_params(self) -> RopeParams:
        return RopeParams(
            n_rot=self.rope_dim,
            rope_type=self.rope_type,
            freq_base=self.rope_freq_base,
            freq_scale=self.rope_freq_scale,
            ext_factor=self.rope_yarn_ext_factor,
            attn_factor=self.rope_yarn_attn_factor,
            beta_fast=self.rope_yarn_beta_fast,
            beta_slow=self.rope_yarn_beta_slow,
            n_ctx_orig=self.rope_orig_ctx or self.n_ctx_train,
        )

    def layer_n_head(self, layer: int) -> int:
        return self.n_head_arr[layer] if self.n_head_arr else self.n_head

    def layer_n_head_kv(self, layer: int) -> int:
        return self.n_head_kv_arr[layer] if self.n_head_kv_arr else self.n_head_kv

    def layer_n_ff(self, layer: int) -> int:
        return self.n_ff_arr[layer] if self.n_ff_arr else self.n_ff

    def layer_swa_window(self, layer: int) -> int:
        """Sliding window for a given layer (0 = full attention)."""
        if self.swa_window <= 0:
            return 0
        if self.swa_pattern > 1 and (layer + 1) % self.swa_pattern == 0:
            return 0
        return self.swa_window


def _get(md: dict, arch: str, key: str, default=None):
    v = md.get(f"{arch}.{key}", default)
    if hasattr(v, "item"):
        v = v.item()
    return v


def _scalar_or_arr(v, default: int) -> tuple[int, Optional[tuple[int, ...]]]:
    """GGUF head_count/feed_forward_length may be per-layer arrays
    (openelm).  Returns (max_value, tuple_or_None)."""
    if v is None:
        return default, None
    if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0) == 1:
        arr = tuple(int(x) for x in v)
        return max(arr), arr
    return int(v), None


def config_from_metadata(md: dict) -> ModelConfig:
    """Build a ModelConfig from GGUF metadata KVs (cf. llm_load_hparams)."""
    arch = md.get("general.architecture", "llama")
    n_embd = int(_get(md, arch, "embedding_length", 4096))
    n_head, n_head_arr = _scalar_or_arr(
        md.get(f"{arch}.attention.head_count"), 32)
    n_head = n_head or 1  # mamba: 0
    n_head_kv, n_head_kv_arr = _scalar_or_arr(
        md.get(f"{arch}.attention.head_count_kv"), n_head)
    n_ff, n_ff_arr = _scalar_or_arr(
        md.get(f"{arch}.feed_forward_length"), 4 * n_embd)
    n_layer = int(_get(md, arch, "block_count", 32))
    cfg = ModelConfig(
        arch=arch,
        name=str(md.get("general.name", "")),
        n_embd=n_embd,
        n_layer=n_layer,
        n_head=n_head,
        n_head_kv=n_head_kv or n_head,
        n_ff=n_ff,
        n_head_arr=n_head_arr,
        n_head_kv_arr=n_head_kv_arr,
        n_ff_arr=n_ff_arr,
        head_dim=int(_get(md, arch, "attention.key_length", 0) or 0),
        v_head_dim=int(_get(md, arch, "attention.value_length", 0) or 0),
        n_ctx_train=int(_get(md, arch, "context_length", 2048)),
        rms_eps=float(_get(md, arch, "attention.layer_norm_rms_epsilon", 1e-5)),
        norm_eps=float(_get(md, arch, "attention.layer_norm_epsilon", 1e-5)),
        rope_freq_base=float(_get(md, arch, "rope.freq_base", 10000.0)),
        rope_dim=int(_get(md, arch, "rope.dimension_count", 0) or 0),
        n_expert=int(_get(md, arch, "expert_count", 0) or 0),
        n_expert_used=int(_get(md, arch, "expert_used_count", 0) or 0),
        swa_window=int(_get(md, arch, "attention.sliding_window", 0) or 0),
    )
    # vocab size: explicit key, else tokenizer table length
    vs = _get(md, arch, "vocab_size", None)
    if vs is None:
        toks = md.get("tokenizer.ggml.tokens")
        vs = len(toks) if toks is not None else 32000
    cfg.vocab_size = int(vs)

    # rope scaling (legacy pre-scaling.* GGUFs use {arch}.rope.scale_linear,
    # still honoured by llm_load_hparams — LLM_KV_ROPE_SCALE_LINEAR)
    scaling = _get(md, arch, "rope.scaling.type", "") or ""
    factor = _get(md, arch, "rope.scaling.factor", None)
    legacy_linear = _get(md, arch, "rope.scale_linear", None)
    if not scaling and not factor and legacy_linear:
        scaling, factor = "linear", legacy_linear
    if scaling == "linear" and factor:
        cfg.rope_freq_scale = 1.0 / float(factor)
    elif scaling == "yarn" and factor:
        cfg.rope_freq_scale = 1.0 / float(factor)
        cfg.rope_yarn_ext_factor = 1.0
        cfg.rope_orig_ctx = int(
            _get(md, arch, "rope.scaling.original_context_length", cfg.n_ctx_train)
        )

    # arch-specific adjustments (cf. per-arch cases in llm_load_hparams)
    # rope family split per llama_rope_type (reference src/llama.cpp:17960);
    # command-r/olmo/internlm2/minicpm/deepseek2 are NORM (adjacent pairs)
    if arch in ("falcon", "gptneox", "qwen2", "qwen2moe", "phi2", "phi3",
                "stablelm", "gemma", "gemma2", "starcoder2", "mistral3",
                "bitnet", "nemotron", "exaone", "qwen", "codeshell", "dbrx",
                "grok", "nomic-bert", "openelm"):
        cfg.rope_type = ROPE_TYPE_NEOX
    if arch == "openelm":
        # per-layer heads, fused qkv with per-head q/k RMS norm, output
        # tied to tok_embd (cf. build_openelm src/llama.cpp:13126 and the
        # TENSOR_DUPLICATED output at :7756)
        cfg.tie_word_embeddings = True
    if arch in ("gemma", "gemma2"):
        cfg.act = "gelu"
        cfg.embd_scale = float(n_embd) ** 0.5
        cfg.norm_weight_offset = 1.0
        cfg.tie_word_embeddings = True
    if arch == "gemma2":
        cfg.attn_logit_softcap = float(_get(md, arch, "attn_logit_softcapping", 50.0))
        cfg.final_logit_softcap = float(_get(md, arch, "final_logit_softcapping", 30.0))
        cfg.swa_window = cfg.swa_window or 4096
        cfg.swa_pattern = 2
    if arch in ("qwen2", "qwen2moe", "stablelm", "phi2"):
        cfg.attn_qkv_bias = True

    # LayerNorm family (cf. build_gpt2/build_gptneox/build_falcon/build_mpt/
    # build_starcoder/build_phi2/build_bloom in reference src/llama.cpp)
    if arch in ("gpt2", "gptneox", "falcon", "mpt", "starcoder", "phi2", "bloom"):
        cfg.use_rms_norm = False
        cfg.act = "gelu"
        cfg.ffn_gated = False
    if arch in ("gpt2", "starcoder", "mpt", "bloom", "jais"):
        cfg.rope_type = ROPE_TYPE_NONE
    if arch in ("gpt2", "starcoder"):
        cfg.learned_pos_embd = True
    if arch in ("mpt", "bloom"):
        cfg.max_alibi_bias = float(
            _get(md, arch, "attention.max_alibi_bias", 8.0) or 8.0
        )
    if arch == "bloom":
        cfg.token_embd_norm = True
    if arch == "gptneox":
        cfg.parallel_residual = bool(_get(md, arch, "use_parallel_residual", True))
    if arch in ("falcon", "phi2"):
        cfg.parallel_residual = True
    if arch == "command-r":
        # cf. build_command_r (LayerNorm w/o bias, shared-norm parallel
        # residual, scaled logits); FFN stays gated silu
        cfg.use_rms_norm = False
        cfg.parallel_residual = True
        cfg.tie_word_embeddings = True
        cfg.logit_scale = float(_get(md, arch, "logit_scale", 1.0) or 1.0)
    if arch == "qwen2moe":
        cfg.moe_norm_topk = False  # cf. build_qwen2moe norm_w=false
    if arch == "bert":
        # encoder-only (build_bert): post-norm blocks, bidirectional
        # attention, learned positions + token types, gelu FFN
        cfg.use_rms_norm = False
        cfg.causal_attn = False
        cfg.post_norm = True
        cfg.learned_pos_embd = True
        cfg.token_embd_norm = True
        cfg.add_type_embd = True
        cfg.act = "gelu"
        cfg.ffn_gated = False
        cfg.rope_type = ROPE_TYPE_NONE
    if arch == "nomic-bert":
        # bert block but NEOX rope instead of positions, gated silu FFN
        cfg.use_rms_norm = False
        cfg.causal_attn = False
        cfg.post_norm = True
        cfg.token_embd_norm = True
    if arch == "jina-bert-v2":
        # bert block with ALiBi, gated gelu, optional mid-block re-norm
        cfg.use_rms_norm = False
        cfg.causal_attn = False
        cfg.post_norm = True
        cfg.token_embd_norm = True
        cfg.act = "gelu"
        cfg.rope_type = ROPE_TYPE_NONE
        cfg.max_alibi_bias = float(
            _get(md, arch, "attention.max_alibi_bias", 8.0) or 8.0
        )
    if arch == "mamba":
        # cf. llm_load_hparams LLM_ARCH_MAMBA (ssm_* keys)
        cfg.extra.update(
            ssm_d_conv=int(_get(md, arch, "ssm.conv_kernel", 4) or 4),
            ssm_d_inner=int(_get(md, arch, "ssm.inner_size", 2 * n_embd)
                            or 2 * n_embd),
            ssm_d_state=int(_get(md, arch, "ssm.state_size", 16) or 16),
            ssm_dt_rank=int(_get(md, arch, "ssm.time_step_rank",
                                 (n_embd + 15) // 16) or ((n_embd + 15) // 16)),
            ssm_dt_b_c_rms=bool(_get(md, arch, "ssm.dt_b_c_rms", False)),
        )
    if arch == "olmo":
        # non-parametric LayerNorm (build_olmo passes NULL norm weights)
        cfg.use_rms_norm = False
        cfg.clamp_kqv = float(_get(md, arch, "attention.clamp_kqv", 0.0) or 0.0)
    if arch == "chatglm":
        cfg.ffn_gated = False
        cfg.swiglu_packed = True  # LLM_FFN_SWIGLU: up packs [gate|up]
    if arch == "nemotron":
        cfg.use_rms_norm = False
        cfg.act = "relu2"
        cfg.ffn_gated = False
    if arch == "orion":
        cfg.use_rms_norm = False  # biased LayerNorm, llama-shaped otherwise
    if arch == "plamo":
        cfg.parallel_residual = True  # shared attn_norm feeds attn + ffn
    if arch == "baichuan" and cfg.n_layer >= 40:
        # baichuan-13B: ALiBi instead of rope (7B is llama-shaped NORM rope)
        cfg.rope_type = ROPE_TYPE_NONE
        cfg.max_alibi_bias = 8.0
    if arch == "jais":
        cfg.use_rms_norm = False
        cfg.max_alibi_bias = float(
            _get(md, arch, "attention.max_alibi_bias", 8.0) or 8.0
        )
    if arch == "grok":
        # cf. build_grok: scaled embeddings/logits, 30-softcap attention
        # (tanh(s/30)*30 with s pre-scaled by 1/sqrt(hd)), gelu MoE
        cfg.embd_scale = 78.38367176906169
        cfg.logit_scale = 0.5773502691896257
        cfg.attn_logit_softcap = 30.0
        cfg.act = "gelu"
    if arch == "codeshell":
        cfg.use_rms_norm = False
        cfg.act = "gelu"
        cfg.ffn_gated = False
    if arch == "dbrx":
        cfg.use_rms_norm = False  # LayerNorm, no biases
        cfg.clamp_kqv = float(_get(md, arch, "attention.clamp_kqv", 0.0) or 0.0)
    if arch == "refact":
        cfg.rope_type = ROPE_TYPE_NONE
        cfg.max_alibi_bias = 8.0  # cf. build_refact (ALiBi, RMS norms)
    if arch == "deepseek2":
        # MLA + scaled MoE (cf. build_deepseek2 / llm_load_hparams deepseek2)
        cfg.moe_norm_topk = False
        cfg.moe_expert_scale = float(
            _get(md, arch, "expert_weights_scale", 1.0) or 1.0
        )
        cfg.rope_yarn_log_mul = float(
            _get(md, arch, "rope.scaling.yarn_log_multiplier", 0.0) or 0.0
        )
        if cfg.rope_freq_scale != 1.0:
            import math

            # pre-scaled rope attn factor (build_deepseek2 attn_factor_scaled)
            cfg.rope_yarn_attn_factor = 1.0 / (
                1.0 + 0.1 * math.log(1.0 / cfg.rope_freq_scale)
            )
        # rope applies only to the last rope_dim of each 192-wide qk head
        cfg.rope_dim = int(_get(md, arch, "rope.dimension_count", 64) or 64)
    return cfg
