"""LayerNorm arch family parity tests vs transformers oracles.

Covers gpt2 (learned pos embd, fused Conv1D qkv), gptneox (parallel
residual, partial rope), falcon (dual norms, GQA, parallel), mpt (ALiBi),
starcoder (MQA), phi2 (shared-norm parallel residual, output bias) and
bloom (embedding LayerNorm + ALiBi) — the reference's build_* graph
builders for these arches (src/llama.cpp).
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext

from tests.arch_fixtures import MAKERS, write_arch_gguf

# erf-GELU archs in HF vs ggml's tanh GELU: small systematic activation
# difference, absorbed by a looser tolerance
_ATOL = {"falcon": 6e-3, "mpt": 6e-3}


@pytest.mark.parametrize("arch", sorted(MAKERS))
def test_arch_logits_match_transformers(arch, tmp_path):
    import torch

    rng = np.random.default_rng(hash(arch) % 2**31)
    name, md, ws, hf = MAKERS[arch](rng)
    assert name == arch
    path = tmp_path / f"{arch}.gguf"
    write_arch_gguf(path, arch, md, ws)

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.arch == arch
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)

    toks = np.array([3, 17, 42, 9, 101, 55, 7, 23], np.int32)
    rc = ctx.decode(Batch.single(toks, logits_last_only=False))
    assert rc == 0
    ours = ctx.get_logits()

    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))).logits[0].numpy()

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=_ATOL.get(arch, 5e-4), rtol=5e-3)


@pytest.mark.parametrize("arch", ["gpt2", "falcon"])
def test_arch_incremental_decode(arch, tmp_path):
    """Token-by-token decode equals full prefill (cache correctness under
    the arch's attention variant)."""
    rng = np.random.default_rng(5)
    _, md, ws, _ = MAKERS[arch](rng)
    path = tmp_path / f"{arch}.gguf"
    write_arch_gguf(path, arch, md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()

    toks = np.array([5, 9, 3, 88, 22, 61], np.int32)
    ctx1 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ctx1.decode(Batch.single(toks, logits_last_only=False))
    full = ctx1.get_logits()

    ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    step_logits = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=np.array([t]), pos=np.array([i], np.int32),
                          seq_id=np.array([0], np.int32),
                          output=np.array([1], np.int8)))
        step_logits.append(ctx2.get_logits()[0])
    np.testing.assert_allclose(full, np.stack(step_logits), atol=2e-4, rtol=2e-3)


def test_deepseek2_mla_self_consistency(tmp_path):
    """deepseek2 (MLA, dense-lead + scaled MoE + shared expert): loads,
    decodes, and incremental decode matches batch prefill — the invariant
    that exercises the split-dim KV cache (k 32-wide, v 16-wide)."""
    from tests.arch_fixtures import make_deepseek2_weights

    rng = np.random.default_rng(13)
    md, ws = make_deepseek2_weights(rng)
    path = tmp_path / "ds2.gguf"
    write_arch_gguf(path, "deepseek2", md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.head_dim == 32 and cfg.v_head_dim == 16
    assert cfg.moe_expert_scale == 2.0 and not cfg.moe_norm_topk
    assert params["layers"][0].get("ffn_gate") is not None  # dense lead
    assert params["layers"][1].get("ffn_gate_exps") is not None

    toks = np.array([3, 17, 42, 9, 101, 55], np.int32)
    ctx1 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    assert ctx1.decode(Batch.single(toks, logits_last_only=False)) == 0
    full = ctx1.get_logits()
    assert np.isfinite(full).all()

    ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    steps = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=np.array([t]), pos=np.array([i], np.int32),
                          seq_id=np.array([0], np.int32),
                          output=np.array([1], np.int8)))
        steps.append(ctx2.get_logits()[0])
    np.testing.assert_allclose(full, np.stack(steps), atol=2e-4, rtol=2e-3)


def test_bitnet_self_consistency(tmp_path):
    """bitnet: per-projection scales + sub-norms, tied lm head; incremental
    decode matches batch prefill and scales actually apply."""
    from tests.arch_fixtures import make_bitnet_weights

    rng = np.random.default_rng(31)
    md, ws = make_bitnet_weights(rng)
    path = tmp_path / "bn.gguf"
    write_arch_gguf(path, "bitnet", md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    lp0 = params["layers"][0]
    assert lp0.get("wq_scale") is not None and lp0.get("attn_sub_norm") is not None
    assert params.get("output") is None  # tied head

    toks = np.array([3, 17, 42, 9, 101], np.int32)
    ctx1 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    assert ctx1.decode(Batch.single(toks, logits_last_only=False)) == 0
    full = ctx1.get_logits()
    assert np.isfinite(full).all()

    ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    steps = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=np.array([t]), pos=np.array([i], np.int32),
                          seq_id=np.array([0], np.int32),
                          output=np.array([1], np.int8)))
        steps.append(ctx2.get_logits()[0])
    np.testing.assert_allclose(full, np.stack(steps), atol=2e-4, rtol=2e-3)

    # scales are load-bearing: zeroing wq_scale changes logits
    import copy
    p2 = {k: v for k, v in params.items()}
    p2["layers"] = [dict(l) for l in params["layers"]]
    p2["layers"][0]["wq_scale"] = jnp.zeros_like(p2["layers"][0]["wq_scale"])
    ctx3 = LlamaContext(cfg, p2, n_cells=64, compute_dtype=jnp.float32)
    ctx3.decode(Batch.single(toks, logits_last_only=False))
    assert np.abs(ctx3.get_logits() - full).max() > 1e-4


@pytest.mark.parametrize("arch,make", [
    ("chatglm", "make_chatglm_weights"),
    ("jais", "make_jais_weights"),
])
def test_arch_self_consistency(arch, make, tmp_path):
    """chatglm (packed swiglu, fused qkv+bias, half-dim rope) and jais
    (LN + ALiBi + biased gated ffn): incremental == prefill."""
    import tests.arch_fixtures as AF

    rng = np.random.default_rng(41)
    md, ws = getattr(AF, make)(rng)
    path = tmp_path / f"{arch}.gguf"
    write_arch_gguf(path, arch, md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.arch == arch
    toks = np.array([3, 17, 42, 9, 101], np.int32)
    ctx1 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    assert ctx1.decode(Batch.single(toks, logits_last_only=False)) == 0
    full = ctx1.get_logits()
    assert np.isfinite(full).all()
    ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    steps = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=np.array([t]), pos=np.array([i], np.int32),
                          seq_id=np.array([0], np.int32),
                          output=np.array([1], np.int8)))
        steps.append(ctx2.get_logits()[0])
    np.testing.assert_allclose(full, np.stack(steps), atol=2e-4, rtol=2e-3)


def test_exaone_arch_maps_to_llama_shape(tmp_path):
    """exaone is llama-shaped with its own metadata namespace."""
    from llama_kotlin_tpu.models.config import config_from_metadata
    from llama_kotlin_tpu.ops.rope import ROPE_TYPE_NEOX

    md = {"general.architecture": "exaone",
          "exaone.embedding_length": 64, "exaone.block_count": 2,
          "exaone.attention.head_count": 4,
          "exaone.attention.head_count_kv": 2,
          "exaone.feed_forward_length": 128, "exaone.context_length": 256,
          "exaone.vocab_size": 160}
    cfg = config_from_metadata(md)
    assert cfg.arch == "exaone" and cfg.n_embd == 64
    assert cfg.rope_type == ROPE_TYPE_NEOX and cfg.use_rms_norm


def test_bert_hidden_states_match_transformers(tmp_path):
    """bert encoder: bidirectional post-norm blocks; our final hidden
    states must match BertModel.last_hidden_state."""
    import torch
    from tests.arch_fixtures import make_bert

    rng = np.random.default_rng(8)
    arch, md, ws, hf = make_bert(rng)
    path = tmp_path / "bert.gguf"
    write_arch_gguf(path, arch, md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert not cfg.causal_attn and cfg.post_norm
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)

    toks = np.array([3, 17, 42, 9, 101, 55], np.int32)
    rc = ctx.decode(Batch.single(toks, logits_last_only=False))
    assert rc == 0
    ours = ctx.get_embeddings(pooling="none")  # [n, E] final hidden

    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))
                    ).last_hidden_state[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-3)


def test_mamba_logits_match_transformers(tmp_path):
    """mamba SSM: full-prefill logits parity vs MambaForCausalLM, plus
    recurrent-state incremental decode == prefill."""
    import torch
    from tests.arch_fixtures import make_mamba
    from llama_kotlin_tpu.models.mamba import MambaContext

    rng = np.random.default_rng(17)
    arch, md, ws, hf = make_mamba(rng)
    path = tmp_path / "mamba.gguf"
    write_arch_gguf(path, arch, md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.arch == "mamba" and cfg.extra["ssm_d_state"] == 16

    ctx = MambaContext(cfg, params)
    toks = np.array([3, 17, 42, 9, 101, 55], np.int32)
    ctx.decode(toks)
    ours = ctx.get_logits()[0]  # [T, V]
    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=5e-3)

    # incremental recurrence matches the parallel prefill
    ctx2 = MambaContext(cfg, params)
    steps = []
    for t in toks:
        ctx2.decode(np.array([t], np.int32))
        steps.append(ctx2.get_logits()[0, -1])
    np.testing.assert_allclose(np.stack(steps), ours, atol=1e-3, rtol=5e-3)


@pytest.mark.parametrize("arch,tweaks", [
    ("xverse", {}),
    ("orion", {"norm_bias": True}),
    ("plamo", {}),
    ("baichuan", {"n_layer_md": 40, "no_rope": True}),
    ("qwen", {}),
    ("refact", {}),
    ("codeshell", {"norm_bias": True, "nongated": True}),
])
def test_llama_shaped_arch_variants(arch, tweaks, tmp_path):
    """xverse (llama-shaped), orion (biased LN), plamo (shared-norm
    parallel), baichuan-13B (ALiBi): load + incremental == prefill."""
    from tests.fixtures import random_llama_weights, tiny_llama_dims

    rng = np.random.default_rng(57)
    dims = tiny_llama_dims()
    ws = random_llama_weights(dims, rng)
    if tweaks.get("norm_bias"):
        for i in range(dims["n_layer"]):
            ws[f"blk.{i}.attn_norm.bias"] = (0.05 * rng.standard_normal(dims["n_embd"])).astype(np.float32)
            ws[f"blk.{i}.ffn_norm.bias"] = (0.05 * rng.standard_normal(dims["n_embd"])).astype(np.float32)
        ws["output_norm.bias"] = (0.05 * rng.standard_normal(dims["n_embd"])).astype(np.float32)
    if tweaks.get("nongated"):
        for i in range(dims["n_layer"]):
            del ws[f"blk.{i}.ffn_gate.weight"]
    md = {
        f"{arch}.embedding_length": np.uint32(dims["n_embd"]),
        f"{arch}.block_count": np.uint32(tweaks.get("n_layer_md", dims["n_layer"])),
        f"{arch}.attention.head_count": np.uint32(dims["n_head"]),
        f"{arch}.attention.head_count_kv": np.uint32(dims["n_head_kv"]),
        f"{arch}.feed_forward_length": np.uint32(dims["n_ff"]),
        f"{arch}.context_length": np.uint32(dims["n_ctx"]),
        f"{arch}.attention.layer_norm_rms_epsilon": np.float32(1e-5),
        f"{arch}.attention.layer_norm_epsilon": np.float32(1e-5),
        f"{arch}.rope.freq_base": np.float32(10000.0),
        f"{arch}.vocab_size": np.uint32(dims["vocab"]),
    }
    if tweaks.get("n_layer_md"):  # baichuan-13B layer count drives alibi;
        md[f"{arch}.block_count"] = np.uint32(dims["n_layer"])
    path = tmp_path / f"{arch}.gguf"
    write_arch_gguf(path, arch, md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.arch == arch
    if tweaks.get("no_rope"):
        # emulate 13B rule on the tiny model by patching the cfg directly
        from llama_kotlin_tpu.ops.rope import ROPE_TYPE_NONE
        cfg.rope_type = ROPE_TYPE_NONE
        cfg.max_alibi_bias = 8.0

    toks = np.array([3, 17, 42, 9, 101], np.int32)
    ctx1 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    assert ctx1.decode(Batch.single(toks, logits_last_only=False)) == 0
    full = ctx1.get_logits()
    assert np.isfinite(full).all()
    ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    steps = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=np.array([t]), pos=np.array([i], np.int32),
                          seq_id=np.array([0], np.int32),
                          output=np.array([1], np.int8)))
        steps.append(ctx2.get_logits()[0])
    np.testing.assert_allclose(full, np.stack(steps), atol=2e-4, rtol=2e-3)


def _self_consistency(cfg, params, toks=None):
    toks = toks if toks is not None else np.array([3, 17, 42, 9, 101], np.int32)
    ctx1 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    assert ctx1.decode(Batch.single(toks, logits_last_only=False)) == 0
    full = ctx1.get_logits()
    assert np.isfinite(full).all()
    ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    steps = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=np.array([t]), pos=np.array([i], np.int32),
                          seq_id=np.array([0], np.int32),
                          output=np.array([1], np.int8)))
        steps.append(ctx2.get_logits()[0])
    np.testing.assert_allclose(full, np.stack(steps), atol=2e-4, rtol=2e-3)
    return full


def test_dbrx_self_consistency(tmp_path):
    """dbrx: biasless LayerNorm, fused clamped qkv, attn_output_norm as the
    pre-FFN norm, normalized-top-k MoE."""
    from tests.arch_fixtures import _W, write_arch_gguf

    rng = np.random.default_rng(71)
    E, L, H, KV, F, V, NE = 64, 2, 4, 2, 96, 160, 4
    hd = E // H
    w = _W(rng)
    ws = {"token_embd.weight": w.mat(V, E), "output_norm.weight": w.norm(E),
          "output.weight": w.mat(V, E)}
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_qkv.weight"] = w.mat(E + 2 * KV * hd, E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output_norm.weight"] = w.norm(E)
        ws[p + "ffn_gate_inp.weight"] = w.mat(NE, E)
        ws[p + "ffn_gate_exps.weight"] = np.stack([w.mat(F, E) for _ in range(NE)])
        ws[p + "ffn_up_exps.weight"] = np.stack([w.mat(F, E) for _ in range(NE)])
        ws[p + "ffn_down_exps.weight"] = np.stack([w.mat(E, F) for _ in range(NE)])
    md = {"dbrx.embedding_length": np.uint32(E), "dbrx.block_count": np.uint32(L),
          "dbrx.attention.head_count": np.uint32(H),
          "dbrx.attention.head_count_kv": np.uint32(KV),
          "dbrx.feed_forward_length": np.uint32(F),
          "dbrx.context_length": np.uint32(128),
          "dbrx.attention.layer_norm_epsilon": np.float32(1e-5),
          "dbrx.attention.clamp_kqv": np.float32(8.0),
          "dbrx.expert_count": np.uint32(NE), "dbrx.expert_used_count": np.uint32(2),
          "dbrx.rope.freq_base": np.float32(10000.0),
          "dbrx.vocab_size": np.uint32(V)}
    path = tmp_path / "dbrx.gguf"
    write_arch_gguf(path, "dbrx", md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert not cfg.use_rms_norm and cfg.clamp_kqv == 8.0
    _self_consistency(cfg, params)


def test_arctic_self_consistency(tmp_path):
    """arctic: dense FFN + parallel MoE branch over ffn_norm_exps."""
    from tests.arch_fixtures import _W, write_arch_gguf

    rng = np.random.default_rng(72)
    E, L, H, KV, F, V, NE = 64, 2, 4, 2, 96, 160, 4
    w = _W(rng)
    ws = {"token_embd.weight": w.mat(V, E), "output_norm.weight": w.norm(E),
          "output.weight": w.mat(V, E)}
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_q.weight"] = w.mat(E, E)
        ws[p + "attn_k.weight"] = w.mat(KV * (E // H), E)
        ws[p + "attn_v.weight"] = w.mat(KV * (E // H), E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "ffn_gate.weight"] = w.mat(F, E)
        ws[p + "ffn_up.weight"] = w.mat(F, E)
        ws[p + "ffn_down.weight"] = w.mat(E, F)
        ws[p + "ffn_norm_exps.weight"] = w.norm(E)
        ws[p + "ffn_gate_inp.weight"] = w.mat(NE, E)
        ws[p + "ffn_gate_exps.weight"] = np.stack([w.mat(F, E) for _ in range(NE)])
        ws[p + "ffn_up_exps.weight"] = np.stack([w.mat(F, E) for _ in range(NE)])
        ws[p + "ffn_down_exps.weight"] = np.stack([w.mat(E, F) for _ in range(NE)])
    md = {"arctic.embedding_length": np.uint32(E), "arctic.block_count": np.uint32(L),
          "arctic.attention.head_count": np.uint32(H),
          "arctic.attention.head_count_kv": np.uint32(KV),
          "arctic.feed_forward_length": np.uint32(F),
          "arctic.context_length": np.uint32(128),
          "arctic.attention.layer_norm_rms_epsilon": np.float32(1e-5),
          "arctic.expert_count": np.uint32(NE), "arctic.expert_used_count": np.uint32(2),
          "arctic.rope.freq_base": np.float32(10000.0),
          "arctic.vocab_size": np.uint32(V)}
    path = tmp_path / "arctic.gguf"
    write_arch_gguf(path, "arctic", md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert params["layers"][0].get("ffn_norm_exps") is not None
    # both the dense and MoE branches are load-bearing
    full = _self_consistency(cfg, params)
    p2 = {k: v for k, v in params.items()}
    p2["layers"] = [dict(l) for l in params["layers"]]
    for l in p2["layers"]:
        l["ffn_norm_exps"] = jnp.zeros_like(l["ffn_norm_exps"])
    ctx = LlamaContext(cfg, p2, n_cells=64, compute_dtype=jnp.float32)
    ctx.decode(Batch.single(np.array([3, 17, 42, 9, 101], np.int32),
                            logits_last_only=False))
    assert np.abs(ctx.get_logits() - full).max() > 1e-5


def test_grok_self_consistency(tmp_path):
    """grok: scaled embeddings/logits, softcap attention, gelu MoE with
    pre-residual attn/layer out-norms."""
    from tests.arch_fixtures import _W, write_arch_gguf

    rng = np.random.default_rng(73)
    E, L, H, KV, F, V, NE = 64, 2, 4, 2, 96, 160, 4
    w = _W(rng)
    ws = {"token_embd.weight": w.mat(V, E), "output_norm.weight": w.norm(E),
          "output.weight": w.mat(V, E)}
    for i in range(L):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = w.norm(E)
        ws[p + "attn_q.weight"] = w.mat(E, E)
        ws[p + "attn_k.weight"] = w.mat(KV * (E // H), E)
        ws[p + "attn_v.weight"] = w.mat(KV * (E // H), E)
        ws[p + "attn_output.weight"] = w.mat(E, E)
        ws[p + "attn_output_norm.weight"] = w.norm(E)
        ws[p + "ffn_norm.weight"] = w.norm(E)
        ws[p + "layer_output_norm.weight"] = w.norm(E)
        ws[p + "ffn_gate_inp.weight"] = w.mat(NE, E)
        ws[p + "ffn_gate_exps.weight"] = np.stack([w.mat(F, E) for _ in range(NE)])
        ws[p + "ffn_up_exps.weight"] = np.stack([w.mat(F, E) for _ in range(NE)])
        ws[p + "ffn_down_exps.weight"] = np.stack([w.mat(E, F) for _ in range(NE)])
    md = {"grok.embedding_length": np.uint32(E), "grok.block_count": np.uint32(L),
          "grok.attention.head_count": np.uint32(H),
          "grok.attention.head_count_kv": np.uint32(KV),
          "grok.feed_forward_length": np.uint32(F),
          "grok.context_length": np.uint32(128),
          "grok.attention.layer_norm_rms_epsilon": np.float32(1e-5),
          "grok.expert_count": np.uint32(NE), "grok.expert_used_count": np.uint32(2),
          "grok.rope.freq_base": np.float32(10000.0),
          "grok.vocab_size": np.uint32(V)}
    path = tmp_path / "grok.gguf"
    write_arch_gguf(path, "grok", md, ws)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.attn_logit_softcap == 30.0 and cfg.embd_scale > 78
    assert params["layers"][0].get("post_attn_norm") is not None  # aliased
    _self_consistency(cfg, params)


def test_nomic_and_jina_bert_variants(tmp_path):
    """nomic-bert (rope encoder, gated silu) and jina-bert-v2 (bidirectional
    ALiBi, gated gelu, mid-block re-norm): finite + batch==rerun."""
    from tests.arch_fixtures import _W, write_arch_gguf

    for arch in ("nomic-bert", "jina-bert-v2"):
        rng = np.random.default_rng(91)
        E, L, H, F, V = 64, 2, 4, 96, 160
        w = _W(rng)
        ws = {"token_embd.weight": w.mat(V, E),
              "token_embd_norm.weight": w.norm(E),
              "token_embd_norm.bias": w.vec(E)}
        for i in range(L):
            p = f"blk.{i}."
            if arch == "nomic-bert":
                ws[p + "attn_qkv.weight"] = w.mat(3 * E, E)
            else:
                ws[p + "attn_q.weight"] = w.mat(E, E)
                ws[p + "attn_q.bias"] = w.vec(E)
                ws[p + "attn_k.weight"] = w.mat(E, E)
                ws[p + "attn_k.bias"] = w.vec(E)
                ws[p + "attn_v.weight"] = w.mat(E, E)
                ws[p + "attn_v.bias"] = w.vec(E)
                ws[p + "attn_norm_2.weight"] = w.norm(E)
                ws[p + "attn_norm_2.bias"] = w.vec(E)
            ws[p + "attn_output.weight"] = w.mat(E, E)
            ws[p + "attn_output_norm.weight"] = w.norm(E)
            ws[p + "attn_output_norm.bias"] = w.vec(E)
            ws[p + "ffn_gate.weight"] = w.mat(F, E)
            ws[p + "ffn_up.weight"] = w.mat(F, E)
            ws[p + "ffn_down.weight"] = w.mat(E, F)
            ws[p + "layer_output_norm.weight"] = w.norm(E)
            ws[p + "layer_output_norm.bias"] = w.vec(E)
        md = {f"{arch}.embedding_length": np.uint32(E),
              f"{arch}.block_count": np.uint32(L),
              f"{arch}.attention.head_count": np.uint32(H),
              f"{arch}.feed_forward_length": np.uint32(F),
              f"{arch}.context_length": np.uint32(128),
              f"{arch}.attention.layer_norm_epsilon": np.float32(1e-5),
              f"{arch}.rope.freq_base": np.float32(10000.0),
              f"{arch}.vocab_size": np.uint32(V)}
        path = tmp_path / f"{arch}.gguf"
        write_arch_gguf(path, arch, md, ws)
        cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
        f.close()
        assert not cfg.causal_attn and cfg.post_norm, arch
        ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
        toks = np.array([3, 17, 42, 9, 101], np.int32)
        assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
        e1 = ctx.get_embeddings(pooling="none")
        assert np.isfinite(e1).all(), arch
        ctx2 = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
        ctx2.decode(Batch.single(toks, logits_last_only=False))
        np.testing.assert_allclose(ctx2.get_embeddings(pooling="none"), e1,
                                   atol=1e-5)


def test_t5_encdec_matches_transformers(tmp_path):
    """t5: encoder hidden states AND enc-dec logits parity vs
    T5ForConditionalGeneration (relative-position buckets, unscaled
    attention, cross-attention)."""
    import torch
    from tests.arch_fixtures import make_t5
    from llama_kotlin_tpu.models.t5 import T5Context, load_t5

    rng = np.random.default_rng(19)
    arch, md, ws, hf = make_t5(rng)
    path = tmp_path / "t5.gguf"
    write_arch_gguf(path, arch, md, ws)
    cfg, params, f = load_t5(path)
    f.close()
    assert cfg.extra["rel_buckets"] == 32 and cfg.head_dim == 16

    ctx = T5Context(cfg, params)
    enc_toks = np.array([3, 17, 42, 9, 101, 55], np.int32)
    dec_toks = np.array([0, 7, 23, 88], np.int32)
    enc_ours = ctx.encode(enc_toks)
    logits_ours = ctx.decode_logits(dec_toks)

    with torch.no_grad():
        ids = torch.from_numpy(enc_toks[None].astype(np.int64))
        dec = torch.from_numpy(dec_toks[None].astype(np.int64))
        enc_theirs = hf.encoder(ids).last_hidden_state[0].numpy()
        logits_theirs = hf(input_ids=ids, decoder_input_ids=dec).logits[0].numpy()
    np.testing.assert_allclose(enc_ours, enc_theirs, atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(logits_ours, logits_theirs, atol=1e-3, rtol=5e-3)

    # greedy generation runs end-to-end
    out = ctx.generate(enc_toks, n_steps=5, eos_id=1)
    assert isinstance(out, list)
