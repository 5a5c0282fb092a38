"""HF -> GGUF converter test: save a tiny HF llama, convert, load with our
runtime, and compare logits against the HF model (full conversion loop)."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.tools.convert_hf import convert

from tests.fixtures import build_hf_llama, random_llama_weights, tiny_llama_dims


def test_convert_hf_roundtrip(tmp_path):
    import torch

    rng = np.random.default_rng(77)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    hf = build_hf_llama(weights, dims)
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(hf_dir, safe_serialization=False)

    out = tmp_path / "converted.gguf"
    convert(hf_dir, out, dtype="f32")

    cfg, params, f = load_gguf_model(out, compute_dtype=jnp.float32)
    f.close()
    assert cfg.n_embd == dims["n_embd"]
    assert cfg.n_head_kv == dims["n_head_kv"]
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)

    toks = np.array([3, 17, 42, 9], np.int32)
    assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
    ours = ctx.get_logits()
    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("arch", ["gpt2", "gptneox"])
def test_convert_gpt_family_roundtrip(arch, tmp_path):
    """HF GPT-2 / GPT-NeoX checkpoint -> GGUF -> our decoder matches the
    HF model's logits (Conv1D transposition and qkv de-interleaving)."""
    import torch

    from tests.arch_fixtures import MAKERS
    from llama_kotlin_tpu.tools.convert_hf import convert

    rng = np.random.default_rng(77)
    _, _, _, hf = MAKERS[arch](rng)
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(hf_dir, safe_serialization=True)

    out = tmp_path / "conv.gguf"
    convert(hf_dir, out, dtype="f32")

    cfg, params, f = load_gguf_model(out, compute_dtype=jnp.float32)
    f.close()
    assert cfg.arch == arch
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    toks = np.array([3, 17, 42, 9, 101], np.int32)
    assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
    ours = ctx.get_logits()
    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-3)


def test_convert_qwen2_roundtrip(tmp_path):
    """NEOX-rope arch (qwen2): converted q/k rows must stay UNPERMUTED —
    the runtime rotates half-split dims exactly as HF lays them out
    (regression: the llama permute was applied to every arch)."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(5)
    cfgq = Qwen2Config(
        vocab_size=160, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, tie_word_embeddings=False,
    )
    hf = Qwen2ForCausalLM(cfgq).eval()
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(hf_dir, safe_serialization=False)

    out = tmp_path / "qwen2.gguf"
    convert(hf_dir, out, dtype="f32")
    cfg, params, f = load_gguf_model(out, compute_dtype=jnp.float32)
    f.close()
    assert cfg.arch == "qwen2"
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    toks = np.array([3, 17, 42, 9], np.int32)
    assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
    ours = ctx.get_logits()
    with torch.no_grad():
        theirs = hf(torch.tensor(toks)[None]).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
