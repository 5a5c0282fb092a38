"""LoRA, control-vector, and embeddings tests."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.gguf import GGUFWriter
from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.models.lora import LoraAdapter, apply_lora, load_control_vector
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    rng = np.random.default_rng(9)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    write_llama_gguf(path, weights, dims)
    return path, weights, dims


def _ctx(path, **kw):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    kw.setdefault("n_cells", 64)
    kw.setdefault("compute_dtype", jnp.float32)
    return LlamaContext(cfg, params, **kw)


def _write_adapter(tmp_path, dims, rng, rank=4, alpha=8.0):
    w = GGUFWriter()
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", np.float32(alpha))
    E = dims["n_embd"]
    a = (rng.standard_normal((rank, E)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((E, rank)) * 0.05).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight.lora_a", a)
    w.add_tensor("blk.0.attn_q.weight.lora_b", b)
    path = tmp_path / "adapter.gguf"
    w.write(path)
    return path, a, b


def test_lora_changes_logits_and_matches_merged(model, tmp_path):
    path, weights, dims = model
    rng = np.random.default_rng(0)
    apath, a, b = _write_adapter(tmp_path, dims, rng)
    toks = np.array([3, 17, 42], np.int32)

    ctx = _ctx(path)
    ctx.decode(Batch.single(toks))
    base_logits = ctx.get_logits()[0].copy()

    adapter = LoraAdapter.load(apath)
    ctx.apply_lora(adapter, scale=1.0)
    ctx.clear()
    ctx.decode(Batch.single(toks))
    lora_logits = ctx.get_logits()[0].copy()
    assert np.abs(lora_logits - base_logits).max() > 1e-4  # adapter has effect

    # merged-weight equivalence: W' = W + (alpha/r) * B @ A
    merged = dict(weights)
    scale = adapter.alpha / a.shape[0]
    merged["blk.0.attn_q.weight"] = weights["blk.0.attn_q.weight"] + scale * (b @ a)
    mpath = tmp_path / "merged.gguf"
    write_llama_gguf(mpath, merged, dims)
    ctx_m = _ctx(mpath)
    ctx_m.decode(Batch.single(toks))
    np.testing.assert_allclose(lora_logits, ctx_m.get_logits()[0], atol=1e-3, rtol=1e-3)

    # remove restores the base
    ctx.remove_lora()
    ctx.clear()
    ctx.decode(Batch.single(toks))
    np.testing.assert_allclose(ctx.get_logits()[0], base_logits, atol=1e-5)


def test_control_vectors(model, tmp_path):
    path, _, dims = model
    rng = np.random.default_rng(1)
    # write a control-vector gguf: direction.N tensors, 1-based layers
    w = GGUFWriter()
    dirs = (rng.standard_normal((dims["n_layer"], dims["n_embd"])) * 0.1).astype(np.float32)
    for i in range(dims["n_layer"]):
        w.add_tensor(f"direction.{i+1}", dirs[i].reshape(1, -1))
    cvpath = tmp_path / "cv.gguf"
    w.write(cvpath)

    ctx = _ctx(path)
    toks = np.array([5, 6], np.int32)
    ctx.decode(Batch.single(toks))
    base = ctx.get_logits()[0].copy()

    cv = load_control_vector(cvpath, dims["n_layer"], dims["n_embd"], strength=1.0)
    ctx.control_vector_apply(cv)
    ctx.clear()
    ctx.decode(Batch.single(toks))
    steered = ctx.get_logits()[0]
    assert np.abs(steered - base).max() > 1e-4

    ctx.control_vector_apply(None)
    ctx.clear()
    ctx.decode(Batch.single(toks))
    np.testing.assert_allclose(ctx.get_logits()[0], base, atol=1e-5)


def test_embeddings(model):
    path, _, dims = model
    ctx = _ctx(path)
    toks = np.array([3, 17, 42, 9], np.int32)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    e_all = ctx.get_embeddings("none")
    assert e_all.shape == (4, dims["n_embd"])
    assert np.isfinite(e_all).all()
    np.testing.assert_allclose(ctx.get_embeddings("last"), e_all[-1])
    np.testing.assert_allclose(ctx.get_embeddings("mean"), e_all.mean(0), rtol=1e-6)
    # embeddings are deterministic
    ctx2 = _ctx(path)
    ctx2.decode(Batch.single(toks, logits_last_only=False))
    np.testing.assert_allclose(ctx2.get_embeddings("none"), e_all, atol=1e-5)
