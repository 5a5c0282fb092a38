"""State save/restore tests (pattern: reference examples/save-load-state.cpp
:50-206 — decode, save, decode more, restore, decode again, compare)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime import state as S
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    rng = np.random.default_rng(3)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    write_llama_gguf(path, weights, dims)
    return path


def _ctx(path):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    return LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)


def test_full_state_roundtrip(model_path):
    ctx = _ctx(model_path)
    prompt = np.array([5, 9, 3], np.int32)
    ctx.decode(Batch.single(prompt))
    blob = S.get_state_data(ctx)

    # continue decoding (mutates cache), then restore and replay
    ctx.decode(Batch(tokens=[7], pos=[3], seq_id=[0], output=[True]))
    after_first = ctx.get_logits()[0].copy()

    S.set_state_data(ctx, blob)
    ctx.decode(Batch(tokens=[7], pos=[3], seq_id=[0], output=[True]))
    after_restore = ctx.get_logits()[0]
    np.testing.assert_allclose(after_restore, after_first, atol=1e-5, rtol=1e-4)


def test_session_file(model_path, tmp_path):
    ctx = _ctx(model_path)
    prompt = np.array([11, 29, 3, 42], np.int32)
    ctx.decode(Batch.single(prompt))
    S.save_session_file(ctx, tmp_path / "s.bin", prompt)

    ctx2 = _ctx(model_path)
    toks = S.load_session_file(ctx2, tmp_path / "s.bin")
    np.testing.assert_array_equal(toks, prompt)
    # both contexts produce identical next-token logits
    ctx.decode(Batch(tokens=[7], pos=[4], seq_id=[0], output=[True]))
    ctx2.decode(Batch(tokens=[7], pos=[4], seq_id=[0], output=[True]))
    np.testing.assert_allclose(ctx2.get_logits()[0], ctx.get_logits()[0],
                               atol=1e-5, rtol=1e-4)


def test_per_sequence_state(model_path):
    ctx = _ctx(model_path)
    a = np.array([4, 8, 15], np.int32)
    ctx.decode(Batch.single(a, seq_id=0))
    # noise on another sequence so cell layouts differ on restore
    ctx.decode(Batch.single(np.array([99, 98], np.int32), seq_id=1))
    blob = S.get_seq_data(ctx, 0)

    ctx2 = _ctx(model_path)
    ctx2.decode(Batch.single(np.array([77, 66, 55, 44], np.int32), seq_id=2))
    assert S.set_seq_data(ctx2, blob, dest_seq=0) == 0

    ctx.decode(Batch(tokens=[23], pos=[3], seq_id=[0], output=[True]))
    ctx2.decode(Batch(tokens=[23], pos=[3], seq_id=[0], output=[True]))
    np.testing.assert_allclose(ctx2.get_logits()[0], ctx.get_logits()[0],
                               atol=1e-5, rtol=1e-4)


def test_seq_state_cache_full(model_path):
    ctx = _ctx(model_path)
    ctx.decode(Batch.single(np.arange(10, dtype=np.int32)))
    blob = S.get_seq_data(ctx, 0)
    cfg, params, f = load_gguf_model(model_path, compute_dtype=jnp.float32)
    f.close()
    tiny = LlamaContext(cfg, params, n_cells=8, compute_dtype=jnp.float32)
    assert S.set_seq_data(tiny, blob, dest_seq=0) == 1


def _qctx(path, kv="q8_0"):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    return LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32,
                        kv_quant=kv)


@pytest.mark.parametrize("kv", ["q8_0", "q4_0"])
def test_quantized_kv_state_bit_faithful(model_path, kv):
    """Quantized-KV blobs store raw code+scale planes: restore into a
    same-type cache is BITWISE equal (VERDICT r3 #8; reference stores raw
    type_k bytes, src/llama.cpp:18423+), so restore-then-decode is
    identical to never-saved decode."""
    ctx = _qctx(model_path, kv)
    ctx.decode(Batch.single(np.array([5, 9, 3], np.int32)))
    k0 = np.asarray(ctx.cache.k).copy()
    ks0 = np.asarray(ctx.cache.k_scale).copy()
    v0 = np.asarray(ctx.cache.v).copy()
    vs0 = np.asarray(ctx.cache.v_scale).copy()
    blob = S.get_state_data(ctx)

    ctx.decode(Batch(tokens=[7], pos=[3], seq_id=[0], output=[True]))
    ref_logits = ctx.get_logits()[0].copy()
    S.set_state_data(ctx, blob)
    # cache is bitwise-identical to the pre-save cache
    np.testing.assert_array_equal(np.asarray(ctx.cache.k), k0)
    np.testing.assert_array_equal(np.asarray(ctx.cache.k_scale), ks0)
    np.testing.assert_array_equal(np.asarray(ctx.cache.v), v0)
    np.testing.assert_array_equal(np.asarray(ctx.cache.v_scale), vs0)
    # replayed decode is exactly the never-saved decode
    ctx.decode(Batch(tokens=[7], pos=[3], seq_id=[0], output=[True]))
    np.testing.assert_array_equal(ctx.get_logits()[0], ref_logits)


def test_quantized_kv_seq_blob_bit_faithful(model_path):
    ctx = _qctx(model_path, "q8_0")
    ctx.decode(Batch.single(np.array([4, 8, 15], np.int32), seq_id=0))
    ctx.decode(Batch.single(np.array([99, 98], np.int32), seq_id=1))
    blob = S.get_seq_data(ctx, 0)

    ctx2 = _qctx(model_path, "q8_0")
    assert S.set_seq_data(ctx2, blob, dest_seq=0) == 0
    ctx.decode(Batch(tokens=[23], pos=[3], seq_id=[0], output=[True]))
    ctx2.decode(Batch(tokens=[23], pos=[3], seq_id=[0], output=[True]))
    # same-type injection carries raw planes: logits match exactly up to
    # cell-placement-invariant math (attention gathers are order-free)
    np.testing.assert_allclose(ctx2.get_logits()[0], ctx.get_logits()[0],
                               atol=1e-5, rtol=1e-4)


def test_quantized_kv_state_cross_type(model_path):
    """Cross-type restore (q8_0 blob -> q4_0 cache) falls back to
    dequantize+requantize and still replays decode within quant error."""
    ctx = _qctx(model_path, "q8_0")
    ctx.decode(Batch.single(np.array([5, 9, 3], np.int32)))
    blob = S.get_state_data(ctx)

    ctx4 = _qctx(model_path, "q4_0")
    S.set_state_data(ctx4, blob)
    ctx.decode(Batch(tokens=[7], pos=[3], seq_id=[0], output=[True]))
    ctx4.decode(Batch(tokens=[7], pos=[3], seq_id=[0], output=[True]))
    np.testing.assert_allclose(ctx4.get_logits()[0], ctx.get_logits()[0],
                               atol=0.5, rtol=0.5)
