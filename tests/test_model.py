"""End-to-end model tests: GGUF load -> decode, with transformers'
LlamaForCausalLM as an independent logits oracle, plus multi-sequence
batching and cache-op semantics."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext

from tests.fixtures import (
    build_hf_llama,
    random_llama_weights,
    tiny_llama_dims,
    write_llama_gguf,
)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    rng = np.random.default_rng(7)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("models") / "tiny_f32.gguf"
    write_llama_gguf(path, weights, dims)
    return path, weights, dims


def _make_ctx(path, **kw):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    kw.setdefault("n_cells", 128)
    kw.setdefault("compute_dtype", jnp.float32)
    return LlamaContext(cfg, params, **kw)


def test_load_config(tiny_model):
    path, _, dims = tiny_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.n_embd == dims["n_embd"]
    assert cfg.n_layer == dims["n_layer"]
    assert cfg.n_head_kv == dims["n_head_kv"]
    assert cfg.vocab_size == dims["vocab"]
    assert len(params["layers"]) == dims["n_layer"]
    assert params["layers"][0]["wq"].shape == (dims["n_embd"], dims["n_embd"])


def test_logits_match_transformers(tiny_model):
    import torch

    path, weights, dims = tiny_model
    ctx = _make_ctx(path)
    hf = build_hf_llama(weights, dims)

    toks = np.array([3, 17, 42, 9, 101, 55, 7], np.int32)
    rc = ctx.decode(Batch.single(toks, logits_last_only=False))
    assert rc == 0
    ours = ctx.get_logits()  # [n, vocab]

    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))).logits[0].numpy()

    assert ours.shape == theirs.shape
    # f32 compute end-to-end: should agree tightly
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_incremental_decode_matches_full_prefill(tiny_model):
    path, _, _ = tiny_model
    toks = np.array([5, 9, 3, 88, 22, 61], np.int32)

    ctx1 = _make_ctx(path)
    ctx1.decode(Batch.single(toks, logits_last_only=False))
    full = ctx1.get_logits()

    ctx2 = _make_ctx(path)
    outs = []
    for i, t in enumerate(toks):
        ctx2.decode(Batch(tokens=[t], pos=[i], seq_id=[0], output=[True]))
        outs.append(ctx2.get_logits()[0])
    step = np.stack(outs)
    np.testing.assert_allclose(step, full, atol=2e-4, rtol=2e-3)


def test_multi_sequence_batch_isolation(tiny_model):
    """Two sequences decoded in one interleaved batch must match decoding
    them separately (mask isolation)."""
    path, _, _ = tiny_model
    a = np.array([4, 8, 15], np.int32)
    b = np.array([16, 23, 42, 99], np.int32)

    ctx = _make_ctx(path)
    batch = Batch(
        tokens=np.concatenate([a, b]),
        pos=np.concatenate([np.arange(3), np.arange(4)]),
        seq_id=np.array([0, 0, 0, 1, 1, 1, 1]),
        output=np.ones(7, bool),
    )
    assert ctx.decode(batch) == 0
    both = ctx.get_logits()

    ctx_a = _make_ctx(path)
    ctx_a.decode(Batch.single(a, logits_last_only=False))
    only_a = ctx_a.get_logits()
    ctx_b = _make_ctx(path)
    ctx_b.decode(Batch.single(b, logits_last_only=False))
    only_b = ctx_b.get_logits()

    np.testing.assert_allclose(both[:3], only_a, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(both[3:], only_b, atol=1e-4, rtol=1e-3)


def test_seq_cp_shares_prefix(tiny_model):
    """seq_cp then divergent decode: the copy must see the shared prefix."""
    path, _, _ = tiny_model
    prefix = np.array([11, 29, 3], np.int32)

    ctx = _make_ctx(path)
    ctx.decode(Batch.single(prefix, seq_id=0))
    ctx.seq_cp(0, 1)
    # continue seq 1 with a token; must attend to copied prefix
    ctx.decode(Batch(tokens=[77], pos=[3], seq_id=[1], output=[True]))
    cp_logits = ctx.get_logits()[0]

    ctx2 = _make_ctx(path)
    ctx2.decode(Batch.single(np.append(prefix, 77), seq_id=0))
    ref = ctx2.get_logits()[0]
    np.testing.assert_allclose(cp_logits, ref, atol=1e-4, rtol=1e-3)


def test_seq_rm_frees_cells(tiny_model):
    path, _, _ = tiny_model
    ctx = _make_ctx(path, n_cells=16)
    ctx.decode(Batch.single(np.arange(10, dtype=np.int32), seq_id=0))
    assert ctx.meta.used == 10
    ctx.seq_rm(0)
    assert ctx.meta.used == 0
    # cache full behaviour: rc=1 when no slots
    rc = ctx.decode(Batch.single(np.arange(20, dtype=np.int32), seq_id=0))
    assert rc == 1


def test_quantized_model_close_to_f32(tiny_model, tmp_path):
    path, weights, dims = tiny_model
    qpath = tmp_path / "tiny_q8.gguf"
    write_llama_gguf(qpath, weights, dims, qtype=GGMLQuantType.Q8_0)

    toks = np.array([3, 17, 42, 9], np.int32)
    ctx_f = _make_ctx(path)
    ctx_f.decode(Batch.single(toks))
    lf = ctx_f.get_logits()[0]

    ctx_q = _make_ctx(qpath)
    ctx_q.decode(Batch.single(toks))
    lq = ctx_q.get_logits()[0]

    assert np.argmax(lf) == np.argmax(lq)
    # cosine similarity of logits stays high under Q8_0
    cos = np.dot(lf, lq) / (np.linalg.norm(lf) * np.linalg.norm(lq))
    assert cos > 0.999


def test_context_shift_matches_repositioned_decode(tiny_model):
    """seq_add K-shift: tokens decoded at positions 2..4 then shifted by -2
    must continue exactly like tokens decoded at positions 0..2 (RoPE is
    relative, and the rotation applied to cached K must preserve that).

    Note: shifting after *dropping earlier context* is intentionally lossy
    (cached activations still reflect the dropped tokens) — identical to
    the reference's context-shift semantics — so the exactness invariant
    is only checkable in isolation like this.
    """
    path, _, _ = tiny_model
    toks = np.array([3, 88, 22], np.int32)

    ctx = _make_ctx(path)
    ctx.decode(Batch.single(toks, seq_id=0, pos0=2))
    ctx.seq_add(0, 0, -1, -2)
    ctx.decode(Batch(tokens=[61], pos=[3], seq_id=[0], output=[True]))
    shifted = ctx.get_logits()[0]

    ctx2 = _make_ctx(path)
    ctx2.decode(Batch.single(toks, seq_id=0))
    ctx2.decode(Batch(tokens=[61], pos=[3], seq_id=[0], output=[True]))
    ref = ctx2.get_logits()[0]
    np.testing.assert_allclose(shifted, ref, atol=1e-3, rtol=1e-2)


def test_metadata_overrides_and_load_cancel(tiny_model):
    """KV overrides (llama_model_kv_override parity) and cancellation via
    progress callback (test-model-load-cancel pattern)."""
    path, _, dims = tiny_model
    cfg, params, f = load_gguf_model(
        path, compute_dtype=jnp.float32,
        metadata_overrides={"llama.rope.freq_base": 123456.0},
    )
    f.close()
    assert cfg.rope_freq_base == 123456.0

    import pytest as _pytest

    with _pytest.raises(InterruptedError):
        load_gguf_model(path, progress_callback=lambda frac: False)


def test_embeddings_span_multiple_ubatches(tiny_model):
    """get_embeddings must cover every requested row when the batch splits
    into several ubatches (regression: only the last ubatch's rows were
    kept)."""
    path, _, dims = tiny_model
    ref_ctx = _make_ctx(path)
    toks = np.arange(3, 23, dtype=np.int32) % dims["vocab"]
    ref_ctx.decode(Batch.single(toks, logits_last_only=False))
    ref = ref_ctx.get_embeddings("none")
    assert ref.shape == (20, dims["n_embd"])

    ctx = _make_ctx(path, n_ubatch=8)  # forces 3 ubatches
    ctx.decode(Batch.single(toks, logits_last_only=False))
    got = ctx.get_embeddings("none")
    assert got.shape == (20, dims["n_embd"])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_multi_ubatch_logits_rows_are_global(tiny_model):
    """A batch larger than n_ubatch splits; logits_rows must be GLOBAL
    batch rows (regression: second ubatch's rows restarted at 0, colliding
    with the first and misrouting engine sampling)."""
    path, _w, _d = tiny_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=128, n_ubatch=8,
                       compute_dtype=jnp.float32)
    toks = (np.arange(20, dtype=np.int32) % 7) + 2
    out = np.zeros(20, bool)
    out[[3, 7, 12, 19]] = True  # rows in BOTH ubatches
    rc = ctx.decode(Batch(toks, np.arange(20, dtype=np.int32),
                          np.zeros(20, np.int32), out))
    assert rc == 0
    np.testing.assert_array_equal(ctx._logits_rows, [3, 7, 12, 19])

    # logits for row 12 must equal a single-ubatch run's row-12 logits
    ctx2 = LlamaContext(cfg, params, n_cells=128, n_ubatch=64,
                        compute_dtype=jnp.float32)
    ctx2.decode(Batch(toks, np.arange(20, dtype=np.int32),
                      np.zeros(20, np.int32), out))
    np.testing.assert_allclose(ctx.get_logits(), ctx2.get_logits(),
                               rtol=1e-4, atol=1e-4)


def test_seq_id_31_roundtrip():
    """seq id 31 (the top bit of the int32 mask) must work through
    commit/seq_rm/seq_cp/seq_keep (regression: np.int32(1 << 31) raises
    OverflowError on numpy 2)."""
    from llama_kotlin_tpu.runtime.kv_cache import CellMetadata

    m = CellMetadata(64, max_seqs=32)
    slots = m.find_slots(4)
    m.commit(slots, np.arange(4, dtype=np.int32), np.full(4, 31, np.int32))
    assert m.seq_pos_max(31) == 3
    m.seq_cp(31, 0)
    assert m.seq_pos_max(0) == 3
    m.seq_keep(31)
    assert m.seq_pos_max(0) == -1 and m.seq_pos_max(31) == 3
    m.seq_rm(31)
    assert m.seq_pos_max(31) == -1


def test_large_n_ubatch_gets_a_bucket(tiny_model):
    """n_ubatch beyond the default bucket table must still decode (a
    covering bucket is added; regression: ValueError at first long
    prefill)."""
    path, _w, _d = tiny_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=4096, n_ubatch=3000,
                       compute_dtype=jnp.float32, buckets=(8, 16, 32))
    assert max(ctx.buckets) == 3000
    toks = (np.arange(40, dtype=np.int32) % 7) + 2
    assert ctx.decode(Batch.single(toks)) == 0
