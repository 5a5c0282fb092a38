"""Speculative + lookup decoding tests: outputs must equal plain greedy
decoding of the target (the core correctness invariant of both)."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.runtime.speculative import (
    NgramCache,
    lookup_generate,
    speculative_generate,
)

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    rng = np.random.default_rng(21)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    write_llama_gguf(path, weights, dims)
    return path


def _ctx(path):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    return LlamaContext(cfg, params, n_cells=128, compute_dtype=jnp.float32)


def _plain_greedy(ctx, prompt, n):
    ctx.clear()
    ctx.decode(Batch.single(np.asarray(prompt, np.int32)))
    out = []
    tok = int(np.argmax(ctx.get_logits()[0]))
    out.append(tok)
    pos = len(prompt)
    while len(out) < n:
        ctx.decode(Batch(tokens=[tok], pos=[pos], seq_id=[0], output=[True]))
        tok = int(np.argmax(ctx.get_logits()[0]))
        out.append(tok)
        pos += 1
    return out


def test_speculative_same_model_all_accepted(model):
    """Draft == target: every draft token must be accepted and the output
    must equal plain greedy."""
    prompt = [3, 17, 42, 9]
    ref = _plain_greedy(_ctx(model), prompt, 12)
    out, stats = speculative_generate(_ctx(model), _ctx(model), prompt, 12, n_draft=4)
    assert out == ref
    assert stats.accept_rate > 0.6  # boundary chunks truncate acceptance
    assert stats.n_target_calls < 12  # fewer target calls than tokens


def test_speculative_output_matches_greedy_even_with_bad_draft(model, tmp_path):
    """A different (random) draft model must not change the output."""
    rng = np.random.default_rng(99)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    dpath = tmp_path / "draft.gguf"
    write_llama_gguf(dpath, weights, dims)
    prompt = [5, 9, 3]
    ref = _plain_greedy(_ctx(model), prompt, 10)
    out, stats = speculative_generate(_ctx(model), _ctx(dpath), prompt, 10, n_draft=3)
    assert out == ref


def test_ngram_cache():
    c = NgramCache(n_min=2, n_max=3)
    c.update([1, 2, 3, 1, 2, 3, 1, 2])
    assert c.draft([9, 1, 2], 2) == [3, 1]
    assert c.draft([7, 8], 3)[:0] == []


def test_lookup_generate_matches_greedy(model):
    prompt = [4, 8, 15, 16, 23, 42, 4, 8, 15]
    ref = _plain_greedy(_ctx(model), prompt, 10)
    out, stats = lookup_generate(_ctx(model), prompt, 10, n_draft=3)
    assert out == ref


def test_lookahead_matches_greedy(model):
    """Lookahead decoding is lossless: greedy lookahead == plain greedy
    (parity: examples/lookahead acceptance semantics)."""
    from llama_kotlin_tpu.runtime.lookahead import lookahead_generate

    prompt = [3, 17, 42, 9]
    ref = _plain_greedy(_ctx(model), prompt, 14)
    ctx = _ctx(model)
    out, stats = lookahead_generate(ctx, prompt, 14, W=4, N=3, G=4)
    assert out == ref
    assert stats["n_decodes"] >= 1


def test_lookahead_accepts_repetition(model):
    """On a prompt that induces loops, the n-gram pool should start
    accepting (n_accept > 0) and still match plain greedy."""
    from llama_kotlin_tpu.runtime.lookahead import lookahead_generate

    prompt = [5, 9, 5, 9, 5, 9]
    ref = _plain_greedy(_ctx(model), prompt, 24)
    out, stats = lookahead_generate(_ctx(model), prompt, 24, W=4, N=3, G=4)
    assert out == ref


def test_tree_speculative_matches_greedy(model):
    """Tree-draft speculative decoding (p_split forking) is lossless:
    greedy tree-spec == plain greedy of the target."""
    from llama_kotlin_tpu.runtime.speculative import speculative_generate_tree

    prompt = [3, 17, 42, 9]
    ref = _plain_greedy(_ctx(model), prompt, 14)
    out, stats = speculative_generate_tree(
        _ctx(model), _ctx(model), prompt, 14,
        n_draft=4, n_branches=3, p_split=1.0,  # fork aggressively
    )
    assert out == ref
    assert stats.n_drafted > 0
    # same-model draft: acceptance must be high
    assert stats.accept_rate > 0.4


def test_tree_speculative_single_branch_degenerates_to_chain(model):
    from llama_kotlin_tpu.runtime.speculative import speculative_generate_tree

    prompt = [5, 9, 3, 88]
    ref = _plain_greedy(_ctx(model), prompt, 10)
    out, stats = speculative_generate_tree(
        _ctx(model), _ctx(model), prompt, 10, n_draft=4, n_branches=1,
        p_split=0.0,
    )
    assert out == ref


def test_speculative_device_loop_matches_host(model):
    """speculative_generate_device (draft scan + verify + rollback in one
    jitted while_loop) must produce the host path's exact output and
    acceptance stats (self-draft: same tiny model both roles)."""
    from llama_kotlin_tpu.runtime.speculative import (
        speculative_generate, speculative_generate_device)

    prompt = [3, 17, 42, 9]
    tgt, dft = _ctx(model), _ctx(model)
    out_h, st_h = speculative_generate(tgt, dft, prompt, 24, n_draft=4)
    tgt2, dft2 = _ctx(model), _ctx(model)
    out_d, st_d = speculative_generate_device(tgt2, dft2, prompt, 24,
                                              n_draft=4)
    assert out_d == out_h
    assert (st_d.n_drafted, st_d.n_accepted) == (st_h.n_drafted,
                                                 st_h.n_accepted)
