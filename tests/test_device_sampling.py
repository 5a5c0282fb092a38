"""On-device sampling (runtime/generate.py _sample + engine chunked path).

Parity targets: the default sampler-chain order of common/sampling.cpp
(penalties -> top_k -> top_p -> min_p -> temperature -> dist) and
llama_sample_repetition_penalties (src/llama-sampling.cpp).
"""

from __future__ import annotations

import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.runtime.generate import SampleParams, _sample
from llama_kotlin_tpu.sampling.samplers import SamplerChain, SamplingParams


def test_device_penalties_match_host_greedy(rng):
    """Greedy + repetition/freq/presence penalties: device == host chain."""
    V = 97
    logits = rng.standard_normal((1, V)).astype(np.float32) * 2
    hist = [5, 5, 5, 12, 40, 40, 3]

    p = SamplingParams(temp=0.0, penalty_last_n=16, penalty_repeat=1.3,
                       penalty_freq=0.2, penalty_present=0.4)
    chain = SamplerChain(p, V)
    for t in hist:
        chain.accept(t, apply_grammar=False)
    host_tok = chain.sample(logits[0].copy())

    counts = np.zeros((1, V), np.float32)
    for t in hist:
        counts[0, t] += 1
    sp = SampleParams(temp=0.0, penalty_last_n=16, penalty_repeat=1.3,
                      penalty_freq=0.2, penalty_present=0.4)
    dev_tok = int(_sample(jnp.asarray(logits), sp, jax.random.PRNGKey(0),
                          jnp.asarray(counts))[0])
    assert dev_tok == host_tok


def test_device_topk_topp_minp_support(rng):
    """Sampled tokens always come from the host chain's allowed set."""
    V = 211
    logits = rng.standard_normal((1, V)).astype(np.float32) * 3

    p = SamplingParams(temp=0.7, top_k=20, top_p=0.8, min_p=0.1,
                       penalty_repeat=1.0)
    # host allowed set: run the chain's filters (deterministic part)
    from llama_kotlin_tpu.sampling import samplers as S

    c = S.Candidates.from_logits(logits[0])
    S.top_k(c, 20)
    S.top_p(c, 0.8, min_keep=1)
    S.min_p(c, 0.1, min_keep=1)
    allowed = set(int(i) for i in c.ids)

    sp = SampleParams(temp=0.7, top_k=20, top_p=0.8, min_p=0.1)
    for seed in range(40):
        tok = int(_sample(jnp.asarray(logits), sp,
                          jax.random.PRNGKey(seed))[0])
        assert tok in allowed


def test_device_full_vocab_temperature(rng):
    """top_k=0, top_p=1, min_p=0: full-vocab categorical (no truncation)."""
    V = 1000
    logits = np.full((1, V), -10.0, np.float32)
    logits[0, 900] = 10.0  # far beyond any candidate cap
    sp = SampleParams(temp=1.0)
    tok = int(_sample(jnp.asarray(logits), sp, jax.random.PRNGKey(1))[0])
    assert tok == 900


def test_chunked_sampled_decode_engages(tmp_path):
    """temp>0 + penalties requests run through the on-device chunked loop
    (fewer engine steps) and still complete with correct bookkeeping."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )
    from tests.test_server import ToyTokenizer

    rng = np.random.default_rng(5)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "s.gguf"
    write_llama_gguf(path, weights, dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    tok = ToyTokenizer(dims["vocab"])

    def run(chunk_steps):
        ctx = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
        engine = Engine(ctx, tok, n_slots=2, n_batch=64, chunk_steps=chunk_steps)
        req = Request(
            prompt_tokens=np.array([1, 5, 9], np.int32),
            params=SamplingParams(temp=0.8, top_k=40, top_p=0.9, min_p=0.0,
                                  penalty_last_n=32, penalty_repeat=1.2,
                                  seed=7),
            n_predict=17,
        )
        engine.submit(req)
        stop = threading.Event()
        t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
        t.start()
        ok = req.done.wait(timeout=240)
        stop.set()
        t.join(timeout=30)
        assert ok
        return req.output_tokens, engine.metrics["n_decode_steps"]

    toks_chunked, steps_chunked = run(8)
    toks_plain, steps_plain = run(0)
    assert len(toks_chunked) == 17 and len(toks_plain) == 17
    assert steps_chunked < steps_plain  # the device loop engaged
    assert all(0 <= t < dims["vocab"] for t in toks_chunked)


def test_mixed_spv_sampling_semantics(rng):
    """Per-slot sampling arrays: greedy rows return argmax exactly; sampled
    rows stay inside their own slot's host-chain allowed set."""
    from llama_kotlin_tpu.sampling import samplers as S

    V = 211
    logits = rng.standard_normal((3, V)).astype(np.float32) * 3
    # slot 0 greedy, slot 1 (top_k=20, top_p=0.8, min_p=0.1, temp=0.7),
    # slot 2 (top_k=5, temp=1.3)
    spv = {
        "temp": jnp.asarray([0.0, 0.7, 1.3], jnp.float32),
        "top_k": jnp.asarray([0, 20, 5], jnp.int32),
        "top_p": jnp.asarray([1.0, 0.8, 1.0], jnp.float32),
        "min_p": jnp.asarray([0.0, 0.1, 0.0], jnp.float32),
    }
    sp = SampleParams(temp=1.0, top_k=20)  # static window = max top_k

    def allowed(row, k, p, mp):
        c = S.Candidates.from_logits(logits[row])
        if k > 0:
            S.top_k(c, k)
        if p < 1.0:
            S.top_p(c, p, min_keep=1)
        if mp > 0.0:
            S.min_p(c, mp, min_keep=1)
        return set(int(i) for i in c.ids)

    a1 = allowed(1, 20, 0.8, 0.1)
    a2 = allowed(2, 5, 1.0, 0.0)
    for seed in range(30):
        toks = np.asarray(_sample(jnp.asarray(logits), sp,
                                  jax.random.PRNGKey(seed), spv=spv))
        assert toks[0] == int(np.argmax(logits[0]))
        assert int(toks[1]) in a1
        assert int(toks[2]) in a2


def test_chunked_decode_mixed_configs(tmp_path):
    """Two requests with different sampling configs batch into ONE chunked
    device loop (mixed spv path) instead of per-token host sampling."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )
    from tests.test_server import ToyTokenizer

    rng = np.random.default_rng(6)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, weights, dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    tok = ToyTokenizer(dims["vocab"])

    ctx = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
    engine = Engine(ctx, tok, n_slots=2, n_batch=64, chunk_steps=8)
    reqs = [
        Request(prompt_tokens=np.array([1, 5, 9], np.int32),
                params=SamplingParams(temp=0.0), n_predict=16),  # greedy
        Request(prompt_tokens=np.array([2, 7], np.int32),
                params=SamplingParams(temp=0.9, top_k=30, top_p=0.9, seed=3),
                n_predict=16),
    ]
    for r in reqs:
        engine.submit(r)
    stop = threading.Event()
    t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
    t.start()
    ok = all(r.done.wait(timeout=240) for r in reqs)
    stop.set()
    t.join(timeout=30)
    assert ok
    assert all(len(r.output_tokens) == 16 for r in reqs)
    # both slots generated 16 tokens; the chunked loop (8 steps/call) means
    # far fewer engine decode steps than 32 per-token rounds
    assert engine.metrics["n_decode_steps"] < 16

    # greedy request must match a standalone greedy run exactly
    ctx2 = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
    engine2 = Engine(ctx2, tok, n_slots=1, n_batch=64, chunk_steps=0)
    ref = Request(prompt_tokens=np.array([1, 5, 9], np.int32),
                  params=SamplingParams(temp=0.0), n_predict=16)
    engine2.submit(ref)
    stop2 = threading.Event()
    t2 = threading.Thread(target=engine2.run_loop, args=(stop2,), daemon=True)
    t2.start()
    assert ref.done.wait(timeout=240)
    stop2.set()
    t2.join(timeout=30)
    assert ref.output_tokens == reqs[0].output_tokens


def test_chunked_decode_with_waiting_queue(tmp_path):
    """A queued request (all slots busy) must NOT force per-token host
    stepping: the chunked device loop keeps running, and the queued
    request is picked up after a slot frees."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )
    from tests.test_server import ToyTokenizer

    rng = np.random.default_rng(8)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, weights, dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    tok = ToyTokenizer(dims["vocab"])

    ctx = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
    engine = Engine(ctx, tok, n_slots=1, n_batch=64, chunk_steps=8)
    reqs = [Request(prompt_tokens=np.array([1 + i, 5], np.int32),
                    params=SamplingParams(temp=0.0), n_predict=16)
            for i in range(2)]
    for r in reqs:
        engine.submit(r)  # 1 slot: second request queues behind the first
    stop = threading.Event()
    t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
    t.start()
    ok = all(r.done.wait(timeout=240) for r in reqs)
    stop.set()
    t.join(timeout=30)
    assert ok
    assert all(len(r.output_tokens) == 16 for r in reqs)
    # 32 generated tokens total; chunking (8/call) must have engaged for
    # both requests: decode steps well under 32 (2 prompts + ~4 chunks)
    assert engine.metrics["n_decode_steps"] <= 12


def test_spv_sampling_reproducible_across_batch_composition(rng):
    """With per-slot seeds, a row's draws depend only on (own seed, step),
    never on the batch-mates' seeds (the base key is constant)."""
    V = 97
    logits = rng.standard_normal((2, V)).astype(np.float32) * 2
    sp = SampleParams(temp=1.0, top_k=20, seed=0)

    def draw(seeds):
        spv = {
            "temp": jnp.asarray([0.8, 0.8], jnp.float32),
            "top_k": jnp.asarray([20, 20], jnp.int32),
            "top_p": jnp.asarray([1.0, 1.0], jnp.float32),
            "min_p": jnp.asarray([0.0, 0.0], jnp.float32),
            "seed": jnp.asarray(seeds, jnp.int32),
        }
        return np.asarray(_sample(jnp.asarray(logits), sp,
                                  jax.random.PRNGKey(0), spv=spv))

    # row 1 keeps seed 42 while row 0's seed varies: row 1's token is fixed
    t_a = draw([7, 42])
    t_b = draw([5, 42])
    assert t_a[1] == t_b[1]
    # and a row's stream really is seed-dependent
    t_c = draw([7, 43])
    outs = {int(draw([7, 42 + i])[1]) for i in range(8)}
    assert len(outs) > 1  # different seeds give different draws eventually


def test_spv_sampling_position_fold_decorrelates_chunks(rng):
    """A row's draw is keyed by (seed, ABSOLUTE position): the same seed at
    different positions gives fresh randomness (so consecutive chunked
    generate_loop calls never replay a chunk's draw sequence), while the
    same (seed, position) is exactly reproducible."""
    V = 97
    logits = rng.standard_normal((1, V)).astype(np.float32)
    sp = SampleParams(temp=1.0, top_k=50, seed=0)

    def draw(position):
        spv = {
            "temp": jnp.asarray([1.2], jnp.float32),
            "top_k": jnp.asarray([50], jnp.int32),
            "top_p": jnp.asarray([1.0], jnp.float32),
            "min_p": jnp.asarray([0.0], jnp.float32),
            "seed": jnp.asarray([9], jnp.int32),
        }
        return int(np.asarray(_sample(
            jnp.asarray(logits), sp, jax.random.PRNGKey(0), spv=spv,
            pos=jnp.asarray([position], jnp.int32)))[0])

    assert draw(17) == draw(17)  # reproducible at a fixed position
    # distinct positions re-key the draw: over several positions the token
    # must vary (period-K chunk reuse would pin it)
    assert len({draw(p) for p in range(16)}) > 1


def test_generate_loop_chunks_not_periodic(tmp_path):
    """Two consecutive generate_loop chunks (same seed, advancing pos0) must
    use fresh per-step keys: with near-uniform logits the second chunk's
    draw at step offset j differs from the first chunk's for some j."""
    import jax as _jax

    from llama_kotlin_tpu.runtime.generate import generate_loop

    # the key property lives in _sample's key derivation; drive it through
    # the same fold the loop body applies (fold_in(key0, pos[0]))
    V = 211
    logits = jnp.zeros((1, V), jnp.float32)  # uniform: token = pure RNG
    sp = SampleParams(temp=1.0, top_k=0, seed=123)
    key0 = _jax.random.PRNGKey(123)
    chunk1 = [int(np.asarray(_sample(
        logits, sp, _jax.random.fold_in(key0, p)))[0]) for p in range(8)]
    chunk2 = [int(np.asarray(_sample(
        logits, sp, _jax.random.fold_in(key0, 8 + p)))[0]) for p in range(8)]
    assert chunk1 != chunk2


def test_chunked_decode_no_retrace_per_seed(tmp_path):
    """Distinct request seeds must reuse ONE compiled chunk loop: the seed
    rides as a traced argument (sp.seed stays 0)."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from llama_kotlin_tpu.runtime import generate as gen_mod
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )
    from tests.test_server import ToyTokenizer

    rng = np.random.default_rng(9)
    dims = tiny_llama_dims(vocab=160)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, random_llama_weights(dims, rng), dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    tok = ToyTokenizer(dims["vocab"])
    ctx = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
    engine = Engine(ctx, tok, n_slots=1, n_batch=64, chunk_steps=8)

    traces = gen_mod.generate_loop._cache_size() \
        if hasattr(gen_mod.generate_loop, "_cache_size") else None
    outs = []
    for seed in (11, 222, 3333):
        req = Request(prompt_tokens=np.array([2, 7], np.int32),
                      params=SamplingParams(temp=0.9, top_k=20, seed=seed),
                      n_predict=8)
        engine.submit(req)
        stop = threading.Event()
        t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
        t.start()
        assert req.done.wait(timeout=240)
        stop.set()
        t.join(timeout=30)
        outs.append(tuple(req.output_tokens))
        ctx.clear()
    if traces is not None:
        # one compiled loop serves all three seeds
        assert gen_mod.generate_loop._cache_size() - traces <= 1
    assert len(set(outs)) > 1  # seeds actually vary the output


def test_set_causal_attn_memoizes_config(tmp_path):
    """Toggling causal attention reuses the same two config objects (no
    retrace-per-flip, no jit cache leak)."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )

    rng = np.random.default_rng(10)
    dims = tiny_llama_dims(vocab=160)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, random_llama_weights(dims, rng), dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ids = []
    for _ in range(4):
        ctx.set_causal_attn(False)
        ids.append(id(ctx.cfg))
        ctx.set_causal_attn(True)
        ids.append(id(ctx.cfg))
    assert len(set(ids)) == 2  # exactly one object per setting, reused


def test_chunked_decode_with_context_shift(tmp_path):
    """Chunked device decode + a slot hitting the context wall: chunking
    pauses at the wall (K<=1), the per-token path shifts, and generation
    completes to n_predict."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )
    from tests.test_server import ToyTokenizer

    rng = np.random.default_rng(23)
    dims = tiny_llama_dims(vocab=160)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, random_llama_weights(dims, rng), dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
    engine = Engine(ctx, ToyTokenizer(dims["vocab"]), n_slots=1, n_batch=16,
                    chunk_steps=8)
    req = Request(prompt_tokens=np.array([1, 5], np.int32),
                  params=SamplingParams(temp=0.0), n_predict=40)
    engine.submit(req)
    stop = threading.Event()
    t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
    t.start()
    ok = req.done.wait(timeout=300)
    stop.set()
    t.join(timeout=30)
    assert ok and len(req.output_tokens) == 40
    assert req.stop_reason == "length"


def test_grammar_masked_device_sampling(tmp_path, monkeypatch):
    """Grammar-constrained requests sample ON DEVICE via uploaded vocab
    bitmasks (ctx.sample_rows_device) instead of downloading [n, V]
    logits; output conforms to the grammar and, at temp=0, matches the
    host chain token-for-token."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )
    from tests.test_server import ToyTokenizer

    rng = np.random.default_rng(29)
    dims = tiny_llama_dims(vocab=160)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, random_llama_weights(dims, rng), dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    # ab-alternating grammar over the toy tokenizer's chr(97 + t % 26)
    grammar = 'root ::= ("ab")+'

    def run(device_masked):
        ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
        engine = Engine(ctx, ToyTokenizer(dims["vocab"]), n_slots=1,
                        n_batch=16)
        calls = {"n": 0}
        if device_masked:
            orig = ctx.sample_rows_device

            def counted(*a, **k):
                calls["n"] += 1
                return orig(*a, **k)

            ctx.sample_rows_device = counted
        else:
            # force the host path by making the sampler look non-maskable
            monkeypatch.setattr(Engine, "_device_maskable",
                                lambda self, p: False)
        req = Request(prompt_tokens=np.array([1, 5], np.int32),
                      params=SamplingParams(temp=0.0, grammar=grammar),
                      n_predict=8)
        engine.submit(req)
        stop = threading.Event()
        t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
        t.start()
        ok = req.done.wait(timeout=300)
        stop.set()
        t.join(timeout=30)
        assert ok
        monkeypatch.undo()
        return req.output_text, calls["n"]

    text_dev, n_calls = run(device_masked=True)
    assert n_calls > 0, "device-masked sampling path did not engage"
    assert text_dev.startswith("ab")
    assert set(text_dev) <= {"a", "b"}
    text_host, _ = run(device_masked=False)
    assert text_dev == text_host  # greedy parity with the host chain
