"""Engine + HTTP server integration tests over a real socket (pattern:
reference examples/server/tests behave features — parallel requests,
streaming, tokenize endpoints), using the tiny synthetic model and a
whitespace-free real tokenizer vocabulary."""

from __future__ import annotations

import json
import threading
import time
import urllib.request

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.gguf import GGUFFile
from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.runtime.engine import Engine, Request
from llama_kotlin_tpu.sampling.samplers import SamplingParams
from llama_kotlin_tpu.tokenizer import build_tokenizer

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


class ToyTokenizer:
    """Deterministic toy tokenizer over a small vocab for engine tests."""

    class V:
        eos_id = 2
        bos_id = 1
        add_bos = True
        prefix_id = 3
        suffix_id = 4
        middle_id = 5
        eot_id = 6

    vocab = V()

    def __init__(self, vocab_size):
        self.vocab_size = vocab_size

    def encode(self, text, add_special=True, parse_special=False):
        ids = [3 + (ord(c) % (self.vocab_size - 3)) for c in text]
        return ([1] if add_special else []) + ids

    def decode(self, ids, skip_special=True):
        return "".join(chr(97 + (t % 26)) for t in ids if t > 2)

    def id_to_piece(self, tid):
        return chr(97 + (tid % 26)).encode()


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    rng = np.random.default_rng(11)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    write_llama_gguf(path, weights, dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
    tok = ToyTokenizer(dims["vocab"])

    from llama_kotlin_tpu.tools.server import ServerState, make_handler
    from http.server import ThreadingHTTPServer

    engine = Engine(ctx, tok, n_slots=2, n_batch=64)
    import tempfile

    slot_dir = tempfile.mkdtemp(prefix="slots")
    state = ServerState(engine, tok, "tiny", "chatml", slot_save_path=slot_dir)
    state.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", engine
    state.shutdown()
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_engine_direct(served):
    _, engine = served
    req = Request(
        prompt_tokens=np.array([1, 5, 9], np.int32),
        params=SamplingParams(temp=0.0),
        n_predict=8,
    )
    engine.submit(req)
    assert req.done.wait(timeout=120)
    assert len(req.output_tokens) >= 1
    assert req.stop_reason in ("length", "eos")


def test_http_health_and_models(served):
    url, _ = served
    with urllib.request.urlopen(url + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(url + "/v1/models", timeout=30) as r:
        assert json.loads(r.read())["data"][0]["id"] == "tiny"


def test_http_completion(served):
    url, _ = served
    out = _post(url + "/completion", {"prompt": "hi", "n_predict": 4, "temperature": 0})
    assert out["stop"] is True
    assert "content" in out
    assert out["tokens_predicted"] >= 1


def test_http_openai_chat(served):
    url, _ = served
    out = _post(url + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0,
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["finish_reason"] in ("length", "eos")
    assert out["usage"]["completion_tokens"] >= 1


def test_http_streaming(served):
    url, _ = served
    req = urllib.request.Request(
        url + "/v1/chat/completions",
        json.dumps({"messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 4, "temperature": 0, "stream": True}).encode(),
        {"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: "):
                if line == b"data: [DONE]":
                    break
                chunks.append(json.loads(line[6:]))
    assert chunks, "no SSE chunks"
    assert chunks[0]["object"] == "chat.completion.chunk"


def test_http_parallel_requests(served):
    url, _ = served
    results = []
    def worker(i):
        out = _post(url + "/completion",
                    {"prompt": f"req{i}", "n_predict": 6, "temperature": 0})
        results.append(out)
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 4
    assert all(r["stop"] for r in results)


def test_http_tokenize_metrics(served):
    url, _ = served
    out = _post(url + "/tokenize", {"content": "abc"})
    assert len(out["tokens"]) == 3
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "llamacpp:tokens_predicted_total" in text
    with urllib.request.urlopen(url + "/slots", timeout=30) as r:
        slots = json.loads(r.read())
    assert len(slots) == 2


def test_http_infill(served):
    url, _ = served
    out = _post(url + "/infill", {"input_prefix": "ab", "input_suffix": "yz",
                                  "n_predict": 4, "temperature": 0})
    assert out["stop"] is True
    assert "content" in out


def test_slot_save_restore(served, tmp_path):
    url, engine = served
    # run one request on slot 0 so its sequence has cache state
    out = _post(url + "/completion", {"prompt": "abc", "n_predict": 3, "temperature": 0})
    assert out["stop"]
    # filenames are confined to the configured slot dir: a path-traversal
    # name must be reduced to its basename (no writes outside the dir)
    fn = "../../etc/slot0.bin"
    saved = _post(url + "/slots/0?action=save", {"filename": fn})
    assert saved["id_slot"] == 0
    import os

    assert os.path.basename(saved["filename"]) == "slot0.bin"
    assert os.path.dirname(os.path.abspath(saved["filename"])) != "/etc"
    restored = _post(url + "/slots/0?action=restore", {"filename": fn})
    assert restored["success"] is True
    erased = _post(url + "/slots/0?action=erase", {})
    assert erased["erased"] is True


def test_chunked_decode_matches_per_token(tmp_path):
    """The on-device chunked decode path (chunk_steps>1) must produce
    exactly the same tokens as the per-token engine for greedy requests."""
    rng = np.random.default_rng(23)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "c.gguf"
    write_llama_gguf(path, weights, dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    tok = ToyTokenizer(dims["vocab"])

    def run(chunk_steps):
        ctx = LlamaContext(cfg, params, n_cells=256, compute_dtype=jnp.float32)
        engine = Engine(ctx, tok, n_slots=2, n_batch=64, chunk_steps=chunk_steps)
        req = Request(prompt_tokens=np.array([1, 5, 9], np.int32),
                      params=SamplingParams(temp=0.0), n_predict=17)
        engine.submit(req)
        stop = threading.Event()
        t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
        t.start()
        assert req.done.wait(timeout=240)
        stop.set()
        t.join(timeout=30)
        return req.output_tokens, engine.metrics["n_decode_steps"]

    toks_chunked, steps_chunked = run(8)
    toks_plain, steps_plain = run(0)
    assert toks_chunked == toks_plain
    assert len(toks_chunked) == 17
    assert steps_chunked < steps_plain  # fewer device round trips


def test_stop_holdback_helper():
    from llama_kotlin_tpu.runtime.engine import _stop_holdback

    assert _stop_holdback("hello wor", ("world",)) == 3  # "wor" prefix of "world"
    assert _stop_holdback("hello", ("world",)) == 0
    assert _stop_holdback("ab", ("abc", "bcd")) == 2
    assert _stop_holdback("xyb", ("abc", "bcd")) == 1  # "b" prefix of "bcd"
    assert _stop_holdback("", ("stop",)) == 0
    # a full match is not held back (stop detection trims it instead)
    assert _stop_holdback("stop", ("stop",)) == 0


def test_stream_never_leaks_trimmed_stop_content(served):
    """Streamed deltas must concatenate to exactly the final (stop-trimmed)
    output_text — clients never see content that is later trimmed."""
    _, engine = served
    params = SamplingParams(temp=0.0)

    # first run without stop strings to learn the greedy output text
    r0 = Request(prompt_tokens=np.array([1, 9, 25], np.int64), params=params,
                 n_predict=24)
    engine.submit(r0)
    assert r0.done.wait(60)
    assert len(r0.output_text) > 4
    stop = r0.output_text[len(r0.output_text) // 2:][:3]

    deltas = []
    r1 = Request(prompt_tokens=np.array([1, 9, 25], np.int64), params=params,
                 n_predict=24, stop_strings=(stop,),
                 stream=lambda tok, text, done: deltas.append(text))
    engine.submit(r1)
    assert r1.done.wait(60)
    assert stop not in r1.output_text
    assert "".join(deltas) == r1.output_text


def test_slot_context_shift_mid_generation(tmp_path):
    """A generation longer than the slot context must context-shift (keep
    n_keep, discard half) and CONTINUE to n_predict, not stop with
    'length' at the context edge (server.cpp:1947 behavior)."""
    rng = np.random.default_rng(21)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, weights, dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
    tok = ToyTokenizer(dims["vocab"])
    engine = Engine(ctx, tok, n_slots=1, n_batch=16, chunk_steps=0)

    req = Request(prompt_tokens=np.array([1, 5, 9], np.int32),
                  params=SamplingParams(temp=0.0), n_predict=48)
    engine.submit(req)
    stop = threading.Event()
    t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
    t.start()
    ok = req.done.wait(timeout=300)
    stop.set()
    t.join(timeout=30)
    assert ok
    # generated PAST the 32-cell context thanks to the shift
    assert len(req.output_tokens) == 48
    assert req.stop_reason == "length"  # n_predict reached, not ctx edge


def test_http_completion_n_probs(served):
    """Native n_probs (server.cpp:931): per-token top-N probabilities in
    probs_vector_to_json shape (reference examples/server/utils.hpp)."""
    url, _ = served
    out = _post(url + "/completion", {"prompt": "hi", "n_predict": 3,
                                      "temperature": 0, "n_probs": 4})
    cp = out["completion_probabilities"]
    assert len(cp) == len(out["content"]) or len(cp) >= 1
    for entry in cp:
        assert "content" in entry
        probs = entry["probs"]
        assert len(probs) == 4
        ps = [p["prob"] for p in probs]
        assert all(0.0 <= p <= 1.0 for p in ps)
        assert ps == sorted(ps, reverse=True)  # top-N sorted desc


def test_http_openai_logprobs(served):
    """OpenAI spellings: completions logprobs=N; chat logprobs=true +
    top_logprobs=N."""
    url, _ = served
    out = _post(url + "/v1/completions", {"prompt": "hi", "max_tokens": 3,
                                          "temperature": 0, "logprobs": 3})
    lp = out["choices"][0]["logprobs"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) >= 1
    assert all(v <= 0.0 for v in lp["token_logprobs"])
    assert all(len(t) == 3 for t in lp["top_logprobs"])
    # greedy decode: the sampled token must be the argmax -> its logprob
    # equals the best top_logprob
    for tl, v in zip(lp["top_logprobs"], lp["token_logprobs"]):
        assert abs(max(tl.values()) - v) < 1e-9

    out = _post(url + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 3, "temperature": 0,
        "logprobs": True, "top_logprobs": 2,
    })
    content = out["choices"][0]["logprobs"]["content"]
    assert len(content) >= 1
    for e in content:
        assert e["logprob"] <= 0.0
        assert len(e["top_logprobs"]) == 2


def test_http_system_prompt(served):
    """Global system prompt (server.cpp:642,1130): prefixes every request
    and changes greedy output; clearing restores the old output."""
    url, engine = served
    base = _post(url + "/completion", {"prompt": "xyz", "n_predict": 6,
                                       "temperature": 0})["content"]
    with_sys = _post(url + "/completion", {
        "prompt": "xyz", "n_predict": 6, "temperature": 0,
        "system_prompt": "You are terse.",
    })["content"]
    assert engine.system_tokens  # prefix installed
    # conditioning on the prefix changes the greedy continuation
    # (random weights: any prefix change perturbs logits)
    assert with_sys != base
    again = _post(url + "/completion", {"prompt": "xyz", "n_predict": 6,
                                        "temperature": 0})["content"]
    assert again == with_sys  # prefix is sticky (global)
    cleared = _post(url + "/completion", {"prompt": "xyz", "n_predict": 6,
                                          "temperature": 0,
                                          "system_prompt": ""})["content"]
    assert cleared == base
    assert not engine.system_tokens


def test_server_saturation_mixed_streaming(served):
    """More concurrent streaming requests than slots with mixed n_predict:
    every request completes with exactly its requested token count and no
    stall (reference examples/server/tests parallel.feature)."""
    import threading as _th

    url, engine = served
    n_slots = len(engine.slots)
    n_req = 3 * n_slots
    lens = [3 + (i % 4) * 2 for i in range(n_req)]  # 3..9 tokens, mixed
    results: dict[int, list] = {i: [] for i in range(n_req)}
    errors: list = []

    def run(i):
        try:
            req = urllib.request.Request(
                url + "/completion",
                json.dumps({"prompt": f"req {i}", "n_predict": lens[i],
                            "temperature": 0, "stream": True}).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                for line in r:
                    line = line.strip()
                    if line.startswith(b"data: "):
                        results[i].append(json.loads(line[6:]))
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    threads = [_th.Thread(target=run, args=(i,)) for i in range(n_req)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert all(not t.is_alive() for t in threads), "stalled request"
    for i in range(n_req):
        evs = results[i]
        assert evs and evs[-1]["stop"] is True
        n_toks = sum(1 for e in evs if e.get("content"))
        assert 1 <= n_toks <= lens[i] + 1
    # fairness: with 3x oversubscription everything drains reasonably fast
    assert time.time() - t0 < 240


def test_http_web_ui(served):
    """GET / serves the bundled chat UI (reference examples/server/public
    parity)."""
    url, _ = served
    with urllib.request.urlopen(url + "/", timeout=30) as r:
        body = r.read().decode()
        assert r.headers["Content-Type"].startswith("text/html")
    assert "/v1/chat/completions" in body and "<textarea" in body
