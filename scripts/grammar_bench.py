"""Constrained-decode cliff measurement (SURVEY §7.3 / VERDICT #6).

Measures engine decode throughput for three request classes on the same
synthetic model:
  plain    — greedy, no grammar: the chunked on-device loop path
  grammar  — GBNF-constrained: per-token steps with DEVICE-masked sampling
             (host pushdown mask uploaded as a vocab/8-byte bitset; only
             token ids cross the link — runtime/engine.py
             _sample_rows_masked_device)
  hostpath — same grammar forced onto the legacy host-sampling path
             (downloads [1, vocab] f32 logits per token) for comparison

Prints one JSON line per row.  Run on TPU (single-tenant; serialize):
    timeout 1800 python scripts/grammar_bench.py [--preset tinyllama-1.1b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


from bench_common import CharTokenizer  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tinyllama-1.1b")
    ap.add_argument("--n", type=int, default=64)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                   synthetic_params_device)
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from llama_kotlin_tpu.sampling.samplers import SamplingParams
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    cfg = preset_config(args.preset)
    params = synthetic_params_device(cfg, GGMLQuantType.Q4_K,
                                     fast_w4a8=True, fuse=True)
    jax.block_until_ready(jax.tree.leaves(params))
    ctx = LlamaContext(cfg, params, n_cells=512,
                       buckets=(8, 16, 32, 64), prefer_unrolled=True)
    tok = CharTokenizer(cfg.vocab_size)
    engine = Engine(ctx, tok, n_slots=1, n_batch=64)
    grammar = 'root ::= [a-z]+'

    def run(params_s, label, force_host=False):
        if force_host:
            orig = Engine._device_maskable
            Engine._device_maskable = lambda self, p: False
        try:
            for warm in (True, False):
                stamps = []  # per-token arrival times (stream callback)
                req = Request(
                    prompt_tokens=np.array([1, 5, 9], np.int32),
                    params=params_s, n_predict=args.n,
                    stream=lambda tok, txt, done: stamps.append(time.time()))
                engine.submit(req)
                stop = threading.Event()
                t = threading.Thread(target=engine.run_loop, args=(stop,),
                                     daemon=True)
                t0 = time.time()
                t.start()
                ok = req.done.wait(timeout=1200)
                stop.set()
                t.join(timeout=30)
                dt = time.time() - t0
                assert ok, f"{label}: timed out"
            tps = len(req.output_tokens) / dt
            # latency tail (VERDICT r3 #6 / r4 Weak #6).  The engine
            # delivers grammar tokens in optimistic CHUNKS, so per-token
            # inter-arrival is bursty by design; the tail that matters is
            # the stall structure: time-to-first-token (novel grammars pay
            # table builds here) and the p99/median of chunk-boundary gaps.
            st = np.array(stamps)
            ttft = (st[0] - t0) * 1e3 if len(st) else 0.0
            gaps = np.diff(st) * 1e3
            gaps = gaps[gaps > 0.5]  # chunk boundaries + stalls only
            med = float(np.median(gaps)) if len(gaps) else 0.0
            p99 = float(np.percentile(gaps, 99)) if len(gaps) else 0.0
            print(json.dumps({"kind": "grammar_bench", "label": label,
                              "tokens": len(req.output_tokens),
                              "s": round(dt, 2), "tps": round(tps, 2),
                              "ttft_ms": round(ttft, 1),
                              "gap_ms_median": round(med, 2),
                              "gap_ms_p99": round(p99, 2),
                              "p99_over_median": round(p99 / max(med, 1e-9), 2),
                              "backend": jax.default_backend()}), flush=True)
            return tps
        finally:
            if force_host:
                Engine._device_maskable = orig

    plain = run(SamplingParams(temp=0.0), "plain")
    gram = run(SamplingParams(temp=0.0, grammar=grammar), "grammar_devmask")
    host = run(SamplingParams(temp=0.0, grammar=grammar), "grammar_hostpath",
               force_host=True)
    # distinct-schema churn: novel grammars pay the table-build sweeps
    # (now LRU-evicted, sampling/grammar.py) — the multi-tenant tail
    for i in range(6):
        lo = chr(ord('a') + i)
        g = f'root ::= [{lo}-z0-9]+ | "x" [{lo}-m]*'
        run(SamplingParams(temp=0.0, grammar=g), f"grammar_novel_{i}")
    print(json.dumps({"kind": "grammar_bench", "label": "summary",
                      "grammar_vs_plain": round(gram / plain, 3),
                      "devmask_vs_hostpath": round(gram / host, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
