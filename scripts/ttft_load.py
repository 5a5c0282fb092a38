"""TTFT under concurrent load (VERDICT r4 task 6 tail).

Submits a staggered stream of requests to the Engine (continuous
batching, n_slots parallel sequences) on a synthetic 8B model and
reports per-request TTFT (t_first_token - t_start) and end-to-end
latency percentiles at several concurrency levels — the serving metric
the reference's server benches via k6 (examples/server/bench).

Usage:  timeout 3600 python scripts/ttft_load.py [--preset llama3-8b]
        [--n-req 12] [--slots 4] [--n-predict 48]
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

import numpy as np


from bench_common import CharTokenizer  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--n-req", type=int, default=12)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--n-predict", type=int, default=48)
    ap.add_argument("--prompt-len", type=int, default=64)
    args = ap.parse_args()

    import jax

    from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                   synthetic_params_device)
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.engine import Engine, Request
    from llama_kotlin_tpu.sampling.samplers import SamplingParams
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache

    from llama_kotlin_tpu.utils.profiling import default_xla_opts

    default_xla_opts()  # tuned TPU compiler options (one site: profiling.py)
    enable_compile_cache()
    cfg = preset_config(args.preset)
    params = synthetic_params_device(cfg, GGMLQuantType.Q4_K,
                                     fast_w4a8=True, fuse=True)
    jax.block_until_ready(jax.tree.leaves(params))
    ctx = LlamaContext(cfg, params, n_cells=2048,
                       buckets=(64, 128, 256, 512, 1024),
                       n_seq_max=max(8, args.slots),
                       prefer_unrolled=True)
    tok = CharTokenizer(cfg.vocab_size)
    engine = Engine(ctx, tok, n_slots=args.slots, n_batch=64)
    rng = np.random.default_rng(0)

    def run_wave(n_req, warm=False):
        stop = threading.Event()
        t = threading.Thread(target=engine.run_loop, args=(stop,), daemon=True)
        t.start()
        reqs = []
        for i in range(n_req):
            req = Request(
                prompt_tokens=rng.integers(
                    3, cfg.vocab_size, args.prompt_len).astype(np.int32),
                params=SamplingParams(temp=0.0),
                n_predict=args.n_predict)
            engine.submit(req)
            reqs.append(req)
            time.sleep(0.02)  # staggered arrivals
        for req in reqs:
            ok = req.done.wait(timeout=1200)
            assert ok, "request timed out"
        stop.set()
        t.join(timeout=30)
        if warm:
            return None
        ttfts = np.array([(r.t_first_token - r.t_start) * 1e3 for r in reqs])
        e2e = np.array([(r.t_done - r.t_start) * 1e3 for r in reqs])
        toks = sum(len(r.output_tokens) for r in reqs)
        span = max(r.t_done for r in reqs) - min(r.t_start for r in reqs)
        return {
            "kind": "ttft_load", "n_req": n_req, "slots": args.slots,
            "ttft_ms_p50": round(float(np.percentile(ttfts, 50)), 1),
            "ttft_ms_p95": round(float(np.percentile(ttfts, 95)), 1),
            "ttft_ms_max": round(float(ttfts.max()), 1),
            "e2e_ms_p50": round(float(np.percentile(e2e, 50)), 1),
            "agg_tps": round(toks / span, 1),
            "backend": jax.default_backend(),
        }

    run_wave(min(4, args.n_req), warm=True)  # compile pass
    for n in (1, args.slots, args.n_req):
        row = run_wave(n)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
