"""Long-context decode curve: tokens/s vs live context x KV cache type.

VERDICT r3 #3: the reference's whole KV-quantization story (type_k/type_v,
include/llama.h:304-311) exists to win at long context; this script
measures the decode-t/s-vs-context curve for bf16 / q8_0 (int8) / q4_0
(packed int4) KV on the chip, locating the crossover where quantized KV
starts paying for its per-step quantize/dequant overhead with byte
savings.  Default preset is the BASELINE.json configs[3] shape
(Mistral-7B-class 32k GQA).

Usage (TPU single-tenant — run alone):
    timeout 3000 python scripts/longctx_bench.py [--preset mistral-7b]
        [--fills 512,2048,8192,32768] [--kv bf16,q8_0,q4_0] [--steps 64]

Prints one JSON line per (fill, kv) plus a markdown table at the end.
Host wall-clock is trustworthy here: each timed region is a multi-second
device loop (CLAUDE.md measurement rule).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_point(cfg, params, fill: int, kv: str, steps: int,
                qtype_name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop

    # one visibility size per point (vis_bucketing off) -> one loop compile
    n_cells = fill + max(2 * steps, 128)
    n_cells += (-n_cells) % 128
    ctx = LlamaContext(
        cfg, params, n_cells=n_cells, n_ubatch=1024,
        compute_dtype=jnp.bfloat16, buckets=(1024,),
        prefer_unrolled=True, vis_bucketing=False,
        kv_quant=(kv if kv != "bf16" else False))
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, fill).astype(np.int32)
    t0 = time.time()
    rc = ctx.decode(Batch.single(prompt))
    assert rc == 0, "cache full during prefill"
    tok = int(np.argmax(ctx.get_logits()[-1]))
    prefill_s = time.time() - t0

    def run_loop(n):
        slots = ctx.meta.find_slots(n)
        assert slots is not None
        ctx.meta.commit(slots, np.arange(fill, fill + n, dtype=np.int32),
                        np.zeros(n, np.int32))
        out, cache, *_ = generate_loop(
            ctx.params, ctx.cfg, ctx.cache,
            *ctx.meta.device_view(),
            jnp.full((1,), tok, jnp.int32),
            jnp.full((1,), fill, jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.asarray(slots.reshape(n, 1)),
            n, SampleParams(), ctx.compute_dtype,
        )
        ctx.cache = cache
        jax.block_until_ready(out)
        ctx.meta.pos[slots] = -1
        ctx.meta.seq[slots] = 0
        ctx.meta._next = int(slots[0])

    t0 = time.time()
    run_loop(steps)
    compile_s = time.time() - t0
    t0 = time.time()
    run_loop(steps)
    dt = time.time() - t0
    kv_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in (ctx.cache.k, ctx.cache.v,
                             ctx.cache.k_scale, ctx.cache.v_scale)
                   if a is not None)
    row = {"preset": cfg.name, "qtype": qtype_name, "fill": fill, "kv": kv,
           "tps": round(steps / dt, 2), "steps": steps,
           "prefill_s": round(prefill_s, 1),
           "loop_compile_s": round(compile_s, 1),
           "kv_cache_mb": round(kv_bytes / 1e6, 1), "n_cells": n_cells}
    del ctx
    return row


def main(argv=None):
    from llama_kotlin_tpu.utils.profiling import default_xla_opts

    default_xla_opts()  # tuned TPU compiler options (one site: profiling.py)
    ap = argparse.ArgumentParser(description="long-context decode curve")
    ap.add_argument("--preset", default="mistral-7b")
    ap.add_argument("--qtype", default="Q5_K",
                    help="weight quant profile (BASELINE configs[3] = Q5_K)")
    ap.add_argument("--mode", default="w4a8")
    ap.add_argument("--fills", default="512,2048,8192,32768")
    ap.add_argument("--kv", default="bf16,q8_0,q4_0")
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                   synthetic_params_device)
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    cfg = preset_config(args.preset)
    params = synthetic_params_device(
        cfg, getattr(GGMLQuantType, args.qtype.upper()),
        compute_dtype=jnp.bfloat16,
        fast_int8=(args.mode == "int8"),
        fast_w4a8={"w4a8": True, "exact": "w4x"}.get(args.mode, False),
        fuse=True)
    jax.block_until_ready(jax.tree.leaves(params))

    rows = []
    for fill in (int(f) for f in args.fills.split(",")):
        for kv in args.kv.split(","):
            row = bench_point(cfg, params, fill, kv, args.steps, args.qtype)
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n| fill | kv | tg t/s | kv MB |")
    print("|------|----|--------|-------|")
    for r in rows:
        print(f"| {r['fill']} | {r['kv']} | {r['tps']} | {r['kv_cache_mb']} |")


if __name__ == "__main__":
    main()
