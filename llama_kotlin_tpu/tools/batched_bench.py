"""Batched throughput benchmark (parity: examples/batched-bench):
for each (n_pp, n_tg, n_pl) combo, time prompt processing of pp tokens
(optionally shared across sequences) and pl-way parallel decode of tg
steps, reporting speeds like the reference's PP/TG/T table."""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_combo(ctx, n_pp: int, n_tg: int, n_pl: int,
                shared_prompt: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop

    rng = np.random.default_rng(0)
    ctx.clear()
    prompt = rng.integers(0, ctx.cfg.vocab_size, n_pp).astype(np.int32)

    t0 = time.time()
    rc = ctx.decode(Batch.single(prompt))
    assert rc == 0, "cache full during prefill"
    tok = int(np.argmax(ctx.get_logits()[-1]))
    t_pp = time.time() - t0
    if shared_prompt:
        for s in range(1, n_pl):
            ctx.seq_cp(0, s)

    slots = ctx.meta.find_slots(n_tg * n_pl)
    assert slots is not None, "cache full for decode"
    pos = np.repeat(np.arange(n_pp, n_pp + n_tg, dtype=np.int32), n_pl)
    seqs = np.tile(np.arange(n_pl, dtype=np.int32), n_tg)
    ctx.meta.commit(slots, pos, seqs)
    # visibility: slots are pre-allocated, so the final span is known —
    # pass the bucketed view instead of all n_cells (full-cache flash
    # reads cost ~1.3 ms/step at 8k cells on an 8B model)
    span = int(slots.max()) + 1
    n_vis = span + (-span) % 256
    t0 = time.time()
    out, cache, *_ = generate_loop(
        ctx.params, ctx.cfg, ctx.cache,
        *ctx.meta.device_view(min(n_vis, ctx.n_cells)),
        jnp.full((n_pl,), tok, jnp.int32),
        jnp.full((n_pl,), n_pp, jnp.int32),
        jnp.arange(n_pl, dtype=jnp.int32),
        jnp.asarray(slots.reshape(n_tg, n_pl)),
        n_tg, SampleParams(), ctx.compute_dtype,
    )
    ctx.cache = cache
    jax.block_until_ready(out)
    t_tg = time.time() - t0

    return {
        "pp": n_pp, "tg": n_tg, "pl": n_pl,
        "t_pp_s": round(t_pp, 3),
        "s_pp": round(n_pp / t_pp, 2) if t_pp else 0.0,
        "t_tg_s": round(t_tg, 3),
        "s_tg": round(n_tg * n_pl / t_tg, 2) if t_tg else 0.0,
    }


def main(argv=None):
    import os

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext

    from llama_kotlin_tpu.utils.profiling import default_xla_opts

    default_xla_opts()  # tuned TPU compiler options (one site: profiling.py)

    ap = argparse.ArgumentParser(description="batched pp/tg benchmark")
    ap.add_argument("--model", "-m",
                    help="GGUF path (or use --synthetic PRESET)")
    ap.add_argument("--synthetic",
                    help="synthetic preset (e.g. llama3-8b) with on-device "
                         "random Q4_K weights — device benching at 8B scale "
                         "without a model file (zero-egress environment)")
    ap.add_argument("--mode", default="w4a8",
                    choices=["w4a8", "exact", "int8", "dequant"],
                    help="serving mode for --synthetic weights")
    ap.add_argument("-npp", type=int, nargs="+", default=[128, 256])
    ap.add_argument("-ntg", type=int, nargs="+", default=[32])
    ap.add_argument("-npl", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--n-ctx", "-c", type=int, default=4096)
    ap.add_argument("--warm", action="store_true",
                    help="run each combo twice and report the warm pass "
                         "(excludes XLA compile — required for honest "
                         "device numbers)")
    ap.add_argument("-o", "--output", default="md", choices=["md", "json"])
    args = ap.parse_args(argv)
    if args.synthetic:
        import jax
        import jax.numpy as jnp

        from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                       synthetic_params_device)
        from llama_kotlin_tpu.quant.formats import GGMLQuantType

        cfg = preset_config(args.synthetic)
        params = synthetic_params_device(
            cfg, GGMLQuantType.Q4_K, compute_dtype=jnp.bfloat16,
            fast_int8=(args.mode == "int8"),
            fast_w4a8={"w4a8": True, "exact": "w4x"}.get(args.mode, False),
            fuse=True)
        jax.block_until_ready(jax.tree.leaves(params))
    else:
        if not args.model:
            ap.error("one of --model / --synthetic is required")
        cfg, params, f = load_gguf_model(args.model)
        f.close()
    ctx = LlamaContext(cfg, params, n_cells=args.n_ctx,
                       n_seq_max=max(32, max(args.npl)))
    rows = []
    for pp in args.npp:
        for tg in args.ntg:
            for pl in args.npl:
                if args.warm:
                    bench_combo(ctx, pp, tg, pl)  # compile pass
                rows.append(bench_combo(ctx, pp, tg, pl))
                print(f"done pp={pp} tg={tg} pl={pl}", file=sys.stderr)
    if args.output == "json":
        print(json.dumps(rows))
    else:
        print("| pp | tg | pl | t_pp(s) | pp t/s | t_tg(s) | tg t/s |")
        print("|----|----|----|---------|--------|---------|--------|")
        for r in rows:
            print(f"| {r['pp']} | {r['tg']} | {r['pl']} | {r['t_pp_s']} "
                  f"| {r['s_pp']} | {r['t_tg_s']} | {r['s_tg']} |")


if __name__ == "__main__":
    main()
