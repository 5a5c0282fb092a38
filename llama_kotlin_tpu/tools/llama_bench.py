"""Throughput benchmark matrix (parity target: examples/llama-bench,
1,484 LoC): pp (prompt processing) and tg (token generation) throughput
over parameter sweeps, with markdown/json/csv output.

Usage:
    python -m llama_kotlin_tpu.tools.llama_bench --model m.gguf -p 512 -n 128
    python -m llama_kotlin_tpu.tools.llama_bench --preset llama3-8b --qtype q4_K
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np


def bench_pp(ctx, n_prompt: int, reps: int) -> list[float]:
    """Prompt-processing tokens/s."""
    from llama_kotlin_tpu.runtime.batch import Batch

    rng = np.random.default_rng(0)
    out = []
    for _ in range(reps + 1):  # first rep warms the compile cache
        ctx.clear()
        toks = rng.integers(0, ctx.cfg.vocab_size, n_prompt).astype(np.int32)
        t0 = time.perf_counter()
        rc = ctx.decode(Batch.single(toks))
        assert rc == 0
        ctx.get_logits()  # sync
        out.append(n_prompt / (time.perf_counter() - t0))
    return out[1:]


def bench_tg(ctx, n_gen: int, reps: int) -> list[float]:
    """Generation tokens/s via the on-device loop."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop

    out = []
    for r in range(reps + 1):
        ctx.clear()
        ctx.decode(Batch.single(np.array([1], np.int32)))
        slots = ctx.meta.find_slots(n_gen)
        ctx.meta.commit(slots, np.arange(1, 1 + n_gen, dtype=np.int32),
                        np.zeros(n_gen, np.int32))
        t0 = time.perf_counter()
        toks, cache, *_ = generate_loop(
            ctx.params, ctx.cfg, ctx.cache,
            *ctx.meta.device_view(),
            jnp.asarray([1], jnp.int32), jnp.asarray([1], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray(slots.reshape(n_gen, 1)),
            n_gen, SampleParams(), ctx.compute_dtype,
        )
        ctx.cache = cache
        jax.block_until_ready(toks)
        out.append(n_gen / (time.perf_counter() - t0))
    return out[1:]


def fmt_md(rows: list[dict]) -> str:
    head = "| model | test | t/s |\n|---|---|---|"
    lines = [head]
    for r in rows:
        lines.append(f"| {r['model']} | {r['test']} | {r['avg']:.2f} ± {r['stddev']:.2f} |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model")
    ap.add_argument("--preset", help="synthetic preset instead of a GGUF")
    ap.add_argument("--qtype", default="q4_K")
    ap.add_argument("-p", "--n-prompt", type=int, nargs="*", default=[512])
    ap.add_argument("-n", "--n-gen", type=int, nargs="*", default=[128])
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("-o", "--output", choices=["md", "json", "csv", "sql"],
                    default="md")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a device trace of the bench runs into "
                         "this directory (also honours LKTPU_TRACE_DIR)")
    ap.add_argument("--fast-mode", default=None,
                    choices=["int8", "w4", "w4x"],
                    help="serving weight layout for --model runs")
    ap.add_argument("--cache-type-k", "-ctk", default="f16",
                    choices=["f16", "bf16", "q8_0", "q4_0"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from llama_kotlin_tpu.runtime.context import LlamaContext

    if args.preset:
        from llama_kotlin_tpu.models.synthetic import preset_config, synthetic_params
        from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE

        cfg = preset_config(args.preset)
        params = synthetic_params(cfg, NAME_TO_TYPE[args.qtype])
        name = f"{args.preset}-{args.qtype}"
    else:
        from llama_kotlin_tpu.models.loader import load_gguf_model

        cfg, params, f = load_gguf_model(args.model, fast_mode=args.fast_mode,
                                         fuse=True)
        f.close()
        name = cfg.name or args.model

    n_cells = max(max(args.n_prompt, default=512), max(args.n_gen, default=128) + 8, 512)
    n_cells = (n_cells + 255) // 256 * 256
    kv_quant = args.cache_type_k if args.cache_type_k in ("q8_0", "q4_0") else False
    ctx = LlamaContext(cfg, params, n_cells=n_cells, kv_quant=kv_quant)

    from llama_kotlin_tpu.utils.profiling import env_trace_dir, maybe_trace

    rows = []
    with maybe_trace(args.profile_dir or env_trace_dir()):
        for np_ in args.n_prompt:
            if np_ <= 0:
                continue
            vals = bench_pp(ctx, np_, args.reps)
            rows.append({"model": name, "test": f"pp{np_}", "avg": statistics.mean(vals),
                         "stddev": statistics.stdev(vals) if len(vals) > 1 else 0.0})
        for ng in args.n_gen:
            if ng <= 0:
                continue
            vals = bench_tg(ctx, ng, args.reps)
            rows.append({"model": name, "test": f"tg{ng}", "avg": statistics.mean(vals),
                         "stddev": statistics.stdev(vals) if len(vals) > 1 else 0.0})

    if args.output == "json":
        print(json.dumps(rows, indent=2))
    elif args.output == "csv":
        print("model,test,avg_tps,stddev")
        for r in rows:
            print(f"{r['model']},{r['test']},{r['avg']:.2f},{r['stddev']:.2f}")
    elif args.output == "sql":
        # sqlite-loadable dump (reference llama-bench's -o sql,
        # examples/llama-bench/README.md): CREATE TABLE + one INSERT/row
        print("CREATE TABLE IF NOT EXISTS test (\n"
              "  model TEXT, test TEXT, avg_ts REAL, stddev_ts REAL\n);")
        for r in rows:
            m = r["model"].replace("'", "''")
            print(f"INSERT INTO test VALUES ('{m}', '{r['test']}', "
                  f"{r['avg']:.2f}, {r['stddev']:.2f});")
    else:
        print(fmt_md(rows))


if __name__ == "__main__":
    main()
