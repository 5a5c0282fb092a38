"""Device-trace the e2e decode loop and print a per-op time breakdown.

Usage (TPU single-tenant — run alone):
    timeout 1800 python scripts/trace_decode.py [--preset llama2-7b]
        [--mode w4a8] [--steps 32] [--out /tmp/tr_decode]

Captures a jax.profiler trace of ONE warm generate_loop call and
aggregates the TPU device plane's XLA-op self-times, so e2e tokens/s
gaps decompose into kernel/op buckets (host wall-clock of sub-ms device
calls through the axon tunnel is garbage — CLAUDE.md gotcha; this reads
the device timeline instead).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_traced(preset: str, mode: str, steps: int, out_dir: str,
               kv: str = "", fill: int = 64, cells: int = 1024) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                   synthetic_params_device)
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop
    from llama_kotlin_tpu.utils.profiling import (default_xla_opts,
                                                  enable_compile_cache)

    default_xla_opts()  # tuned TPU compiler options (one site: profiling.py)
    enable_compile_cache()
    cfg = preset_config(preset)
    params = synthetic_params_device(
        cfg, GGMLQuantType.Q4_K, compute_dtype=jnp.bfloat16,
        fast_int8=(mode == "int8"),
        fast_w4a8={"w4a8": True, "exact": "w4x"}.get(mode, False), fuse=True)
    jax.block_until_ready(jax.tree.leaves(params))
    ctx = LlamaContext(cfg, params, n_cells=cells, compute_dtype=jnp.bfloat16,
                       buckets=(8, 16, 32, 64, 128, 256, 512),
                       n_ubatch=1024, prefer_unrolled=True,
                       vis_bucketing=(cells <= 1024),
                       kv_quant=kv or False)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, fill).astype(np.int32)
    assert ctx.decode(Batch.single(prompt)) == 0
    tok = int(np.argmax(ctx.get_logits()[-1]))

    def run_loop(n):
        slots_flat = ctx.meta.find_slots(n)
        pos = np.arange(fill, fill + n, dtype=np.int32)
        ctx.meta.commit(slots_flat, pos, np.zeros(n, np.int32))
        out, cache, *_ = generate_loop(
            ctx.params, ctx.cfg, ctx.cache,
            jnp.asarray(ctx.meta.pos), jnp.asarray(ctx.meta.seq),
            jnp.full((1,), tok, jnp.int32), jnp.full((1,), fill, jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.asarray(slots_flat.reshape(n, 1)),
            n, SampleParams(), jnp.bfloat16)
        ctx.cache = cache
        jax.block_until_ready(out)
        ctx.meta.pos[slots_flat] = -1
        ctx.meta.seq[slots_flat] = 0
        ctx.meta._next = int(slots_flat[0])

    run_loop(steps)  # compile
    # several warm reps: host dispatch through the axon tunnel adds tens of
    # ms of run-to-run jitter per call, so A/B decisions use the BEST rep
    reps = int(os.environ.get("TRACE_REPS", "3"))
    best = None
    for _ in range(reps):
        t0 = time.time()
        run_loop(steps)
        dt = time.time() - t0
        print(f"warm loop: {steps} steps in {dt*1e3:.1f} ms "
              f"= {steps/dt:.1f} t/s", flush=True)
        best = dt if best is None else min(best, dt)
    print(f"best: {steps/best:.1f} t/s", flush=True)
    if out_dir == "none":  # timing-only A/B mode
        return
    jax.profiler.start_trace(out_dir)
    run_loop(steps)
    jax.profiler.stop_trace()


def analyze(out_dir: str, steps: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("no xplane.pb found under", out_dir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = collections.Counter()
        cnt = collections.Counter()
        total = 0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and line.name != "XLA Modules":
                # keep only the op line (avoid double counting)
                pass
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                # names can be full HLO text: take the lhs, strip suffixes
                base = re.sub(r"[.\d]+$", "", name.split(" = ")[0].strip())
                agg[base] += ev.duration_ps
                cnt[base] += 1
                total += ev.duration_ps
        if not agg:
            continue
        print(f"\n== plane: {plane.name}  total {total/1e12*1e3:.2f} ms "
              f"({total/1e12*1e3/max(steps,1):.3f} ms/step) ==")
        for name, ps in agg.most_common(28):
            print(f"  {ps/1e12*1e3:8.2f} ms  {cnt[name]:5d}x  {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama2-7b")
    ap.add_argument("--mode", default="w4a8")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--out", default="/tmp/tr_decode")
    ap.add_argument("--kv", default="", help="q8_0 | q4_0 quantized KV cache")
    ap.add_argument("--fill", type=int, default=64,
                    help="prefill length (long-context repro: e.g. 8192)")
    ap.add_argument("--cells", type=int, default=1024)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        run_traced(args.preset, args.mode, args.steps, args.out, kv=args.kv,
                   fill=args.fill, cells=args.cells)
    if args.out != "none":
        analyze(args.out, args.steps)


if __name__ == "__main__":
    main()
