"""TPU kernel tuning sweep — run the moment the axon tunnel is back.

Measures, on the real chip, with jax.profiler device traces as ground
truth (host wall-clock through the tunnel is unreliable for sub-ms calls,
see TODO.md):

1. W4 / W8 / Q8F kernel GB/s on the 8B hot shapes ([4096,4096] qkv-ish,
   [14336,4096] ffn, [4096,14336] down, [16384,4096] lm_head-class tile) across the
   plan space, via multi-second repeat loops (lax.fori_meaning: we jit a
   scan of R kernel calls and time the whole thing).
2. bench.py presets per mode (w4a8 / exact / int8) end-to-end decode t/s.

Writes JSON lines to scripts/tune_results.json (append).

Usage:  timeout 1800 python scripts/tpu_tune.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

RESULTS = Path(__file__).parent / "tune_results.json"


def record(row: dict) -> None:
    row["t"] = time.strftime("%H:%M:%S")
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def _streamed_bytes(w) -> int:
    """Bytes a fast-mode kernel actually reads per call: codes + the
    transposed aux planes.  g_scale/g_min stay HBM-resident for the
    dequant/prefill paths but are never streamed by the W4/W8 decode
    kernels — counting them inflated kernel GB/s ~17% (round-4 finding)."""
    import numpy as _np

    if getattr(w, "aux", None):
        total = int(_np.prod(w.codes.shape)) * w.codes.dtype.itemsize
        return total + sum(int(_np.prod(a.shape)) * a.dtype.itemsize
                           for a in w.aux.values()
                           if getattr(a, "ndim", 0) >= 2)
    import jax as _jax

    return sum(int(_np.prod(a.shape)) * a.dtype.itemsize
               for a in _jax.tree.leaves(w))


def bench_kernel(shape, mode: str, reps: int, b: int = 8) -> dict:
    """One kernel microbench: R chained calls under one jit, wall-clocked
    as a block (amortizes dispatch; total runtime is multi-second)."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.synthetic import synthetic_w4, synthetic_q8flat
    from llama_kotlin_tpu.ops.qmatmul import qmatmul

    n, k = shape
    rng = np.random.default_rng(0)
    if mode == "ffn":
        # fused gate|up|down megakernel: shape = (E, F)
        from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import qmm_w4_ffn_matmul
        from llama_kotlin_tpu.quant.qtensor import QTensor

        E, F = shape
        gu = jax.tree.map(jnp.asarray, synthetic_w4(rng, 2 * F, E))
        dn = jax.tree.map(jnp.asarray, synthetic_w4(rng, E, F))
        x = jnp.asarray(rng.standard_normal((b, E)), jnp.float32)

        def make_run(r):
            # weights stay CLOSURE CONSTANTS on purpose: passed as jit
            # arguments they are loop-invariant, and XLA hoists their VMEM
            # staging out of the fori_loop — the kernel then streams from
            # VMEM, not HBM, and the "bandwidth" reads 3+ TB/s (round-4
            # measurement).  Constants defeat the hoist.  Cost: shapes
            # > ~100 MB exceed the axon remote-compile body limit
            # (HTTP 413) — microbench those via e2e traces instead.
            @jax.jit
            def run(x):
                def body(i, acc):
                    y = qmm_w4_ffn_matmul(x + acc[:, :1], gu, dn)
                    return acc + y[:, :1] * 1e-30
                return jax.lax.fori_loop(0, r, body,
                                         jnp.zeros((b, 1), jnp.float32))
            return run

        nbytes = sum(_streamed_bytes(w_) for w_ in (gu, dn))
        reps = min(100_000, max(100, int(1.2e12 / nbytes)))
        run = make_run(reps)
        jax.block_until_ready(run(x))
        t0 = time.time()
        jax.block_until_ready(run(x))
        dt = (time.time() - t0) / reps
        return {"kind": "kernel", "mode": mode, "shape": list(shape), "b": b,
                "ms": round(dt * 1e3, 4), "GBps": round(nbytes / dt / 1e9, 1)}
    if mode in ("w4", "w4x"):
        # device-side generation: the tunnel moves ~6 MB/s h2d, so a
        # host-built lm_head-class tensor costs ~1 min of pure transfer
        from llama_kotlin_tpu.models.synthetic import synthetic_w4_device

        w = synthetic_w4_device(jax.random.PRNGKey(0), n, k,
                                precise=(mode == "w4x"))
    elif mode == "w8":
        from llama_kotlin_tpu.quant.fold import fold_to_w8
        from llama_kotlin_tpu.quant.repack import repack_float

        x0 = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        from llama_kotlin_tpu.quant.formats import GGMLQuantType

        w = fold_to_w8(repack_float(x0, GGMLQuantType.Q6_K))
    else:  # int8 Q8F
        w = synthetic_q8flat(rng, n, k)
    import jax

    w = jax.tree.map(jnp.asarray, w)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)

    def make_run(r):
        # weights as closure constants, NOT jit arguments (see ffn note)
        @jax.jit
        def run(x):
            def body(i, acc):
                # real loop-carried dependence (acc stays ~1e-27, numerically
                # inert) so XLA cannot hoist the matmul out of the loop
                y = qmatmul(x + acc[:, :1], w, compute_dtype=jnp.bfloat16)
                return acc + y[:, :1] * 1e-30
            return jax.lax.fori_loop(0, r, body, jnp.zeros((b, 1), jnp.float32))
        return run

    # warm + estimate, then re-time with enough reps that the block runs
    # multi-second: the axon tunnel costs ~25ms/dispatch, so short blocks
    # are dispatch-dominated garbage (TODO.md measurement warning)
    if os.environ.get("TUNE_DET_REPS", "1") != "0":
        # Deterministic reps by shape: ~2s blocks at HBM-bound speed, and a
        # stable fori_loop bound -> the persistent compile cache hits on
        # every rerun (compiles through the axon tunnel cost ~3min each,
        # the adaptive two-stage estimate would double that and never
        # cache; measured round 3).
        reps = min(100_000, max(200, int(1.2e12 / (n * k))))
        run = make_run(reps)
        jax.block_until_ready(run(x))  # compile+warm
        t0 = time.time()
        jax.block_until_ready(run(x))
        dt = (time.time() - t0) / reps
    else:
        run = make_run(reps)
        r = run(x)
        jax.block_until_ready(r)  # compile+warm
        t0 = time.time()
        jax.block_until_ready(run(x))
        dt = (time.time() - t0) / reps
        target_s = float(os.environ.get("TUNE_TARGET_S", "2.0"))
        reps2 = max(reps, min(100_000, int(target_s / max(dt, 1e-6))))
        if reps2 > reps:
            run = make_run(reps2)
            jax.block_until_ready(run(x))  # warm the new loop bound
            t0 = time.time()
            jax.block_until_ready(run(x))
            dt = (time.time() - t0) / reps2
            reps = reps2

    from llama_kotlin_tpu.quant.qtensor import QTensor

    if isinstance(w, QTensor):
        nbytes = _streamed_bytes(w)
    else:
        nbytes = n * k
    return {"kind": "kernel", "mode": mode, "shape": list(shape), "b": b,
            "ms": round(dt * 1e3, 4), "GBps": round(nbytes / dt / 1e9, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--modes", default="w4,w4x,w8,int8")
    ap.add_argument("--b", default="1",
                    help="comma list of activation batch sizes; 1 = the "
                         "single-stream decode hot path (tg128)")
    ap.add_argument("--e2e", action="store_true",
                    help="also run bench.py presets per mode (spawns "
                         "children that probe the backend — only useful "
                         "when the TPU tunnel is up)")
    ap.add_argument("--trace", default=None,
                    help="capture a jax.profiler device trace of the "
                         "kernel sweep into this directory (per-op ground "
                         "truth; host wall-clock through the tunnel lies)")
    args = ap.parse_args()

    import sys as _sys0
    _sys0.path.insert(0, str(Path(__file__).parent.parent))
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # tunnel compiles cost minutes; pay once

    import jax

    record({"kind": "env", "backend": jax.default_backend(),
            "devices": str(jax.devices())})

    shapes = [(4096, 4096), (14336, 4096), (4096, 14336)]
    if not args.quick:
        shapes.append((16384, 4096))  # lm_head-class (vocab row-sharded tile)
        shapes.append((6144, 4096))   # fused wqkv (llama3-8b GQA)
        shapes.append((28672, 4096))  # fused gate|up
    reps = 50 if args.quick else 200

    import contextlib

    import sys as _sys
    _sys.path.insert(0, str(Path(__file__).parent.parent))
    from llama_kotlin_tpu.utils.profiling import maybe_trace

    with maybe_trace(args.trace):
        for mode in args.modes.split(","):
            for shape in shapes:
                for b in (int(s) for s in args.b.split(",")):
                    try:
                        record(bench_kernel(shape, mode, reps, b=b))
                    except Exception as e:
                        record({"kind": "kernel", "mode": mode, "b": b,
                                "shape": list(shape), "error": repr(e)[:200]})

    # end-to-end decode presets via bench.py child runs
    for mode in ("w4a8", "exact", "int8") if args.e2e else ():
        import subprocess

        try:
            env = dict(os.environ, BENCH_MODE=mode)
            p = subprocess.run(
                [sys.executable, str(Path(__file__).parent.parent / "bench.py"),
                 "--run"], capture_output=True, text=True, timeout=1200, env=env)
            line = next((l for l in reversed(p.stdout.strip().splitlines())
                         if l.startswith("{")), None)
            record({"kind": "e2e", "mode": mode,
                    "result": json.loads(line) if line else None,
                    "rc": p.returncode})
        except Exception as e:
            record({"kind": "e2e", "mode": mode, "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
