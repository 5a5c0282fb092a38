"""Round benchmark: single-chip decode throughput on the flagship config.

Builds a synthetic llama3-8B-shaped W4-served model (random codes/scales —
the memory traffic and compute profile match real weights) and measures
single-sequence decode tokens/sec (tg) — "tokens/sec/chip at 8B Q4_K", the
north-star metric from BASELINE.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline divides by the closest published reference figure: llama.cpp
CUDA 7B Q4_0 tg128 = 132.19 t/s (reference examples/llama-bench/README.md:77)
— the reference repo publishes no TPU numbers, and its A100 has 1555 GB/s
of HBM to v5e's 819, so holding the 7B bar at 8B scale is strictly harder
than the reference's own headline.  BENCH_PRESET=llama2-7b measures that
exact 7B Q4_0 config (our W4 sym layout serves it at Q4_0's own 4.5
bits/weight wire density).  The line also carries w_gbps — the effective
weight-stream bandwidth (tps x weight bytes/token) — so progress toward
the 819 GB/s speed-of-light is tracked per round.

Robustness design (round-1 postmortem: the axon PJRT plugin can HANG
indefinitely at backend init when the TPU tunnel is down, and the env var
JAX_PLATFORMS=cpu does NOT bypass it — the sitecustomize pins the axon
platform; only jax.config.update("jax_platforms", "cpu") before backend
init does):
  * every attempt runs in a subprocess with a hard wall-clock timeout,
    killed by process group on expiry;
  * a cheap backend probe (180 s) runs first; if the TPU backend cannot
    init, we skip straight to the CPU fallback instead of wasting the
    budget;
  * the final fallback forces the CPU backend *in-process config*, runs a
    tiny preset, and tags the line "backend": "cpu" so the driver can tell
    degraded from dead;
  * the parent ALWAYS prints exactly one parsed JSON line.

Env overrides: BENCH_PRESET (default llama3-8b), BENCH_STEPS, BENCH_PREFILL,
BENCH_MODE (int8|w4a8|exact|dequant), BENCH_BATCH, BENCH_LMHEAD=q6k (real
Q4_K_M profile: q6_K lm_head via the W8 kernel), BENCH_FORCE_CPU=1.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_TPS = 132.19


def _force_cpu() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(preset: str, steps: int, prefill: int, batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                   synthetic_params_device)
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop

    t0 = time.time()
    cfg = preset_config(preset)
    # default = W4A8 fast mode (4-bit-resident weights, int8 MXU dots — the
    # TPU analogue of the reference's vec_dot_q4_K_q8_K hot loop).
    # BENCH_MODE=int8 selects the W8A8 flat path; BENCH_MODE=exact selects
    # W4X (exact f32 weight scales + dual-plane ~16-bit activations — the
    # highest-fidelity mode, tighter than bf16 dequant on both axes);
    # BENCH_MODE=dequant measures the bit-exact per-32-group dequant
    # kernels (VPU-bound, slower; kept for parity testing).
    mode = os.environ.get("BENCH_MODE", "w4a8")
    # weights are generated ON the device (synthetic_params_device): the
    # axon tunnel moves ~6 MB/s h2d (measured round 3), so a host-built 8B
    # model would cost ~13 min of pure transfer before the bench starts
    # weight profile mirrors the reference headline configs: llama2-7b is
    # the Q4_0 number (symmetric — our W4 sym layout serves it at Q4_0's
    # own 4.5 bits/weight wire density); other presets default to Q4_K
    qtype = {"llama2-7b": GGMLQuantType.Q4_0}.get(preset, GGMLQuantType.Q4_K)
    qtype = getattr(GGMLQuantType,
                    os.environ.get("BENCH_QTYPE", qtype.name).upper())
    params = synthetic_params_device(
        cfg, qtype, compute_dtype=jnp.bfloat16,
        fast_int8=(mode == "int8"),
        fast_w4a8={"w4a8": True, "exact": "w4x"}.get(mode, False),
        fuse=os.environ.get("BENCH_FUSE", "1") == "1")
    jax.block_until_ready(jax.tree.leaves(params))
    if os.environ.get("BENCH_LMHEAD", "") == "q6k" and "output" in params:
        # real Q4_K_M profile: q6_K lm_head served by the exact W8
        # block-diagonal kernel (ggml_vec_dot_q6_K_q8_K analogue)
        import jax as _jax

        from llama_kotlin_tpu.quant.fold import fold_to_w8
        from llama_kotlin_tpu.quant.repack import repack_float

        rng0 = np.random.default_rng(1)
        lm = (rng0.standard_normal((cfg.vocab_size, cfg.n_embd)) * 0.02
              ).astype(np.float32)
        params["output"] = _jax.tree.map(
            jnp.asarray,
            fold_to_w8(repack_float(lm, GGMLQuantType.Q6_K),
                       precise=(mode == "exact")))
    build_s = time.time() - t0

    unrolled = os.environ.get("BENCH_UNROLLED", "1") == "1"
    # BENCH_KV=q8_0|q4_0 benches the quantized-KV serving modes (-ctk);
    # default bf16 matches the reference llama-bench's f16-KV headline
    kv = os.environ.get("BENCH_KV", "")
    # BENCH_PP accepts a comma list (pp matrix, reference llama-bench
    # pp512/pp1024/pp4096 rows); cache sized for the largest prompt
    pp_sizes = [int(v) for v in
                str(os.environ.get("BENCH_PP", "1024")).split(",") if v]
    # exact fit like the original n_cells=1024 (pp prompts decode on a
    # CLEARED context, so cells == max(pp, decode span) suffices; keep
    # 1024 for the default so the headline shape is unchanged)
    n_cells = max(1024, max(pp_sizes) if pp_sizes else 0)
    ctx = LlamaContext(cfg, params, n_cells=n_cells,
                       compute_dtype=jnp.bfloat16,
                       buckets=(8, 16, 32, 64, 128, 256, 512),
                       prefer_unrolled=unrolled, kv_quant=kv or False)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, prefill).astype(np.int32)

    t0 = time.time()
    rc = ctx.decode(Batch.single(prompt))
    assert rc == 0
    tok = int(np.argmax(ctx.get_logits()[0]))
    prefill_s = time.time() - t0  # includes compile (cold TTFT)

    # warm TTFT: clear (resets the cell allocator ring, so the SAME cells
    # and visibility bucket are reused -> no retrace) and redo the prefill
    ctx.clear()
    t0 = time.time()
    rc = ctx.decode(Batch.single(prompt))
    assert rc == 0
    tok = int(np.argmax(ctx.get_logits()[0]))
    ttft_warm_s = time.time() - t0

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
    # several warm reps, best-of (the reference llama-bench also runs -r
    # repetitions; host dispatch through the axon tunnel adds tens of ms
    # of run-to-run jitter per generate_loop call)
    reps = int(os.environ.get("BENCH_REPS", "3"))
    rep_tps = []
    for _ in range(reps):
        t0 = time.time()
        run_loop(steps)
        rep_tps.append(steps * batch / (time.time() - t0))
    tps = max(rep_tps)

    # effective weight-stream bandwidth: every weight byte except the
    # embedding table (row-gathered) is read once per decode step
    from llama_kotlin_tpu.quant.qtensor import QTensor

    w_bytes = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if path and getattr(path[0], "key", None) == "tok_embd":
            continue
        if isinstance(leaf, QTensor):
            if leaf.aux:
                # fast-mode serving streams codes + the transposed aux
                # planes ONLY; g_scale/g_min stay resident for the prefill/
                # dequant paths but never cross HBM on the decode loop —
                # counting them inflated w_gbps ~17% (round-4 finding)
                w_bytes += leaf.codes.size * leaf.codes.dtype.itemsize
                # q8_* shadow planes (fold.attach_q8) serve only ubatches
                # above LKTPU_W4_BMAX — the b=1 decode loop never reads
                # them (same accounting rule as g_scale/g_min)
                w_bytes += sum(a.size * a.dtype.itemsize
                               for k2, a in leaf.aux.items()
                               if getattr(a, "ndim", 0) >= 2
                               and not k2.startswith("q8_"))
            else:
                w_bytes += leaf.nbytes()
        elif hasattr(leaf, "nbytes"):
            w_bytes += leaf.nbytes
    w_gbps = tps * w_bytes / 1e9

    # prefill throughput (reference llama-bench's pp metric): warm-timed
    # full-prompt decode on a cleared context, one row per BENCH_PP size
    pp_matrix = {}
    for pp in pp_sizes:
        if pp <= 0:
            continue
        prompt_pp = rng.integers(0, cfg.vocab_size, pp).astype(np.int32)
        try:
            for _ in range(2):  # first pass compiles the large buckets
                ctx.clear()
                t0 = time.time()
                assert ctx.decode(Batch.single(prompt_pp)) == 0
                np.asarray(ctx.get_logits()[0, :8])  # force completion
                pp_dt = time.time() - t0
            pp_matrix[pp] = round(pp / pp_dt, 1)
        except Exception:
            pass  # cache too small for the pp prompt etc.
    # canonical pp_tps is the pp1024 row (the reference's headline pp
    # metric); other sizes live only in detail.pp_matrix — reporting a
    # different size under the same key would mislabel BENCH_r0x.json
    pp_tps = pp_matrix.get(1024) if 1024 in pp_matrix else None
    return {
        "metric": f"decode_tps_{preset}_{mode}"
        + (f"_kv{kv}" if kv else "") + (f"_b{batch}" if batch > 1 else ""),
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TPS, 3),
        # p50-class warm TTFT + prefill throughput (BASELINE.json north
        # stars) surfaced at top level so the driver records them per round
        "ttft_ms": round(ttft_warm_s * 1e3, 1),
        "pp_tps": pp_tps,
        # effective weight-stream GB/s (vs v5e speed-of-light 819)
        "w_gbps": round(w_gbps, 1),
        "w_bytes_per_tok": w_bytes,
        "detail": {
            "backend": jax.default_backend(),
            "build_s": round(build_s, 1),
            "prefill_s": round(prefill_s, 1),
            # TTFT north-star (BASELINE.json): warm prefill-to-first-logit
            # latency (compile-cached); prefill_s above is the cold path
            "ttft_ms": round(ttft_warm_s * 1e3, 1),
            "loop_compile_s": round(compile_s, 1),
            "prefill_tokens": prefill,
            "decode_steps": steps,
            "rep_tps": [round(r, 2) for r in rep_tps],
            **({"pp_matrix": pp_matrix} if len(pp_matrix) > 1 else {}),
        },
    }


def child_main() -> None:
    """Run one bench attempt in-process and print its JSON line."""
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        _force_cpu()
    else:
        # round-5 bench-harness A/B winner (136.35 vs 132.49 t/s at the old
        # bw=2.0; the aggressive bandwidth estimate makes XLA's latency-
        # hiding scheduler pack weight prefetches tighter)
        from llama_kotlin_tpu.utils.profiling import default_xla_opts

        default_xla_opts()
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # tunnel compiles cost minutes each; pay once
    preset = os.environ.get("BENCH_PRESET", "llama3-8b")
    steps = int(os.environ.get("BENCH_STEPS", "128"))  # tg128 semantics
    prefill = int(os.environ.get("BENCH_PREFILL", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    result = run(preset, steps, prefill, batch)
    print(json.dumps(result), flush=True)


def probe_main() -> None:
    """Cheap backend-liveness probe: init + one tiny device computation."""
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((128, 128), jnp.bfloat16))
    jax.block_until_ready(x)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)


def _run_child(argv: list[str], env_extra: dict, timeout_s: float) -> tuple[dict | None, str]:
    """Run a child bench process; return (parsed-last-json-line, err-tail)."""
    env = dict(os.environ)
    env.update(env_extra)
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *argv],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, start_new_session=True, text=True,
        )
        try:
            out, err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            # kill the whole process group (the exact pgid we created)
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait(timeout=30)
            return None, f"timeout after {timeout_s:.0f}s"
    except Exception as e:  # pragma: no cover - spawn failure
        return None, f"spawn failed: {e!r}"
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), ""
            except json.JSONDecodeError:
                continue
    tail = (err or out or "").strip().splitlines()[-3:]
    return None, f"rc={proc.returncode}: " + " | ".join(tail)


def main() -> None:
    errors: list[str] = []

    # 1. probe the default (TPU/axon) backend with a short timeout
    probe, perr = _run_child(["--probe"], {}, timeout_s=180)
    tpu_alive = probe is not None
    if not tpu_alive:
        errors.append(f"probe: {perr}")

    result: dict | None = None
    if tpu_alive:
        # 2. full attempt on the TPU backend (compile can take minutes;
        # through the axon tunnel a COLD-cache compile of every decode
        # bucket can take tens of minutes — the persistent compile cache
        # makes reruns fast, but give the first attempt room)
        t_attempt = float(os.environ.get("BENCH_TPU_TIMEOUT", "2400"))
        result, aerr = _run_child(["--run"], {}, timeout_s=t_attempt)
        if result is None:
            errors.append(f"tpu attempt: {aerr}")
            # 3. one retry (tunnel flakes are transient)
            result, aerr = _run_child(["--run"], {}, timeout_s=600)
            if result is None:
                errors.append(f"tpu retry: {aerr}")
        if result is None and os.environ.get("BENCH_MODE", "w4a8") != "int8":
            # 3b. kernel-mode fallback: the W4 block-diagonal kernels are
            # newer than the device-proven W8A8 int8 path — if the default
            # mode can't compile/run on the chip, still record a REAL TPU
            # number on the proven mode (tagged) before degrading to CPU
            result, aerr = _run_child(["--run"], {"BENCH_MODE": "int8"},
                                      timeout_s=900)
            if result is not None:
                result["mode_fallback"] = "int8"
            else:
                errors.append(f"tpu int8 fallback: {aerr}")

    if result is None:
        # 4. last resort: explicitly-tagged CPU line on a tiny preset
        env = {"BENCH_FORCE_CPU": "1",
               "BENCH_PRESET": os.environ.get("BENCH_CPU_PRESET", "tinyllama-1.1b"),
               "BENCH_STEPS": "16", "BENCH_PREFILL": "16"}
        result, cerr = _run_child(["--run"], env, timeout_s=600)
        if result is not None:
            result["backend"] = "cpu"
            result["degraded"] = True
        else:
            errors.append(f"cpu fallback: {cerr}")
            result = {"metric": "decode_tps", "value": 0.0, "unit": "tokens/s",
                      "vs_baseline": 0.0}
    if errors:
        result.setdefault("errors", errors)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if "--run" in sys.argv:
        child_main()
    elif "--probe" in sys.argv:
        probe_main()
    else:
        main()
