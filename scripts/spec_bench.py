"""Speculative + prompt-lookup decoding measurement (VERDICT r3 #4).

Random weights produce meaningless accept rates, so acceptance realism
comes from a TRAINED byte-level target/draft pair (same harness as
tools/quant_quality.py): the draft is a genuinely smaller model trained on
the same corpus, giving real draft/target agreement dynamics like the
reference's speculative example (reference examples/speculative/
speculative.cpp — tinyllama drafting for a 7B target).

Phases:
  --train        train target (20M) + draft (0.6M) pair, save GGUFs under
                 .cache/spec/ (one-time, CPU-friendly)
  (default)      load the pair, run plain vs speculative (chain + tree) vs
                 prompt-lookup generation, report accept rate + end-to-end
                 speedup on the CURRENT backend (TPU when the tunnel is up)
  --components   synthetic 8B-class target + 1.1B-class draft: measure the
                 verify-batch latency t_T(K) and draft-step latency t_D on
                 device, and report the implied speedup
                 K_acc(alpha)/ (K*t_D + t_T(K)) at 8B scale for the accept
                 rate measured on the trained pair.

Usage:
  python scripts/spec_bench.py --train
  timeout 1800 python scripts/spec_bench.py [--n-draft 5] [--n-predict 128]
  timeout 1800 python scripts/spec_bench.py --components
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = Path(__file__).resolve().parent.parent / ".cache" / "spec"
TARGET = CACHE / "target_f32.gguf"
DRAFT = CACHE / "draft_f32.gguf"


def train_pair(steps: int = 1200) -> None:
    from llama_kotlin_tpu.models.config import ModelConfig
    from llama_kotlin_tpu.tools.quant_quality import default_corpus
    from llama_kotlin_tpu.tools.train import save_checkpoint_gguf, train

    CACHE.mkdir(parents=True, exist_ok=True)
    text = default_corpus(Path(__file__).resolve().parent.parent, cap=1_200_000)
    data = np.frombuffer(text, np.uint8).astype(np.int32)

    for name, path, (e, l, h, f) in (
            ("target", TARGET, (512, 6, 8, 1536)),
            ("draft", DRAFT, (128, 2, 4, 384))):
        cfg = ModelConfig(arch="llama", vocab_size=256, n_embd=e, n_layer=l,
                          n_head=h, n_head_kv=h, n_ff=f, n_ctx_train=256)
        t0 = time.time()
        params, losses = train(
            cfg, data, steps=steps, batch=8, seq_len=256, lr=1e-3, seed=0,
            log=lambda i, L: sys.stderr.write(f"{name} step {i}: {L:.3f}\n")
            if True else None)
        save_checkpoint_gguf(params, cfg, path)
        print(json.dumps({"trained": name, "steps": steps,
                          "final_loss": round(losses[-1], 4),
                          "secs": round(time.time() - t0, 1)}), flush=True)


def run_trained(n_draft: int, n_predict: int, prompt_len: int = 256) -> None:
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.runtime.speculative import (
        NgramCache, lookup_generate, speculative_generate,
        speculative_generate_tree)
    from llama_kotlin_tpu.tools.quant_quality import default_corpus

    def ctx_of(path, cells=1024):
        cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
        f.close()
        return LlamaContext(cfg, params, n_cells=cells,
                            compute_dtype=jnp.float32)

    tgt, dft = ctx_of(TARGET), ctx_of(DRAFT)
    text = default_corpus(Path(__file__).resolve().parent.parent,
                          cap=1_200_000)
    prompt = np.frombuffer(text[-prompt_len:], np.uint8).astype(np.int32)

    # plain greedy decode baseline (step-wise context path, same as spec)
    def plain():
        tgt.clear()
        assert tgt.decode(Batch.single(prompt)) == 0
        out = [int(np.argmax(tgt.get_logits()[0]))]
        for i in range(n_predict - 1):
            rc = tgt.decode(Batch(tokens=[out[-1]],
                                  pos=[len(prompt) + i], seq_id=[0],
                                  output=[True]))
            assert rc == 0
            out.append(int(np.argmax(tgt.get_logits()[0])))
        return out

    plain()  # compile
    t0 = time.time()
    base_out = plain()
    t_plain = time.time() - t0

    # plain decode via the PRODUCTION on-device loop (one dispatch per
    # chunk) — the honest baseline; per-call plain() above measures the
    # host-stepped path whose per-call dispatch dominates small models
    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop
    import jax.numpy as jnp

    def plain_loop():
        tgt.clear()
        assert tgt.decode(Batch.single(prompt)) == 0
        tok = int(np.argmax(tgt.get_logits()[0]))
        n = n_predict - 1
        slots = tgt.meta.find_slots(n)
        pos = np.arange(len(prompt), len(prompt) + n, dtype=np.int32)
        tgt.meta.commit(slots, pos, np.zeros(n, np.int32))
        out, cache, *_ = generate_loop(
            tgt.params, tgt.cfg, tgt.cache, *tgt.meta.device_view(),
            jnp.full((1,), tok, jnp.int32),
            jnp.full((1,), len(prompt), jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.asarray(slots.reshape(n, 1)),
            n, SampleParams(), tgt.compute_dtype)
        tgt.cache = cache
        return [tok] + [int(t) for t in np.asarray(out)[:, 0]]

    plain_loop()  # compile
    t0 = time.time()
    loop_out = plain_loop()
    t_plain_loop = time.time() - t0
    assert loop_out == base_out, "device loop != host greedy"

    speculative_generate(tgt, dft, prompt, 8, n_draft=n_draft)  # compile
    t0 = time.time()
    spec_out, st = speculative_generate(tgt, dft, prompt, n_predict,
                                        n_draft=n_draft)
    t_spec = time.time() - t0
    assert spec_out == base_out[:len(spec_out)], "speculative != greedy"

    # fully on-device speculative loop (one dispatch for the whole
    # generation — runtime/speculative.speculative_generate_device)
    from llama_kotlin_tpu.runtime.speculative import \
        speculative_generate_device

    speculative_generate_device(tgt, dft, prompt, 8, n_draft=n_draft)
    t0 = time.time()
    dev_out, st_dev = speculative_generate_device(tgt, dft, prompt,
                                                  n_predict,
                                                  n_draft=n_draft)
    t_spec_dev = time.time() - t0
    assert dev_out == base_out[:len(dev_out)], "device spec != greedy"

    t0 = time.time()
    tree_out, st_tree = speculative_generate_tree(tgt, dft, prompt,
                                                  n_predict, n_draft=n_draft)
    t_tree = time.time() - t0

    # prompt-lookup decoding on a self-repetitive prompt (ngram drafting)
    rep = np.concatenate([prompt[-64:]] * 3).astype(np.int32)
    lookup_generate(tgt, rep, 8)  # compile path
    t0 = time.time()
    lk_out, st_lk = lookup_generate(tgt, rep, n_predict)
    t_lookup = time.time() - t0
    tgt.clear()
    assert tgt.decode(Batch.single(rep)) == 0
    out0 = [int(np.argmax(tgt.get_logits()[0]))]
    t0 = time.time()
    for i in range(n_predict - 1):
        tgt.decode(Batch(tokens=[out0[-1]], pos=[len(rep) + i], seq_id=[0],
                         output=[True]))
        out0.append(int(np.argmax(tgt.get_logits()[0])))
    t_plain_rep = time.time() - t0

    import jax
    print(json.dumps({
        "kind": "trained_pair", "backend": jax.default_backend(),
        "n_draft": n_draft, "n_predict": n_predict,
        "plain_tps": round(n_predict / t_plain, 2),
        "plain_loop_tps": round(n_predict / t_plain_loop, 2),
        "spec_tps": round(len(spec_out) / t_spec, 2),
        "spec_accept_rate": round(st.accept_rate, 4),
        "spec_target_calls": st.n_target_calls,
        "spec_speedup": round(t_plain / t_spec * len(spec_out) / n_predict, 3),
        "spec_device_tps": round(len(dev_out) / t_spec_dev, 2),
        "spec_device_accept_rate": round(st_dev.accept_rate, 4),
        "spec_device_vs_loop": round(
            (len(dev_out) / t_spec_dev) / (n_predict / t_plain_loop), 3),
        "tree_tps": round(len(tree_out) / t_tree, 2),
        "tree_accept_rate": round(st_tree.accept_rate, 4),
        "tree_speedup": round(t_plain / t_tree * len(tree_out) / n_predict, 3),
        "lookup_tps": round(len(lk_out) / t_lookup, 2),
        "lookup_accept_rate": round(st_lk.accept_rate, 4),
        "lookup_speedup": round(
            (len(lk_out) / t_lookup) / ((n_predict - 1) / t_plain_rep), 3),
    }), flush=True)


def run_components(alpha: float, n_draft: int) -> None:
    """8B-class implied speedup: measure t_T(K) (target verify of a K+1
    batch) and t_D (draft single step) on device with synthetic W4 weights,
    then E[tokens/verify] / (K*t_D + t_T) vs 1/t_T(1)."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.synthetic import (preset_config,
                                                   synthetic_params_device)
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    def build(preset):
        cfg = preset_config(preset)
        params = synthetic_params_device(cfg, GGMLQuantType.Q4_K,
                                         compute_dtype=jnp.bfloat16,
                                         fast_w4a8=True, fuse=True)
        jax.block_until_ready(jax.tree.leaves(params))
        return LlamaContext(cfg, params, n_cells=1024,
                            compute_dtype=jnp.bfloat16,
                            buckets=(8, 16, 32, 64, 128, 256, 512))

    rng = np.random.default_rng(0)

    def step_time(ctx, nt, steps=96):
        """Per-step device time at nt parallel rows via ONE on-device
        generate_loop dispatch (host wall-clock of per-call ctx.decode
        through the axon tunnel is ~25-35 ms of dispatch — it swamped the
        round-5 first measurement; a batch-nt loop step runs the same
        matmul rows as a K+1 verify batch)."""
        import jax.numpy as jnp

        from llama_kotlin_tpu.runtime.generate import (SampleParams,
                                                       generate_loop)

        ctx.clear()
        prompt = rng.integers(0, ctx.cfg.vocab_size, 64).astype(np.int32)
        assert ctx.decode(Batch.single(prompt)) == 0
        tok = int(np.argmax(ctx.get_logits()[-1]))
        for s in range(1, nt):
            ctx.seq_cp(0, s)

        def run():
            slots = ctx.meta.find_slots(steps * nt)
            pos = np.repeat(np.arange(64, 64 + steps, dtype=np.int32), nt)
            seqs = np.tile(np.arange(nt, dtype=np.int32), steps)
            ctx.meta.commit(slots, pos, seqs)
            out, cache, *_ = generate_loop(
                ctx.params, ctx.cfg, ctx.cache, *ctx.meta.device_view(512),
                jnp.full((nt,), tok, jnp.int32),
                jnp.full((nt,), 64, jnp.int32),
                jnp.arange(nt, dtype=jnp.int32),
                jnp.asarray(slots.reshape(steps, nt)),
                steps, SampleParams(), ctx.compute_dtype)
            ctx.cache = cache
            import jax

            jax.block_until_ready(out)
            ctx.meta.pos[slots] = -1
            ctx.meta.seq[slots] = 0
            ctx.meta._next = int(slots[0])

        run()  # compile
        best = None
        for _ in range(3):
            t0 = time.time()
            run()
            dt = (time.time() - t0) / steps
            best = dt if best is None else min(best, dt)
        return best

    tgt = build("llama3-8b")
    t_t1 = step_time(tgt, 1)
    t_tk = step_time(tgt, n_draft + 1)
    del tgt
    dft = build("tinyllama-1.1b")
    t_d = step_time(dft, 1)

    # expected accepted tokens per verify for per-token accept prob alpha
    # (geometric chain, + 1 correction token): sum_{i=0..K-1} alpha^i terms
    K = n_draft
    e_tokens = sum(alpha ** i for i in range(1, K + 1)) + 1
    t_spec = K * t_d + t_tk
    implied = (e_tokens / t_spec) / (1.0 / t_t1)
    print(json.dumps({
        "kind": "components_8b", "backend": jax.default_backend(),
        "t_target_1_ms": round(t_t1 * 1e3, 2),
        "t_target_K1_ms": round(t_tk * 1e3, 2),
        "t_draft_1_ms": round(t_d * 1e3, 2),
        "alpha": alpha, "n_draft": K,
        "e_tokens_per_verify": round(e_tokens, 3),
        "implied_speedup_8b": round(implied, 3),
    }), flush=True)


def main():
    from llama_kotlin_tpu.utils.profiling import default_xla_opts

    default_xla_opts()  # tuned TPU compiler options (one site: profiling.py)
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--components", action="store_true")
    ap.add_argument("--alpha", type=float, default=None,
                    help="accept rate for --components (default: from the "
                         "last trained-pair run)")
    ap.add_argument("--n-draft", type=int, default=5)
    ap.add_argument("--n-predict", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu or args.train:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.train:
        train_pair(args.steps)
        return
    if args.components:
        run_components(args.alpha if args.alpha is not None else 0.7,
                       args.n_draft)
        return
    if not TARGET.exists():
        sys.exit("no trained pair; run --train first")
    run_trained(args.n_draft, args.n_predict)


if __name__ == "__main__":
    main()
