"""Quantization-quality ladder: train -> quantize -> ΔPPL sweep.

The BASELINE.md parity target is the reference's WikiText-2 ΔPPL table
(examples/perplexity/README.md:49-70: Q8_0 +0.003 < Q6_K +0.022 < Q5_K_M
+0.057 < Q4_K_M +0.175 < Q4_0 +0.469 < Q3_K_M +0.657 < Q2_K +3.52 on
Llama-3-8B).  With zero egress there is no 8B GGUF or WikiText on disk,
so this tool produces the closest obtainable end-to-end evidence on REAL
learned weights: it trains a byte-level llama on local text (default: the
framework's own source code — real natural-ish text), writes an f32 GGUF,
requantizes it across the ladder with tools/quantize.py, and measures
held-out perplexity per rung with tools/perplexity.py's scorer — the
same load→decode→score path a real model takes.

The check is the ΔPPL ORDERING and scale, not absolute values (a tiny
model's quantization sensitivity differs from 8B): monotone Δ down the
ladder, near-zero at Q8_0.

Usage:
    python -m llama_kotlin_tpu.tools.quant_quality --steps 400 \
        [--text FILE] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

LADDER = ["Q8_0", "Q6_K", "Q5_K_M", "Q4_K_M", "Q4_0", "Q3_K_M", "Q2_K"]


def default_corpus(root: Path, cap: int = 400_000,
                   extra_roots: tuple = (), suffixes=(".py",)) -> bytes:
    """Concatenate local source text (real local text; zero egress leaves
    no WikiText on disk).  extra_roots lets large runs add more text
    volume (e.g. other local source trees as TRAINING DATA only)."""
    buf = []
    total = 0
    roots = (root,) + tuple(Path(r) for r in extra_roots)
    for r in roots:
        for suf in suffixes:
            for p in sorted(r.rglob(f"*{suf}")):
                try:
                    b = p.read_bytes()
                except OSError:
                    continue
                buf.append(b)
                total += len(b)
                if total >= cap:
                    return b"".join(buf)[:cap]
    return b"".join(buf)[:cap]


def run(steps: int, text: bytes, out_dir: Path, n_ctx: int = 128,
        ladder=None, seed: int = 0, n_embd: int = 256, n_layer: int = 4,
        n_head: int = 4, n_ff: int = 512, batch: int = 8,
        with_kld: bool = True, keep_files: bool = False,
        eval_tokens: int = 65536, use_imatrix: bool = False,
        reuse_f32: bool = False, train_only: bool = False) -> dict:
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.config import ModelConfig
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tools.perplexity import compute_perplexity
    from llama_kotlin_tpu.tools.quantize import quantize_model
    from llama_kotlin_tpu.tools.train import save_checkpoint_gguf, train

    out_dir.mkdir(parents=True, exist_ok=True)
    data = np.frombuffer(text, np.uint8).astype(np.int32)
    split = int(len(data) * 0.9)
    train_toks, held = data[:split], data[split:]
    held = held[:max(eval_tokens, n_ctx)]  # bound ladder-scoring cost

    # dims are 256-multiples so the K-quant superblocks actually engage
    # (k % 256 != 0 rows fall back to f32 in the quantize tool)
    cfg = ModelConfig(arch="llama", vocab_size=256, n_embd=n_embd,
                      n_layer=n_layer, n_head=n_head, n_head_kv=n_head,
                      n_ff=n_ff, n_ctx_train=n_ctx)
    n_params = (n_layer * (4 * n_embd * n_embd + 3 * n_ff * n_embd)
                + 2 * 256 * n_embd)
    f32_path = out_dir / "f32.gguf"
    losses = [float("nan")]
    if reuse_f32 and f32_path.exists():
        # train/score split: the 100M-class run trains on the TPU (minutes)
        # and scores the ladder on CPU later, reusing this checkpoint
        sys.stderr.write(f"reusing {f32_path}\n")
    else:
        sys.stderr.write(f"training ~{n_params/1e6:.1f}M-param model, "
                         f"{steps} steps x {batch}x{n_ctx} tokens\n")
        params, losses = train(
            cfg, train_toks, steps=steps, batch=batch, seq_len=n_ctx, lr=1e-3,
            seed=seed,
            log=lambda i, l: sys.stderr.write(f"step {i}: loss {l:.3f}\n"))
        save_checkpoint_gguf(params, cfg, f32_path)
    if train_only:
        return {"f32": {"path": str(f32_path),
                        "final_train_loss": round(losses[-1], 4),
                        "n_params": n_params}}

    def score(path):
        """(ppl, per-chunk logits) through the standard serving path."""
        cfg2, params2, f = load_gguf_model(path, compute_dtype=jnp.float32)
        f.close()
        ctx = LlamaContext(cfg2, params2, n_cells=n_ctx,
                           compute_dtype=jnp.float32)
        ppl_val, _nll, _n, logits = compute_perplexity(
            ctx, held, n_ctx=n_ctx, collect_logits=with_kld)
        return float(ppl_val), logits

    base, base_logits = score(f32_path)
    imatrix = None
    if use_imatrix:
        # the reference's imatrix flow end-to-end: calibrate on the TRAIN
        # split through the serving forward, weight the quantizers with it
        # (examples/imatrix -> quantize --imatrix)
        from llama_kotlin_tpu.tools.imatrix import collect_imatrix

        cfg_l, params_l, f = load_gguf_model(f32_path,
                                             compute_dtype=jnp.float32)
        f.close()
        imatrix = collect_imatrix(cfg_l, params_l,
                                  train_toks[:64 * n_ctx], n_ctx=n_ctx,
                                  compute_dtype=jnp.float32)
        sys.stderr.write(f"imatrix: {len(imatrix)} entries collected\n")
    rows = {"f32": {"ppl": round(base, 4), "delta": 0.0,
                    "final_train_loss": round(losses[-1], 4),
                    "n_params": n_params}}
    for ft in (ladder or LADDER):
        qp = out_dir / f"{ft.lower()}.gguf"
        quantize_model(str(f32_path), str(qp), ft, imatrix=imatrix)
        p, logits = score(qp)
        rows[ft] = {"ppl": round(p, 4), "delta": round(p - base, 4)}
        if with_kld:
            # reference KLD method (examples/perplexity/README.md:77-114):
            # mean KL(f32 || quant) per scored token through the SERVING
            # path, plus top-1 agreement
            from llama_kotlin_tpu.tools.perplexity import kl_divergence

            kld, top1 = kl_divergence(base_logits, logits)
            rows[ft]["kld"] = round(kld, 6)
            rows[ft]["top1_agree"] = round(top1, 4)
        if not keep_files:
            qp.unlink(missing_ok=True)
        sys.stderr.write(f"{ft}: ppl {p:.4f} (Δ {p - base:+.4f}) "
                         + (f"kld {rows[ft]['kld']:.6f} "
                            f"top1 {rows[ft]['top1_agree']:.3f}\n"
                            if with_kld else "\n"))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description="quantization ΔPPL ladder")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--text", help="training/eval text file (default: this "
                                   "package's own sources)")
    ap.add_argument("--out-dir", default="/tmp/quant_quality")
    ap.add_argument("--n-ctx", type=int, default=128)
    ap.add_argument("--ladder", default=",".join(LADDER))
    ap.add_argument("--n-embd", type=int, default=256)
    ap.add_argument("--n-layer", type=int, default=4)
    ap.add_argument("--n-head", type=int, default=4)
    ap.add_argument("--n-ff", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--corpus-cap", type=int, default=400_000)
    ap.add_argument("--corpus-root", action="append", default=[],
                    help="extra source trees to add as training text")
    ap.add_argument("--corpus-suffixes", default=".py",
                    help="comma-separated suffixes for corpus files")
    ap.add_argument("--no-kld", action="store_true")
    ap.add_argument("--imatrix", action="store_true",
                    help="collect an importance matrix on the train split "
                         "and weight the quantizers with it")
    ap.add_argument("--train-only", action="store_true",
                    help="train + save f32.gguf and exit (run on TPU)")
    ap.add_argument("--reuse-f32", action="store_true",
                    help="reuse out-dir/f32.gguf if present (score on CPU)")
    args = ap.parse_args(argv)
    if args.text:
        text = Path(args.text).read_bytes()
    else:
        text = default_corpus(Path(__file__).resolve().parents[1],
                              cap=args.corpus_cap,
                              extra_roots=tuple(args.corpus_root),
                              suffixes=tuple(args.corpus_suffixes.split(",")))
    rows = run(args.steps, text, Path(args.out_dir), n_ctx=args.n_ctx,
               ladder=args.ladder.split(","), n_embd=args.n_embd,
               n_layer=args.n_layer, n_head=args.n_head, n_ff=args.n_ff,
               batch=args.batch, with_kld=not args.no_kld,
               use_imatrix=args.imatrix, reuse_f32=args.reuse_f32,
               train_only=args.train_only)
    print(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    main()
