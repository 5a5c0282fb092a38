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


def default_corpus(root: Path, cap: int = 400_000) -> bytes:
    """Concatenate the framework's own .py sources (real local text)."""
    buf = []
    total = 0
    for p in sorted(root.rglob("*.py")):
        b = p.read_bytes()
        buf.append(b)
        total += len(b)
        if total >= cap:
            break
    return b"".join(buf)[:cap]


def run(steps: int, text: bytes, out_dir: Path, n_ctx: int = 128,
        ladder=None, seed: int = 0) -> dict:
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

    # dims are 256-multiples so the K-quant superblocks actually engage
    # (k % 256 != 0 rows fall back to f32 in the quantize tool)
    cfg = ModelConfig(arch="llama", vocab_size=256, n_embd=256, n_layer=4,
                      n_head=4, n_head_kv=4, n_ff=512, n_ctx_train=n_ctx)
    params, losses = train(
        cfg, train_toks, steps=steps, batch=8, seq_len=n_ctx, lr=1e-3,
        seed=seed,
        log=lambda i, l: sys.stderr.write(f"step {i}: loss {l:.3f}\n"))
    f32_path = out_dir / "f32.gguf"
    save_checkpoint_gguf(params, cfg, f32_path)

    def ppl(path) -> float:
        cfg2, params2, f = load_gguf_model(path, compute_dtype=jnp.float32)
        f.close()
        ctx = LlamaContext(cfg2, params2, n_cells=n_ctx,
                           compute_dtype=jnp.float32)
        ppl_val, _nll, _n = compute_perplexity(ctx, held, n_ctx=n_ctx)[:3]
        return float(ppl_val)

    base = ppl(f32_path)
    rows = {"f32": {"ppl": round(base, 4), "delta": 0.0,
                    "final_train_loss": round(losses[-1], 4)}}
    for ft in (ladder or LADDER):
        qp = out_dir / f"{ft.lower()}.gguf"
        quantize_model(str(f32_path), str(qp), ft)
        p = ppl(qp)
        rows[ft] = {"ppl": round(p, 4), "delta": round(p - base, 4)}
        sys.stderr.write(f"{ft}: ppl {p:.4f} (Δ {p - base:+.4f})\n")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description="quantization ΔPPL ladder")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--text", help="training/eval text file (default: this "
                                   "package's own sources)")
    ap.add_argument("--out-dir", default="/tmp/quant_quality")
    ap.add_argument("--n-ctx", type=int, default=128)
    ap.add_argument("--ladder", default=",".join(LADDER))
    args = ap.parse_args(argv)
    if args.text:
        text = Path(args.text).read_bytes()
    else:
        text = default_corpus(Path(__file__).resolve().parents[1])
    rows = run(args.steps, text, Path(args.out_dir), n_ctx=args.n_ctx,
               ladder=args.ladder.split(","))
    print(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    main()
