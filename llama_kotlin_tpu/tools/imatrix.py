"""Importance-matrix collection (parity target: examples/imatrix,
649 LoC, which hooks the scheduler's eval callback): accumulates per-column
mean-squared activations at every linear layer's input over a calibration
text, saved as npz for imatrix-weighted quantization.

Usage:
    python -m llama_kotlin_tpu.tools.imatrix --model m.gguf --file calib.txt -o imatrix.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def collect_imatrix(cfg, params, tokens: np.ndarray, n_ctx: int = 512,
                    compute_dtype=None, progress=None) -> dict[str, np.ndarray]:
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models import llama as llama_model
    from llama_kotlin_tpu.runtime.kv_cache import KVCache

    compute_dtype = compute_dtype or jnp.bfloat16
    # unstacked params: collect_stats uses the unrolled layer loop
    if "layers" not in params:
        raise ValueError("collect_imatrix needs unstacked params")

    cache = KVCache.create(cfg.n_layer, n_ctx, cfg.n_head_kv, cfg.head_dim,
                           dtype=compute_dtype)

    step = jax.jit(
        lambda p, t, pos, cp, cs, c: llama_model.forward(
            p, cfg, t, pos, jnp.zeros_like(t), pos, c, cp, cs,
            jnp.array([0], jnp.int32), compute_dtype=compute_dtype,
            collect_stats=True,
        ),
        static_argnames=(),
        donate_argnums=(5,),
    )

    sums: dict[str, np.ndarray] = {}
    n_tokens = 0
    n_chunks = len(tokens) // n_ctx
    for c in range(n_chunks):
        chunk = jnp.asarray(tokens[c * n_ctx : (c + 1) * n_ctx], jnp.int32)
        pos = jnp.arange(n_ctx, dtype=jnp.int32)
        cell_pos = pos
        cell_seq = jnp.ones(n_ctx, jnp.int32)
        _, cache, _, stats = step(params, chunk, pos, cell_pos, cell_seq, cache)
        for name, v in stats.items():
            v = np.asarray(v)
            sums[name] = sums.get(name, 0) + v
        n_tokens += n_ctx
        # reset cache between chunks
        cache = jax.tree.map(lambda a: jnp.zeros_like(a), cache)
        if progress:
            progress(c + 1, n_chunks)
    return {name: v / n_tokens for name, v in sums.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--file", required=True)
    ap.add_argument("-o", "--output", default="imatrix.npz")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--n-chunks", type=int, default=0)
    args = ap.parse_args()

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    cfg, params, f = load_gguf_model(args.model)
    tok = build_tokenizer(f.metadata)
    f.close()
    text = open(args.file, encoding="utf-8", errors="replace").read()
    tokens = np.asarray(tok.encode(text), np.int32)
    if args.n_chunks:
        tokens = tokens[: args.n_chunks * args.n_ctx]

    def progress(i, n):
        sys.stderr.write(f"imatrix [{i}/{n}]\n")

    im = collect_imatrix(cfg, params, tokens, args.n_ctx, progress=progress)
    np.savez_compressed(args.output, **im)
    print(f"saved {len(im)} entries to {args.output}")


if __name__ == "__main__":
    main()
