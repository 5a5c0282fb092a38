"""Per-tensor activation inspection (parity: examples/eval-callback:
cb_eval printing tensor stats during graph evaluation).

XLA traces the whole step, so instead of a per-node callback we run the
forward with collect_stats=True (the same hook imatrix uses) and report
per-site activation statistics."""

from __future__ import annotations

import argparse

import numpy as np


def eval_with_stats(cfg, params, tokens, *, compute_dtype=None):
    """Run one forward over `tokens`, returning {site: sum-of-squares} plus
    the logits, mirroring cb_eval's per-node visibility."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.models import llama as llama_model
    from llama_kotlin_tpu.runtime.kv_cache import KVCache

    compute_dtype = compute_dtype or jnp.float32
    n = len(tokens)
    cache = KVCache.create(cfg.n_layer, n, cfg.n_head_kv, cfg.head_dim,
                           dtype=compute_dtype)
    pos = jnp.arange(n, dtype=jnp.int32)
    seq = jnp.zeros(n, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32)
    cell_seq = jnp.ones(n, jnp.int32)
    out_ids = jnp.arange(n, dtype=jnp.int32)
    logits, _, _, stats = llama_model.forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), pos, seq, slots, cache,
        pos, cell_seq, out_ids, compute_dtype=compute_dtype, collect_stats=True,
    )
    return np.asarray(logits), {k: np.asarray(v) for k, v in stats.items()}


def main(argv=None):
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    ap = argparse.ArgumentParser(description="print per-site activation stats")
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--prompt", "-p", default="Hello")
    args = ap.parse_args(argv)
    cfg, params, f = load_gguf_model(args.model, compute_dtype=jnp.float32)
    tok = build_tokenizer(f.metadata)
    f.close()
    ids = np.asarray(tok.encode(args.prompt), np.int32)
    logits, stats = eval_with_stats(cfg, params, ids)
    for name in sorted(stats):
        v = stats[name]
        print(f"{name:<28} shape={v.shape} sum_sq={float(v.sum()):.6g} "
              f"mean={float(v.mean()):.6g} max={float(v.max()):.6g}")
    print(f"logits                       shape={logits.shape} "
          f"max={float(logits.max()):.6g}")


if __name__ == "__main__":
    main()
