"""Control-vector extraction (parity: examples/cvector-generator):
per-layer hidden-state differences between positive/negative prompt pairs,
reduced by PCA (power iteration on the covariance of the differences) to
one steering direction per layer, written as direction.N tensors."""

from __future__ import annotations

import argparse

import numpy as np


def collect_layer_hidden(cfg, params, token_lists) -> np.ndarray:
    """Last-token hidden state after every layer for each prompt:
    [n_prompts, n_layer, n_embd]."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.models import llama as llama_model
    from llama_kotlin_tpu.runtime.kv_cache import KVCache

    out = []
    for ids in token_lists:
        n = len(ids)
        cache = KVCache.create(cfg.n_layer, n, cfg.n_head_kv, cfg.head_dim,
                               dtype=jnp.float32)
        pos = jnp.arange(n, dtype=jnp.int32)
        _, _, _, stats = llama_model.forward(
            params, cfg, jnp.asarray(ids, jnp.int32), pos,
            jnp.zeros(n, jnp.int32), jnp.arange(n, dtype=jnp.int32), cache,
            pos, jnp.ones(n, jnp.int32), jnp.arange(n, dtype=jnp.int32),
            compute_dtype=jnp.float32, collect_layer_outputs=True,
        )
        out.append(np.stack([np.asarray(stats[f"l_out.{i}"])[-1]
                             for i in range(cfg.n_layer)]))
    return np.stack(out)


def pca_direction(diffs: np.ndarray, n_iter: int = 100) -> np.ndarray:
    """Top principal component of [n, d] difference vectors via power
    iteration (cf. cvector-generator/pca.hpp), sign-aligned so the mean
    difference projects positively."""
    d = diffs - diffs.mean(axis=0, keepdims=True)
    cov = d.T @ d
    v = np.ones(cov.shape[0], np.float32)
    v /= np.linalg.norm(v)
    for _ in range(n_iter):
        v = cov @ v
        n = np.linalg.norm(v)
        if n < 1e-20:
            break
        v /= n
    if float(diffs.mean(axis=0) @ v) < 0:
        v = -v
    return v.astype(np.float32)


def generate_control_vector(cfg, params, tok, positives, negatives) -> np.ndarray:
    """[n_layer, n_embd] steering directions from prompt pairs."""
    pos_ids = [np.asarray(tok.encode(p), np.int32) for p in positives]
    neg_ids = [np.asarray(tok.encode(p), np.int32) for p in negatives]
    hp = collect_layer_hidden(cfg, params, pos_ids)  # [P, L, E]
    hn = collect_layer_hidden(cfg, params, neg_ids)
    n = min(len(hp), len(hn))
    diffs = hp[:n] - hn[:n]  # [n, L, E]
    return np.stack([pca_direction(diffs[:, l]) for l in range(cfg.n_layer)])


def write_control_vector_gguf(path: str, directions: np.ndarray,
                              model_hint: str = "") -> None:
    from llama_kotlin_tpu.gguf import GGUFWriter
    from llama_kotlin_tpu.quant.formats import GGMLQuantType

    w = GGUFWriter()
    w.add_kv("general.architecture", "controlvector")
    w.add_kv("controlvector.model_hint", model_hint or "llama")
    w.add_kv("controlvector.layer_count", np.uint32(len(directions)))
    for i, v in enumerate(directions):
        w.add_tensor(f"direction.{i + 1}", v.astype(np.float32), GGMLQuantType.F32)
    w.write(path)


def main(argv=None):
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    ap = argparse.ArgumentParser(description="extract a control vector via PCA")
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--positive-file", required=True, help="one prompt per line")
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("--output", "-o", default="control_vector.gguf")
    args = ap.parse_args(argv)
    cfg, params, f = load_gguf_model(args.model, compute_dtype=jnp.float32)
    tok = build_tokenizer(f.metadata)
    f.close()
    positives = [l for l in open(args.positive_file).read().splitlines() if l]
    negatives = [l for l in open(args.negative_file).read().splitlines() if l]
    dirs = generate_control_vector(cfg, params, tok, positives, negatives)
    write_control_vector_gguf(args.output, dirs, cfg.arch)
    print(f"wrote {len(dirs)} directions -> {args.output}")


if __name__ == "__main__":
    main()
