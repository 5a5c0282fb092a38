"""Chunked retrieval over embeddings (parity: examples/retrieval +
examples/embedding): split input files into chunks, embed each with the
model's pooled hidden states, answer queries by cosine similarity."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def embed_text(ctx, tok, text: str, pooling: str = "mean") -> np.ndarray:
    from llama_kotlin_tpu.runtime.batch import Batch

    ids = np.asarray(tok.encode(text), np.int32)[: ctx.n_cells]
    ctx.clear()
    rc = ctx.decode(Batch.single(ids, logits_last_only=False))
    assert rc == 0
    e = ctx.get_embeddings(pooling=pooling)
    n = np.linalg.norm(e)
    return e / n if n > 0 else e


def chunk_files(paths: list[str], separator: str = "\n", min_len: int = 32) -> list[str]:
    """Greedy chunking on the separator (cf. retrieval.cpp chunking)."""
    chunks: list[str] = []
    for p in paths:
        cur = ""
        for part in open(p, encoding="utf-8").read().split(separator):
            cur = cur + part + separator
            if len(cur) >= min_len:
                chunks.append(cur.strip())
                cur = ""
        if cur.strip():
            chunks.append(cur.strip())
    return chunks


def top_k_chunks(ctx, tok, chunks: list[str], query: str, k: int = 3,
                 pooling: str = "mean") -> list[tuple[float, int]]:
    """[(similarity, chunk_index)] best-first."""
    embs = np.stack([embed_text(ctx, tok, c, pooling) for c in chunks])
    q = embed_text(ctx, tok, query, pooling)
    sims = embs @ q
    order = np.argsort(-sims)[:k]
    return [(float(sims[i]), int(i)) for i in order]


def main(argv=None):
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    ap = argparse.ArgumentParser(description="embedding retrieval")
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--context-file", action="append", required=True)
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--chunk-separator", default="\n")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--pooling", default="mean", choices=["mean", "last", "cls"])
    ap.add_argument("--query", "-q", default=None, help="one-shot query (else REPL)")
    args = ap.parse_args(argv)
    cfg, params, f = load_gguf_model(args.model)
    tok = build_tokenizer(f.metadata)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=2048)
    chunks = chunk_files(args.context_file, args.chunk_separator, args.chunk_size)
    print(f"{len(chunks)} chunks", file=sys.stderr)

    def answer(q):
        for sim, i in top_k_chunks(ctx, tok, chunks, q, args.top_k, args.pooling):
            print(f"[{sim:+.4f}] {chunks[i][:120]!r}")

    if args.query is not None:
        answer(args.query)
        return
    while True:
        try:
            q = input("query> ")
        except EOFError:
            break
        if not q.strip():
            break
        answer(q)


if __name__ == "__main__":
    main()
