"""GritLM demo: one model serving both embedding and generation.

Parity target: reference examples/gritlm/gritlm.cpp — generative
representational instruction tuning lets a single checkpoint do retrieval
(bidirectional attention + mean pooling over the response span, reference
encode() at gritlm.cpp:9-93) and generation (causal attention,
generate() at :95-151), switched per call via llama_set_causal_attn.
Here the switch is LlamaContext.set_causal_attn (each setting keeps its
own compiled step).

Usage:
    python -m llama_kotlin_tpu.tools.gritlm --model gritlm.gguf \
        [--query "..."] [--doc "..." --doc "..."] [--generate "..."]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def gritlm_instruction(instruction: str) -> str:
    """The GritLM embed prompt format (gritlm.cpp:153-155)."""
    return (f"<|user|>\n{instruction}\n<|embed|>\n" if instruction
            else "<|embed|>\n")


def encode(ctx, tok, sentences: list[str], instruction: str) -> np.ndarray:
    """Mean-pooled embeddings over the sentence tokens only (instruction
    tokens excluded, reference gritlm.cpp:29-31), bidirectional attention,
    L2-normalized.  Returns [len(sentences), n_embd]."""
    from llama_kotlin_tpu.runtime.batch import Batch

    ctx.set_causal_attn(False)
    n_inst = len(tok.encode(instruction, add_special=True))
    out = []
    for s in sentences:
        ids = np.asarray(tok.encode(instruction + s, add_special=True), np.int32)
        ctx.clear()
        want = np.zeros(len(ids), bool)
        want[n_inst:] = True  # embeddings for the response span only
        rc = ctx.decode(Batch(ids, np.arange(len(ids), dtype=np.int32),
                              np.zeros(len(ids), np.int32), want))
        if rc != 0:
            raise RuntimeError("cache full while embedding")
        emb = ctx.get_embeddings(pooling="none")  # [n_resp, n_embd]
        v = emb.mean(axis=0)
        out.append(v / (np.linalg.norm(v) + 1e-12))
    return np.stack(out)


def generate(ctx, tok, prompt: str, n_predict: int = 64,
             stream=sys.stdout) -> str:
    """Greedy causal generation (gritlm.cpp generate())."""
    from llama_kotlin_tpu.runtime.batch import Batch

    ctx.set_causal_attn(True)
    ctx.clear()
    ids = list(tok.encode(prompt, add_special=True, parse_special=True))
    if ctx.decode(Batch.single(np.asarray(ids, np.int32))) != 0:
        raise RuntimeError("cache full")
    text = ""
    n_past = len(ids)
    eos = getattr(getattr(tok, "vocab", None), "eos_id", -1)
    for _ in range(n_predict):
        cur = int(np.argmax(ctx.get_logits()[-1]))
        if cur == eos:
            break
        piece = tok.decode([cur], skip_special=False)
        text += piece
        if stream:
            stream.write(piece)
            stream.flush()
        if ctx.decode(Batch.single(np.array([cur], np.int32),
                                   pos0=n_past)) != 0:
            break
        n_past += 1
    if stream:
        stream.write("\n")
    return text


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b))  # inputs are L2-normalized


def main(argv=None):
    ap = argparse.ArgumentParser(description="GritLM embed+generate demo")
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--n-ctx", type=int, default=2048)
    ap.add_argument("--instruction",
                    default="Given a query, retrieve the relevant document")
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--doc", action="append", default=[])
    ap.add_argument("--generate", help="also run a causal generation")
    ap.add_argument("--n-predict", type=int, default=64)
    args = ap.parse_args(argv)

    import jax.numpy as jnp  # noqa: F401  (jax init)

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    cfg, params, f = load_gguf_model(args.model)
    tok = build_tokenizer(f.metadata)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=args.n_ctx)

    queries = args.query or ["How do transformers attend to long contexts?"]
    docs = args.doc or [
        "Attention spans are extended with rotary scaling and windowing.",
        "A recipe for sourdough bread with a long cold fermentation.",
    ]
    q_rep = encode(ctx, tok, queries, gritlm_instruction(args.instruction))
    d_rep = encode(ctx, tok, docs, gritlm_instruction(""))
    for i, q in enumerate(queries):
        for j, d in enumerate(docs):
            sim = cosine(q_rep[i], d_rep[j])
            print(f'cosine(query[{i}], doc[{j}]) = {sim:.3f}')

    if args.generate:
        prompt = f"<|user|>\n{args.generate}\n<|assistant|>\n"
        generate(ctx, tok, prompt, n_predict=args.n_predict)


if __name__ == "__main__":
    main()
