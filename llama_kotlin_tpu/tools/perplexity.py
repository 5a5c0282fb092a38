"""Perplexity + KL-divergence evaluation.

Parity target: examples/perplexity/perplexity.cpp (2,066 LoC) core modes:
- WikiText-2-style PPL: text split into n_ctx chunks; tokens in the second
  half of each chunk are scored given the first half as context
- KL divergence vs a base model's saved logits (quality-parity checks
  between quantizations without needing absolute datasets)

Usage:
    python -m llama_kotlin_tpu.tools.perplexity --model m.gguf --file wiki.test.raw
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from typing import Optional

import numpy as np


def softmax_logprob(logits: np.ndarray, token: int) -> float:
    m = logits.max()
    lse = m + math.log(np.exp(logits - m).sum())
    return float(logits[token] - lse)


def compute_perplexity(ctx, tokens: np.ndarray, n_ctx: int = 512,
                       collect_logits: bool = False, progress=None):
    """Returns (ppl, nll_sum, n_scored, [chunk logits if requested])."""
    from llama_kotlin_tpu.runtime.batch import Batch

    tokens = np.asarray(tokens, np.int32)
    n_chunks = len(tokens) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(tokens)}")
    nll = 0.0
    count = 0
    all_logits = []
    first_scored = min(512, n_ctx // 2)
    for c in range(n_chunks):
        chunk = tokens[c * n_ctx : (c + 1) * n_ctx]
        ctx.clear()
        out = np.zeros(n_ctx, bool)
        out[first_scored - 1 : -1] = True  # predictors for scored targets
        rc = ctx.decode(Batch(chunk, np.arange(n_ctx, dtype=np.int32),
                              np.zeros(n_ctx, np.int32), out))
        if rc != 0:
            raise RuntimeError("decode failed (cache too small for n_ctx?)")
        logits = ctx.get_logits()  # [n_scored, vocab]
        targets = chunk[first_scored:]
        logp = log_softmax_rows(logits)
        rows = np.arange(len(targets))
        nll -= float(logp[rows, targets].sum())
        count += len(targets)
        if collect_logits:
            all_logits.append(logits.astype(np.float16))
        if progress:
            progress(c + 1, n_chunks, math.exp(nll / max(count, 1)))
    ppl = math.exp(nll / count)
    return ppl, nll, count, all_logits


def log_softmax_rows(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    return logits - m - np.log(e.sum(axis=-1, keepdims=True))


def kl_divergence(base_logits: list[np.ndarray], test_logits: list[np.ndarray]):
    """Mean KL(base || test) per scored token + top-1 agreement rate."""
    total = 0.0
    agree = 0
    n = 0
    for b, t in zip(base_logits, test_logits):
        lb = log_softmax_rows(b.astype(np.float32))
        lt = log_softmax_rows(t.astype(np.float32))
        pb = np.exp(lb)
        total += float((pb * (lb - lt)).sum())
        agree += int((b.argmax(-1) == t.argmax(-1)).sum())
        n += b.shape[0]
    return total / n, agree / n


def choice_logprob(ctx, context_ids, choice_ids) -> float:
    """Sum of log p(choice tokens | context + preceding choice tokens) —
    the per-ending score the reference's hellaswag_score computes
    (examples/perplexity/perplexity.cpp)."""
    from llama_kotlin_tpu.runtime.batch import Batch

    ids = list(context_ids) + list(choice_ids)
    assert len(context_ids) >= 1, "need at least BOS in the context"
    ctx.clear()
    out = np.zeros(len(ids), bool)
    out[len(context_ids) - 1 : len(ids) - 1] = True
    rc = ctx.decode(Batch(np.asarray(ids, np.int32),
                          np.arange(len(ids), dtype=np.int32),
                          np.zeros(len(ids), np.int32), out))
    assert rc == 0, "cache full: raise n_cells above the task length"
    lsm = log_softmax_rows(ctx.get_logits())
    n_ctx = len(context_ids)
    return float(sum(lsm[i, ids[n_ctx + i]] for i in range(len(choice_ids))))


def multiple_choice_score(ctx, tok, tasks: list[dict], progress=None) -> dict:
    """Score multiple-choice tasks (HellaSwag / Winogrande / MMLU pattern,
    cf. perplexity.cpp hellaswag_score / winogrande_score /
    multiple_choice_score).

    Each task: {"context": str, "choices": [str, ...], "gold": int}.
    Winogrande-style tasks use context "" with full-sentence choices.
    """
    correct = 0
    for i, task in enumerate(tasks):
        c_ids = tok.encode(task["context"], add_special=True)
        if not c_ids:
            c_ids = [tok.vocab.bos_id]
        scores = []
        for choice in task["choices"]:
            ch_ids = tok.encode(choice, add_special=False)
            if not ch_ids:
                scores.append(float("-inf"))
                continue
            scores.append(choice_logprob(ctx, c_ids, ch_ids))
        pick = int(np.argmax(scores))
        correct += int(pick == task["gold"])
        if progress is not None:
            progress(i + 1, len(tasks), correct / (i + 1))
    return {"tasks": len(tasks), "correct": correct,
            "accuracy": round(correct / max(1, len(tasks)), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--file", required=False)
    ap.add_argument("--multiple-choice",
                    help="JSONL of {context, choices, gold} tasks "
                         "(hellaswag/winogrande/mmlu style)")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--n-chunks", type=int, default=0, help="limit chunks (0=all)")
    ap.add_argument("--save-logits", help="npz path to save scored logits")
    ap.add_argument("--kl-base", help="npz of base logits for KL mode")
    args = ap.parse_args()

    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    cfg, params, f = load_gguf_model(args.model)
    tok = build_tokenizer(f.metadata)
    f.close()

    if args.multiple_choice:
        tasks = [json.loads(l) for l in open(args.multiple_choice) if l.strip()]
        mc_ctx = LlamaContext(cfg, params, n_cells=args.n_ctx)
        result = multiple_choice_score(
            mc_ctx, tok, tasks,
            progress=lambda i, n, acc: sys.stderr.write(f"[{i}/{n}] acc={acc:.4f}\n"),
        )
        print(json.dumps(result))
        return
    if not args.file:
        ap.error("need --file or --multiple-choice")
    text = open(args.file, encoding="utf-8", errors="replace").read()
    tokens = np.asarray(tok.encode(text, add_special=True), np.int32)
    if args.n_chunks:
        tokens = tokens[: args.n_chunks * args.n_ctx]
    ctx = LlamaContext(cfg, params, n_cells=args.n_ctx,
                       buckets=(args.n_ctx,), n_ubatch=args.n_ctx)

    def progress(i, n, run_ppl):
        sys.stderr.write(f"[{i}/{n}] ppl={run_ppl:.4f}\n")

    ppl, nll, count, logits = compute_perplexity(
        ctx, tokens, args.n_ctx, collect_logits=bool(args.save_logits or args.kl_base),
        progress=progress,
    )
    result = {"ppl": round(ppl, 4), "tokens_scored": count, "n_ctx": args.n_ctx}
    if args.save_logits:
        np.savez_compressed(args.save_logits, *logits)
    if args.kl_base:
        # numeric key order: lexicographic sort pairs arr_10 before arr_2
        base_npz = np.load(args.kl_base)
        base = [base_npz[k] for k in sorted(
            base_npz.files, key=lambda n: int(n.split("_")[-1]))]
        kl, top1 = kl_divergence(base, logits)
        result["kl_divergence"] = round(kl, 6)
        result["top1_agreement"] = round(top1, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
