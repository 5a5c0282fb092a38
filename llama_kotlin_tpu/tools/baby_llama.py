"""baby-llama: train a tiny llama from scratch on a toy task, then sample.

Parity target: the reference's examples/baby-llama/baby-llama.cpp — it
builds a miniature llama (256-embd/1-layer by default there), trains it
with ggml's autodiff+Adam on a synthetic "quantized sine wave" next-token
task (get_example_targets, baby-llama.cpp: the target token at step i is
1 + round(((sin(x)+1)/2) * (n_vocab-2)) for x walking the period), and
then greedily samples from the trained net to show it learned the wave.

This version reuses the framework's training harness (tools/train.py:
same jnp forward the inference path uses, differentiated by jax.grad,
optax Adam) and its on-model generation; the trained checkpoint is saved
as a standard llama GGUF that both our runtime and the reference load.

Usage:
    python -m llama_kotlin_tpu.tools.baby_llama --steps 300 --out baby.gguf
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def sine_tokens(n: int, n_vocab: int, example_id: int = 0,
                n_tokens: int = 64) -> np.ndarray:
    """The reference's get_example_targets token stream, concatenated over
    examples: token_i = clamp(1 + z*(n_vocab-1)), z = (sin(x)+1)/2."""
    out = [0]  # stream starts at token 0 like the reference's tokens_input[0]
    eid = example_id
    while len(out) < n:
        for i in range(1, n_tokens + 1):
            x = eid + i * np.pi * 2.0 * 0.5 / n_tokens
            z = (np.sin(x) + 1.0) * 0.5
            tok = int(max(1, min(1 + int(z * (n_vocab - 1)), n_vocab - 1)))
            out.append(tok)
        eid += 1
    return np.asarray(out[:n], np.int32)


def greedy_sample(params, cfg, prompt: np.ndarray, n_gen: int) -> np.ndarray:
    """Greedy continuation using the training forward (tiny model: full
    re-forward per token is fine for a demo)."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.tools.train import training_forward

    toks = list(int(t) for t in prompt)
    for _ in range(n_gen):
        window = toks[-cfg.n_ctx_train:]
        logits = training_forward(params, cfg, jnp.asarray([window]))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return np.asarray(toks[len(prompt):], np.int32)


def main(argv=None):
    ap = argparse.ArgumentParser(description="baby-llama training demo")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--n-vocab", type=int, default=64)
    ap.add_argument("--n-embd", type=int, default=64)
    ap.add_argument("--n-layer", type=int, default=1)
    ap.add_argument("--n-head", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None, help="optional GGUF checkpoint path")
    args = ap.parse_args(argv)

    from llama_kotlin_tpu.models.config import ModelConfig
    from llama_kotlin_tpu.tools.train import save_checkpoint_gguf, train

    cfg = ModelConfig(arch="llama", vocab_size=args.n_vocab,
                      n_embd=args.n_embd, n_layer=args.n_layer,
                      n_head=args.n_head, n_head_kv=args.n_head,
                      n_ff=4 * args.n_embd, n_ctx_train=args.seq_len)
    data = sine_tokens(200_000, cfg.vocab_size, n_tokens=args.seq_len)

    def log(i, loss):
        sys.stderr.write(f"step {i}: loss {loss:.4f}\n")

    t0 = time.time()
    params, losses = train(cfg, data, steps=args.steps, batch=args.batch,
                           seq_len=args.seq_len, lr=args.lr, log=log)
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s; "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    # show the learned wave: continue the stream and compare to ground truth
    prompt = data[: args.seq_len]
    gen = greedy_sample(params, cfg, prompt, args.seq_len)
    truth = data[args.seq_len: 2 * args.seq_len]
    acc = float(np.mean(gen == truth))
    print("generated:", " ".join(map(str, gen[:32])))
    print("truth:    ", " ".join(map(str, truth[:32])))
    print(f"next-{args.seq_len}-token accuracy vs ground truth: {acc:.2f}")

    if args.out:
        save_checkpoint_gguf(params, cfg, args.out)
        print(args.out)
    return acc


if __name__ == "__main__":
    main()
