"""Minimal training harness (parity targets: the reference's retained
ggml_opt Adam/L-BFGS trainers (ggml.h:2094-2234), common/train.cpp state
management, and the examples/baby-llama demo): trains a small llama on
next-token prediction with optax Adam, gradient checkpointing via
jax.checkpoint, and GGUF checkpoint output loadable by our runtime.

All compute ops are the same jnp implementations the inference path uses —
they are pure functions, so jax.grad differentiates them directly (no
separate backward kernels needed, unlike ggml's per-op backward table).

Usage:
    python -m llama_kotlin_tpu.tools.train --steps 100 --out model.gguf
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np


def init_params(cfg, rng_key):
    import jax
    import jax.numpy as jnp

    E, F, V = cfg.n_embd, cfg.n_ff, cfg.vocab_size
    qd = cfg.n_head * cfg.head_dim
    kvd = cfg.n_head_kv * cfg.head_dim
    keys = jax.random.split(rng_key, 4 + cfg.n_layer)

    def mat(key, n, k):
        return jax.random.normal(key, (n, k), jnp.float32) * (0.02)

    params = {
        "tok_embd": mat(keys[0], V, E),
        "output": mat(keys[1], V, E),
        "output_norm": jnp.ones(E, jnp.float32),
        "layers": [],
    }
    for i in range(cfg.n_layer):
        lk = jax.random.split(keys[3 + i], 7)
        params["layers"].append({
            "attn_norm": jnp.ones(E, jnp.float32),
            "wq": mat(lk[0], qd, E),
            "wk": mat(lk[1], kvd, E),
            "wv": mat(lk[2], kvd, E),
            "wo": mat(lk[3], E, qd),
            "ffn_norm": jnp.ones(E, jnp.float32),
            "ffn_gate": mat(lk[4], F, E),
            "ffn_up": mat(lk[5], F, E),
            "ffn_down": mat(lk[6], E, F),
        })
    return params


def training_forward(params, cfg, tokens, *, remat: bool = True):
    """Causal LM forward over [B, T] token batches -> logits [B, T, V].

    Uses the same op implementations as inference (rms_norm, rope,
    attention_reference) in their batched form; layers optionally wrapped
    in jax.checkpoint (the analogue of train.cpp's grad checkpointing).
    """
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.ops.attention import attention_reference
    from llama_kotlin_tpu.ops.norms import rms_norm
    from llama_kotlin_tpu.ops.rope import apply_rope

    B, T = tokens.shape
    rope = cfg.rope_params()
    pos = jnp.arange(T, dtype=jnp.int32)
    h = params["tok_embd"][tokens]  # [B, T, E]
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer(h, lp):
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        q = (x @ lp["wq"].T).reshape(B, T, cfg.n_head, cfg.head_dim)
        k = (x @ lp["wk"].T).reshape(B, T, cfg.n_head_kv, cfg.head_dim)
        v = (x @ lp["wv"].T).reshape(B, T, cfg.n_head_kv, cfg.head_dim)
        q = apply_rope(q, pos, rope)
        k = apply_rope(k, pos, rope)
        outs = []
        for b in range(B):  # small training batches; vmap later
            outs.append(attention_reference(
                q[b], k[b].transpose(1, 0, 2), v[b].transpose(1, 0, 2),
                causal, scale=cfg.attn_scale))
        attn = jnp.stack(outs).reshape(B, T, cfg.n_head * cfg.head_dim)
        h = h + attn @ lp["wo"].T
        x = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        ffn = jax.nn.silu(x @ lp["ffn_gate"].T) * (x @ lp["ffn_up"].T)
        return h + ffn @ lp["ffn_down"].T

    f = jax.checkpoint(layer) if remat else layer
    for lp in params["layers"]:
        h = f(h, lp)
    h = rms_norm(h, params["output_norm"], cfg.rms_eps)
    return h @ params["output"].T


def loss_fn(params, cfg, tokens):
    import jax
    import jax.numpy as jnp

    logits = training_forward(params, cfg, tokens[:, :-1])
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return nll.mean()


def train(cfg, data_tokens: np.ndarray, *, steps: int = 100, batch: int = 4,
          seq_len: int = 64, lr: float = 3e-4, seed: int = 0, log=None,
          optimizer: str = "adamw"):
    """Returns (params, losses). data_tokens: flat int32 corpus.

    optimizer: "adamw" or "lbfgs" (parity: ggml_opt ADAM / L-BFGS,
    reference ggml/include/ggml.h:2094-2234).
    """
    import jax
    import jax.numpy as jnp
    import optax

    key = jax.random.PRNGKey(seed)
    params = init_params(cfg, key)
    if optimizer == "lbfgs":
        opt = optax.lbfgs(learning_rate=lr if lr else None)
    else:
        opt = optax.adamw(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens)
        if optimizer == "lbfgs":  # linesearch needs value/grad/value_fn
            updates, opt_state = opt.update(
                grads, opt_state, params, value=loss, grad=grads,
                value_fn=lambda p: loss_fn(p, cfg, tokens),
            )
        else:
            updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    n = len(data_tokens) - seq_len - 1
    for i in range(steps):
        starts = rng.integers(0, n, batch)
        batch_toks = np.stack([data_tokens[s : s + seq_len + 1] for s in starts])
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch_toks))
        losses.append(float(loss))
        if log and (i % 10 == 0 or i == steps - 1):
            log(i, losses[-1])
    return params, losses


def save_checkpoint_gguf(params, cfg, path) -> None:
    """Write trained params as a standard llama GGUF (loadable by the
    inference runtime and by the reference)."""
    from llama_kotlin_tpu.gguf import GGUFWriter
    from llama_kotlin_tpu.quant.formats import GGMLQuantType

    w = GGUFWriter()
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "lktpu-trained")
    w.add_kv("llama.embedding_length", np.uint32(cfg.n_embd))
    w.add_kv("llama.block_count", np.uint32(cfg.n_layer))
    w.add_kv("llama.attention.head_count", np.uint32(cfg.n_head))
    w.add_kv("llama.attention.head_count_kv", np.uint32(cfg.n_head_kv))
    w.add_kv("llama.feed_forward_length", np.uint32(cfg.n_ff))
    w.add_kv("llama.context_length", np.uint32(cfg.n_ctx_train))
    w.add_kv("llama.rope.freq_base", np.float32(cfg.rope_freq_base))
    w.add_kv("llama.attention.layer_norm_rms_epsilon", np.float32(cfg.rms_eps))
    w.add_kv("llama.vocab_size", np.uint32(cfg.vocab_size))
    w.add_tensor("token_embd.weight", np.asarray(params["tok_embd"]))
    w.add_tensor("output.weight", np.asarray(params["output"]))
    w.add_tensor("output_norm.weight", np.asarray(params["output_norm"]))
    for i, lp in enumerate(params["layers"]):
        for key, gg in [("attn_norm", "attn_norm.weight"), ("wq", "attn_q.weight"),
                        ("wk", "attn_k.weight"), ("wv", "attn_v.weight"),
                        ("wo", "attn_output.weight"), ("ffn_norm", "ffn_norm.weight"),
                        ("ffn_gate", "ffn_gate.weight"), ("ffn_up", "ffn_up.weight"),
                        ("ffn_down", "ffn_down.weight")]:
            w.add_tensor(f"blk.{i}.{gg}", np.asarray(lp[key]))
    w.write(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="trained.gguf")
    ap.add_argument("--file", help="training text (bytes as tokens if no model)")
    args = ap.parse_args()

    from llama_kotlin_tpu.models.config import ModelConfig

    cfg = ModelConfig(arch="llama", vocab_size=256, n_embd=128, n_layer=4,
                      n_head=4, n_head_kv=4, n_ff=256, n_ctx_train=args.seq_len)
    if args.file:
        data = np.frombuffer(open(args.file, "rb").read(), np.uint8).astype(np.int32)
    else:
        rng = np.random.default_rng(0)
        data = rng.integers(0, cfg.vocab_size, 100000).astype(np.int32)

    def log(i, loss):
        sys.stderr.write(f"step {i}: loss {loss:.4f}\n")

    t0 = time.time()
    params, losses = train(cfg, data, steps=args.steps, batch=args.batch,
                           seq_len=args.seq_len, lr=args.lr, log=log)
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s; "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")
    save_checkpoint_gguf(params, cfg, args.out)
    print(args.out)


if __name__ == "__main__":
    main()
