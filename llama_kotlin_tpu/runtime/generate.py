"""On-device multi-step generation loop.

The reference decodes one token per host round-trip (llama_decode in a
loop, main.cpp).  On TPU, host<->device latency would dominate, so the
decode loop itself is compiled: lax.fori_loop carries (cache, metadata,
tokens) across steps, the sampler runs on device, and only the final token
ids come back to the host.  Batched over B independent sequences.

The step-wise LlamaContext path remains for continuous batching / server
use; this is the latency-optimal path for generation and benchmarking.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from llama_kotlin_tpu.models import llama as llama_model
from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.runtime.kv_cache import KVCache


class SampleParams(NamedTuple):
    """On-device sampling parameters (greedy when temp == 0)."""

    temp: float = 0.0
    top_k: int = 0  # 0 = off
    seed: int = 0


def _sample(logits: jnp.ndarray, sp: SampleParams, key) -> jnp.ndarray:
    """logits [B, V] -> token ids [B]."""
    if sp.temp <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / sp.temp
    if sp.top_k > 0:
        kth = jax.lax.top_k(scaled, sp.top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "compute_dtype", "sp"),
         donate_argnames=("cache",))
def generate_loop(
    params: dict,
    cfg: ModelConfig,
    cache: KVCache,
    cell_pos: jnp.ndarray,  # [cells] i32 (state before the loop)
    cell_seq: jnp.ndarray,  # [cells] i32
    tokens0: jnp.ndarray,  # [B] first token of each sequence
    pos0: jnp.ndarray,  # [B] its position
    seq_ids: jnp.ndarray,  # [B]
    slots: jnp.ndarray,  # [n_steps, B] pre-allocated cache cells
    n_steps: int,
    sp: SampleParams = SampleParams(),
    compute_dtype=jnp.bfloat16,
):
    """Decode n_steps tokens for B sequences entirely on device.

    Returns (out_tokens [n_steps, B], cache, cell_pos, cell_seq,
    last_logits [B, V]).
    """
    B = tokens0.shape[0]
    out_ids = jnp.arange(B, dtype=jnp.int32)
    key0 = jax.random.PRNGKey(sp.seed)

    def body(i, carry):
        tokens, pos, cache, cell_pos, cell_seq, out_tokens, logits_prev, key = carry
        step_slots = slots[i]
        cell_pos = cell_pos.at[step_slots].set(pos)
        cell_seq = cell_seq.at[step_slots].set(
            (1 << seq_ids).astype(cell_seq.dtype)
        )
        logits, cache, _embd = llama_model.forward(
            params, cfg, tokens, pos, seq_ids, step_slots, cache,
            cell_pos, cell_seq, out_ids, compute_dtype=compute_dtype,
        )
        key, sub = jax.random.split(key)
        next_tokens = _sample(logits, sp, sub)
        out_tokens = out_tokens.at[i].set(next_tokens)
        return (next_tokens, pos + 1, cache, cell_pos, cell_seq, out_tokens,
                logits, key)

    out_tokens = jnp.zeros((n_steps, B), jnp.int32)
    logits0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    carry = (tokens0, pos0, cache, cell_pos, cell_seq, out_tokens, logits0, key0)
    tokens, pos, cache, cell_pos, cell_seq, out_tokens, logits, _ = jax.lax.fori_loop(
        0, n_steps, body, carry
    )
    return out_tokens, cache, cell_pos, cell_seq, logits


def generate(ctx, prompt_tokens, n_steps: int, sp: SampleParams = SampleParams(),
             seq_id: int = 0):
    """Host wrapper: prefill via the context, then run the device loop.

    Returns the generated token ids as a list[int].
    """
    import numpy as np

    from llama_kotlin_tpu.runtime.batch import Batch

    prompt_tokens = np.asarray(prompt_tokens, np.int32)
    rc = ctx.decode(Batch.single(prompt_tokens, seq_id=seq_id))
    if rc != 0:
        raise RuntimeError("KV cache full during prefill")
    first = int(np.argmax(ctx.get_logits()[0]))
    n_prompt = len(prompt_tokens)

    slots_flat = ctx.meta.find_slots(n_steps)
    if slots_flat is None:
        raise RuntimeError("KV cache full for generation")
    slots = slots_flat.reshape(n_steps, 1)
    pos = np.arange(n_prompt, n_prompt + n_steps, dtype=np.int32)
    ctx.meta.commit(slots_flat, pos, np.full(n_steps, seq_id, np.int32))

    # attention span: bucketed live prefix (covers prompt + reserved slots)
    span = ctx.meta.used_span()
    n_vis = next((b for b in getattr(ctx, "_vis_buckets", (ctx.n_cells,))
                  if b >= span), ctx.n_cells)

    out_tokens, cache, cell_pos, cell_seq, _ = generate_loop(
        ctx.params, ctx.cfg, ctx.cache,
        jnp.asarray(ctx.meta.pos[:n_vis]), jnp.asarray(ctx.meta.seq[:n_vis]),
        jnp.asarray([first], jnp.int32), jnp.asarray([n_prompt], jnp.int32),
        jnp.asarray([seq_id], jnp.int32), jnp.asarray(slots),
        n_steps, sp, ctx.compute_dtype,
    )
    ctx.cache = cache
    return [first] + [int(t) for t in np.asarray(out_tokens[:, 0])][:-1]
