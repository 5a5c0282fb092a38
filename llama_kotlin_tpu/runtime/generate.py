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
    """On-device sampling parameters (greedy when temp == 0).

    Mirrors the default sampler-chain order (common/sampling.cpp:230-264:
    penalties -> top_k -> top_p -> min_p -> temperature -> dist).  top_p /
    min_p operate on a static top-candidate window: exact when top_k > 0
    (top_k runs first in the default chain); with top_k == 0 the window is
    CAND_CAP — tokens beyond the top-512 carry negligible mass for any
    realistic top_p (the engine only routes eligible configs here).
    """

    temp: float = 0.0
    top_k: int = 0  # 0 = off
    seed: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    penalty_last_n: int = 0  # 0 = penalties off
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    nl_token: int = -1  # restore this token's logit (penalize_nl=False)

    @property
    def use_penalties(self) -> bool:
        return self.penalty_last_n > 0 and (
            self.penalty_repeat != 1.0 or self.penalty_freq != 0.0
            or self.penalty_present != 0.0)


CAND_CAP = 512  # top-candidate window for device top_p/min_p with top_k=0


def _sample(logits: jnp.ndarray, sp: SampleParams, key,
            counts: Optional[jnp.ndarray] = None,
            spv: Optional[dict] = None,
            pos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """logits [B, V] -> token ids [B].  counts [B, V] = occurrence counts
    over the penalty window (parity: llama_sample_repetition_penalties).

    spv (per-slot sampling arrays: temp/top_k/top_p/min_p [B]) selects the
    mixed-config path: one static candidate window sp.top_k (the max over
    slots), per-slot masks inside it, greedy rows via argmax — so the
    server's chunked decode can batch requests with different sampling
    configs in one loop.  Penalty config stays shared (scalar).

    pos [B] (optional, spv path): each row's absolute decode position is
    folded into its per-seed key, so a request's draw at position p is a
    pure function of (its seed, p) — consecutive chunked generate_loop
    calls never reuse a position's draws (the reference's persistent
    per-sampler RNG has the same across-the-generation property)."""
    logits = logits.astype(jnp.float32)
    if sp.use_penalties and counts is not None:
        orig = logits
        seen = counts > 0
        if sp.penalty_repeat != 1.0:
            pen = jnp.where(logits > 0, logits / sp.penalty_repeat,
                            logits * sp.penalty_repeat)
            logits = jnp.where(seen, pen, logits)
        logits = logits - counts * sp.penalty_freq \
            - seen.astype(jnp.float32) * sp.penalty_present
        if sp.nl_token >= 0:  # penalize_nl=False keeps newline unpenalized
            logits = logits.at[:, sp.nl_token].set(orig[:, sp.nl_token])
    V = logits.shape[-1]
    if spv is not None:
        cap = min(max(int(sp.top_k), 1), V)
        vals, idx = jax.lax.top_k(logits, cap)  # [B, cap] sorted desc
        kcap = jnp.where(spv["top_k"] > 0, spv["top_k"], cap)[:, None]
        keep = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) < kcap
        probs = jax.nn.softmax(jnp.where(keep, vals, -jnp.inf), axis=-1)
        cum_excl = jnp.cumsum(probs, axis=-1) - probs
        keep &= cum_excl < spv["top_p"][:, None]
        keep &= probs >= spv["min_p"][:, None] * probs[:, :1]
        safe_t = jnp.maximum(spv["temp"], 1e-6)[:, None]
        scaled = jnp.where(keep, vals / safe_t, -jnp.inf)
        if "seed" in spv:
            # per-slot seeds: each request's draws depend only on its own
            # (seed, absolute position), not on batch composition or on
            # which chunk the position lands in
            if pos is not None:
                keys = jax.vmap(lambda s, p: jax.random.fold_in(
                    jax.random.fold_in(key, s), p))(spv["seed"], pos)
            else:
                keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(spv["seed"])
            choice = jax.vmap(jax.random.categorical)(keys, scaled)
        else:
            choice = jax.random.categorical(key, scaled, axis=-1)
        sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
        greedy = jnp.argmax(logits, axis=-1)
        return jnp.where(spv["temp"] <= 0.0, greedy, sampled).astype(jnp.int32)
    if sp.temp <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if sp.top_k <= 0 and sp.top_p >= 1.0 and sp.min_p <= 0.0:
        # pure temperature: full-vocab categorical
        return jax.random.categorical(key, logits / sp.temp, axis=-1).astype(jnp.int32)
    cap = min(sp.top_k, V) if sp.top_k > 0 else min(CAND_CAP, V)
    vals, idx = jax.lax.top_k(logits, cap)  # [B, cap] sorted desc
    keep = jnp.ones_like(vals, bool)
    if sp.top_p < 1.0:
        probs = jax.nn.softmax(vals, axis=-1)
        cum_excl = jnp.cumsum(probs, axis=-1) - probs
        keep &= cum_excl < sp.top_p  # smallest set with cumsum >= top_p
    if sp.min_p > 0.0:
        probs = jax.nn.softmax(vals, axis=-1)
        keep &= probs >= sp.min_p * probs[:, :1]
    scaled = jnp.where(keep, vals / sp.temp, -jnp.inf)
    choice = jax.random.categorical(key, scaled, axis=-1)  # [B] in [0, cap)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("sp", "use_mask", "use_pen"))
def sample_rows(
    logits: jnp.ndarray,  # [R, V] (device-resident, last decode's rows)
    row_ids: jnp.ndarray,  # [n] indices into R
    mask_bits: jnp.ndarray,  # [n, ceil(V/8)] u8 little-bit-order; dummy if !use_mask
    pen_window: jnp.ndarray,  # [n, last_n] i32 (-1 = empty); dummy if !use_pen
    spv: dict,  # per-row sampling arrays incl. "seed" (see _sample)
    pos: jnp.ndarray,  # [n] absolute sampling positions (key folding)
    sp: SampleParams,
    use_mask: bool,
    use_pen: bool,
):
    """Device-side sampling over rows of an existing logits array, with an
    optional per-row vocab bitmask (grammar-legal tokens) applied first.

    The per-token constrained-decode path otherwise downloads [n, V] f32
    logits to the host every step (~128 KB/row at 32k vocab — the dominant
    cost through a remote-device link); with the host grammar mask packed
    to V/8 bytes and UPLOADED instead, only the sampled ids ([n] i32) cross
    the link.  Masking happens before the candidate window so a token the
    grammar forces is always reachable even outside the top-k.
    Reference analogue: llama_sample_grammar applies the same legality
    filter before the chain (common/sampling.cpp).
    """
    lg = logits[row_ids].astype(jnp.float32)  # [n, V]
    V = lg.shape[-1]
    if use_mask:
        bits = (mask_bits[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        allow = bits.reshape(mask_bits.shape[0], -1)[:, :V] != 0
        lg = jnp.where(allow, lg, NEG_INF)
    counts = None
    if use_pen:
        n, Ln = pen_window.shape
        rows = jnp.arange(n)
        counts = jnp.zeros((n, V), jnp.float32)
        valid = pen_window >= 0
        counts = counts.at[rows[:, None], jnp.maximum(pen_window, 0)].add(
            valid.astype(jnp.float32))
    key0 = jax.random.PRNGKey(0)  # per-row seeds folded in _sample
    return _sample(lg, sp, key0, counts, spv=spv, pos=pos)


NEG_INF = -1e30


from llama_kotlin_tpu.utils.profiling import compiler_opts as _copts


@partial(jax.jit, static_argnames=("cfg", "n_steps", "compute_dtype", "sp"),
         donate_argnames=("cache",), compiler_options=_copts())
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
    pen_window: Optional[jnp.ndarray] = None,  # [B, last_n] i32, -1 = empty
    spv: Optional[dict] = None,  # per-slot sampling arrays [B] (see _sample)
    seed: Optional[jnp.ndarray] = None,  # traced scalar seed (no retrace per value)
):
    """Decode n_steps tokens for B sequences entirely on device.

    Returns (out_tokens [n_steps, B], cache, cell_pos, cell_seq,
    last_logits [B, V]).

    pen_window carries the host sampler's recent tokens when sp enables
    penalties: empty (-1) columns first, then history oldest-first, so the
    ring pointer starting at column 0 evicts empties before real tokens.
    Occurrence counts are derived on device and maintained across steps.

    Seeding: `seed` (traced) or sp.seed (static) gives the base key; each
    step's subkey folds in the ABSOLUTE decode position (pos[0], or each
    row's own pos on the per-slot-seed path), so a position's draws are
    unique across consecutive chunked calls (no period-K reuse) and, with
    spv["seed"], a request's tokens are a pure function of (own seed, own
    positions) — reproducible regardless of batch composition.
    """
    B = tokens0.shape[0]
    out_ids = jnp.arange(B, dtype=jnp.int32)
    if spv is not None and "seed" in spv:
        key0 = jax.random.PRNGKey(0)  # per-row seeds folded in _sample
    elif seed is not None:
        key0 = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
    else:
        key0 = jax.random.PRNGKey(sp.seed)
    rows = jnp.arange(B)

    use_pen = sp.use_penalties and pen_window is not None
    if use_pen:
        counts0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
        valid = pen_window >= 0
        counts0 = counts0.at[rows[:, None], jnp.maximum(pen_window, 0)].add(
            valid.astype(jnp.float32))
        ptr0 = jnp.int32(0)  # oldest entry (host rotates the window to 0)
        Ln = pen_window.shape[1]
    else:
        counts0 = jnp.zeros((B, 1), jnp.float32)
        pen_window = jnp.zeros((B, 1), jnp.int32)
        ptr0 = jnp.int32(0)
        Ln = 1

    per_row_seeds = spv is not None and "seed" in spv

    def body(i, carry):
        (tokens, pos, cache, cell_pos, cell_seq, out_tokens, logits_prev,
         counts, window, ptr) = carry
        step_slots = slots[i]
        cell_pos = cell_pos.at[step_slots].set(pos)
        cell_seq = cell_seq.at[step_slots].set(
            (1 << seq_ids).astype(cell_seq.dtype)
        )
        logits, cache, _embd = llama_model.forward(
            params, cfg, tokens, pos, seq_ids, step_slots, cache,
            cell_pos, cell_seq, out_ids, compute_dtype=compute_dtype,
        )
        if per_row_seeds:
            # base key stays constant; _sample folds (seed_r, pos_r) per row
            next_tokens = _sample(logits, sp, key0, counts if use_pen else None,
                                  spv=spv, pos=pos)
        else:
            sub = jax.random.fold_in(key0, pos[0])
            next_tokens = _sample(logits, sp, sub, counts if use_pen else None,
                                  spv=spv)
        out_tokens = out_tokens.at[i].set(next_tokens)
        if use_pen:
            evicted = window[:, ptr % Ln]
            counts = counts.at[rows, jnp.maximum(evicted, 0)].add(
                -(evicted >= 0).astype(jnp.float32))
            counts = counts.at[rows, next_tokens].add(1.0)
            window = window.at[:, ptr % Ln].set(next_tokens)
            ptr = ptr + 1
        return (next_tokens, pos + 1, cache, cell_pos, cell_seq, out_tokens,
                logits, counts, window, ptr)

    out_tokens = jnp.zeros((n_steps, B), jnp.int32)
    logits0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    carry = (tokens0, pos0, cache, cell_pos, cell_seq, out_tokens, logits0,
             counts0, pen_window, ptr0)
    (tokens, pos, cache, cell_pos, cell_seq, out_tokens, logits, _c, _w,
     _p) = jax.lax.fori_loop(0, n_steps, body, carry)
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
    # the first generated token honours sp too (it used to be argmax
    # regardless of temperature/seed)
    n_prompt = len(prompt_tokens)
    # fold the sampling position (last prompt token's pos) — consistent
    # with the loop's per-position keys and disjoint from them (>= n_prompt)
    first = int(np.asarray(_sample(
        jnp.asarray(ctx.get_logits()[:1]), sp,
        jax.random.fold_in(jax.random.PRNGKey(sp.seed), n_prompt - 1))[0]))

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
        *ctx.meta.device_view(n_vis),
        jnp.asarray([first], jnp.int32), jnp.asarray([n_prompt], jnp.int32),
        jnp.asarray([seq_id], jnp.int32), jnp.asarray(slots),
        n_steps, sp, ctx.compute_dtype,
    )
    ctx.cache = cache
    return [first] + [int(t) for t in np.asarray(out_tokens[:, 0])][:-1]
