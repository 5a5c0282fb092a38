"""Grouped (top-k routed) MoE feed-forward — the TPU-native analogue of
the reference's ggml_mul_mat_id path (llm_build_moe_ffn + mul_mat_id,
reference src/llama.cpp:8725-8824).

The reference gathers each token's k routed experts' rows on the fly; a
dense sweep (compute every expert, weight non-routed tokens 0) is
XLA-friendly but wastes O(n_expert / k) FLOPs and weight traffic — arctic
(128 experts) is unservable that way.  TPU-native redesign:

1. Flatten routing to nt*k (token, expert) slots and sort the slots by
   expert id (jnp.argsort — static shapes, on device).
2. Run the three FFN matmuls as ragged grouped GEMMs
   (jax.lax.ragged_dot_general): contiguous token groups hit their
   expert's weight block, XLA's TPU lowering reads each routed expert's
   weights once and computes only the routed tokens' FLOPs.
3. Unsort and combine with the routing weights.

Exact — no capacity factor, no token dropping (parity with mul_mat_id
semantics).  Used for stacked dense expert weights [E, n, k].

Quantized experts (stacked QTensors) use `moe_gathered_quant` on decode:
gather only the routed slots' packed codes/scales from the [E, ...]
stacks (a DMA of k/E of the expert bytes — the reference mul_mat_id's
access pattern, src/llama.cpp:8725), vmapped-dequantize, and batched
per-slot dots.  Chosen over a scalar-prefetch Pallas kernel deliberately:
prefetched block indices defeat Mosaic pipelining (round-1 qmm_stacked
measurement, ~20x slower — see TODO.md).  The dense sweep remains for
small expert counts where reading everything beats the gather copies.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from jax import lax


def _ragged(lhs: jnp.ndarray, rhs_stacked: jnp.ndarray,
            group_sizes: jnp.ndarray) -> jnp.ndarray:
    """lhs [S, k] x rhs [E, n, k] (per-group x @ w.T) -> [S, n] f32."""
    dn = lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (2,)), ((), ())),
        lhs_ragged_dimensions=[0],
        rhs_group_dimensions=[0],
    )
    return lax.ragged_dot_general(
        lhs, rhs_stacked, group_sizes, dn,
        preferred_element_type=jnp.float32,
    )


def moe_grouped_ffn(
    x: jnp.ndarray,            # [nt, d] (compute dtype)
    w_gate: jnp.ndarray,       # [E, f, d]
    w_up: jnp.ndarray,         # [E, f, d]
    w_down: jnp.ndarray,       # [E, d, f]
    top_i: jnp.ndarray,        # [nt, k] int expert ids
    top_w: jnp.ndarray,        # [nt, k] f32 routing weights
    act: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Routed gated FFN; returns [nt, d] f32 (combined over the k experts).

    Matches the dense sweep bit-for-close: matmuls in the weights' dtype
    with f32 accumulation, activation in f32.
    """
    nt, k = top_i.shape
    E = w_gate.shape[0]
    S = nt * k

    ids = top_i.reshape(S)
    order = jnp.argsort(ids)                       # stable: ties keep token order
    ids_sorted = ids[order]
    xs = x[order // k]                             # [S, d] gathered per slot
    group_sizes = jnp.zeros((E,), jnp.int32).at[ids_sorted].add(1)

    gate = _ragged(xs, w_gate, group_sizes)        # [S, f] f32
    up = _ragged(xs, w_up, group_sizes)
    ffn = (act(gate) * up).astype(x.dtype)
    y_sorted = _ragged(ffn, w_down, group_sizes)   # [S, d] f32

    y = jnp.zeros_like(y_sorted).at[order].set(y_sorted)  # unsort
    y = y.reshape(nt, k, -1)
    return jnp.sum(top_w[..., None] * y, axis=1)   # [nt, d] f32


def _gather_dequant(qt, sel: jnp.ndarray, dtype) -> jnp.ndarray:
    """Stacked QTensor [E, ...] + slot expert ids [S] -> dequantized
    weights [S, n, k] in `dtype` (reads only the selected experts' bytes)."""
    from llama_kotlin_tpu.quant.qtensor import dequantize

    sub = jax.tree.map(lambda a: a[sel], qt)  # leading axis E -> S
    return jax.vmap(lambda q: dequantize(q, dtype))(sub)


def moe_gathered_quant(
    x: jnp.ndarray,            # [nt, d] (compute dtype)
    qt_gate, qt_up, qt_down,   # stacked QTensors [E, ...]
    top_i: jnp.ndarray,        # [nt, k]
    top_w: jnp.ndarray,        # [nt, k] f32
    act: Callable[[jnp.ndarray], jnp.ndarray],
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Routed gated FFN over quantized expert stacks; returns [nt, d] f32.

    Decode-shaped: per (token, expert) slot, gather that expert's packed
    weights and run a single batched einsum per projection — weight bytes
    touched scale with k, not n_expert."""
    nt, k = top_i.shape
    S = nt * k
    sel = top_i.reshape(S)
    xs = jnp.repeat(x.astype(compute_dtype), k, axis=0)  # [S, d] slot inputs

    wg = _gather_dequant(qt_gate, sel, compute_dtype)    # [S, f, d]
    wu = _gather_dequant(qt_up, sel, compute_dtype)
    gate = jnp.einsum("sd,sfd->sf", xs, wg, preferred_element_type=jnp.float32)
    up = jnp.einsum("sd,sfd->sf", xs, wu, preferred_element_type=jnp.float32)
    ffn = (act(gate) * up).astype(compute_dtype)         # [S, f]
    wd = _gather_dequant(qt_down, sel, compute_dtype)    # [S, d, f]
    y = jnp.einsum("sf,sdf->sd", ffn, wd, preferred_element_type=jnp.float32)
    y = y.reshape(nt, k, -1)
    return jnp.sum(top_w[..., None] * y, axis=1)         # [nt, d] f32
