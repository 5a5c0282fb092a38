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
semantics).  Used for stacked dense expert weights [E, n, k]; quantized
per-expert QTensors fall back to the dense sweep in models/llama.py.
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
