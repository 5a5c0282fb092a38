"""FFN activation helpers (cf. reference llm_build_ffn, src/llama.cpp:8598).

Supports the gate types used across the arch zoo: SILU (llama), GELU
(gemma/starcoder), RELU, RELU^2 (nomic), SWIGLU variants with parallel or
sequential gating.
"""

from __future__ import annotations

import jax.numpy as jnp


def silu(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * (1.0 / (1.0 + jnp.exp(-xf)))).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # tanh approximation, matching ggml_gelu's table-backed tanh formula
    xf = x.astype(jnp.float32)
    c = 0.79788456080286535587989211986876  # sqrt(2/pi)
    y = 0.5 * xf * (1.0 + jnp.tanh(c * xf * (1.0 + 0.044715 * xf * xf)))
    return y.astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def relu_squared(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.maximum(x, 0)
    return r * r


ACTIVATIONS = {
    "silu": silu,
    "gelu": gelu,
    "relu": relu,
    "relu2": relu_squared,
}
