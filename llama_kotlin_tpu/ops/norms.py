"""Normalization ops (cf. reference llm_build_norm, src/llama.cpp:8566).

Computed in f32 regardless of input dtype (the reference computes norms in
f32 too), cast back to the input dtype at the end.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5,
             offset: float = 0.0) -> jnp.ndarray:
    """RMSNorm: x / rms(x) * (weight + offset).

    `offset=1.0` reproduces Gemma's (1 + w) convention.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * (1.0 / jnp.sqrt(var + eps))
    y = y * (weight.astype(jnp.float32) + offset)
    return y.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray | None,
               bias: jnp.ndarray | None = None, eps: float = 1e-5) -> jnp.ndarray:
    """weight=None gives the non-parametric LayerNorm OLMo uses
    (llm_build_norm with NULL mul/add tensors)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * (1.0 / jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
