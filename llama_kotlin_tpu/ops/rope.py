"""Rotary position embeddings.

Parity target: ``ggml_rope_ext`` (reference ggml/src/ggml.c, rope_yarn /
ggml_rope_yarn_corr_dims) with both rotation modes:

- NORM  — rotate adjacent pairs (x[2i], x[2i+1]); used by llama-family
  models converted from the original Meta layout (GGUF keeps it).
- NEOX  — rotate split halves (x[i], x[i + n_rot/2]); GPT-NeoX-style,
  used by Falcon/Qwen/Phi/StableLM etc.

Supports linear scaling (freq_scale), YaRN (ext_factor/attn_factor/
beta_fast/beta_slow over original context length) and per-dimension
frequency factors (rope_freqs tensors, e.g. Llama-3.1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp


ROPE_TYPE_NONE = -1
ROPE_TYPE_NORM = 0
ROPE_TYPE_NEOX = 2


@dataclass(frozen=True)
class RopeParams:
    n_rot: int  # rotary dims (<= head_dim)
    rope_type: int = ROPE_TYPE_NORM
    freq_base: float = 10000.0
    freq_scale: float = 1.0
    ext_factor: float = 0.0  # YaRN extrapolation mix (0 = off)
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_ctx_orig: int = 0  # original training context (YaRN)


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def _yarn_corr_dims(n_dims: int, n_ctx_orig: int, freq_base: float,
                    beta_fast: float, beta_slow: float) -> tuple[float, float]:
    start = math.floor(_yarn_corr_dim(n_dims, n_ctx_orig, beta_fast, freq_base))
    end = math.ceil(_yarn_corr_dim(n_dims, n_ctx_orig, beta_slow, freq_base))
    return max(0.0, start), min(n_dims - 1.0, end)


def rope_cos_sin(pos: jnp.ndarray, p: RopeParams,
                 freq_factors: Optional[jnp.ndarray] = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [*pos.shape, n_rot // 2] in f32."""
    half = p.n_rot // 2
    dim_idx = jnp.arange(half, dtype=jnp.float32)  # pair index i0/2
    theta_scale = p.freq_base ** (-2.0 / p.n_rot)
    inv_freq = theta_scale ** dim_idx  # = freq_base^(-2*(i0/2)/n_rot)
    if freq_factors is not None:
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)
    theta_extrap = pos.astype(jnp.float32)[..., None] * inv_freq
    theta_interp = p.freq_scale * theta_extrap
    mscale = p.attn_factor
    if p.ext_factor != 0.0:
        low, high = _yarn_corr_dims(p.n_rot, p.n_ctx_orig or 1, p.freq_base,
                                    p.beta_fast, p.beta_slow)
        ramp_y = (dim_idx - low) / max(0.001, high - low)
        ramp = 1.0 - jnp.clip(ramp_y, 0.0, 1.0)
        mix = ramp * p.ext_factor
        theta = theta_interp * (1.0 - mix) + theta_extrap * mix
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / p.freq_scale))
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def apply_rope(x: jnp.ndarray, pos: jnp.ndarray, p: RopeParams,
               freq_factors: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Rotate `x` [..., n_tokens, n_heads, head_dim] by positions `pos` [..., n_tokens].

    Dims beyond n_rot pass through unchanged (partial-rotary models).
    """
    if p.rope_type == ROPE_TYPE_NONE:
        return x
    dtype = x.dtype
    half = p.n_rot // 2
    cos, sin = rope_cos_sin(pos, p, freq_factors)  # [..., nt, half]
    cos = cos[..., :, None, :]  # broadcast over heads
    sin = sin[..., :, None, :]
    rot = x[..., : p.n_rot].astype(jnp.float32)
    rest = x[..., p.n_rot :]
    if p.rope_type == ROPE_TYPE_NEOX:
        a = rot[..., :half]
        b = rot[..., half:]
        out = jnp.concatenate([a * cos - b * sin, a * sin + b * cos], axis=-1)
    else:  # NORM: adjacent pairs
        a = rot[..., 0::2]
        b = rot[..., 1::2]
        ra = a * cos - b * sin
        rb = a * sin + b * cos
        out = jnp.stack([ra, rb], axis=-1).reshape(rot.shape)
    return jnp.concatenate([out.astype(dtype), rest], axis=-1) if rest.size else out.astype(dtype)
