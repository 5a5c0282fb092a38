"""Mamba (selective SSM) forward pass + recurrent-state context.

Parity target: llm_build_mamba + ggml_ssm_conv / ggml_ssm_scan (reference
src/llama.cpp:7594, ggml/src/ggml.c:16340): per layer
    x, z = split(in_proj(norm(h)))
    x = silu(causal depthwise conv1d(x))         (conv state carried)
    dt, B, C = split(x_proj(x)); dt = softplus(dt_proj(dt) + bias)
    state = state * exp(dt A) + B (x dt);  y = C·state + D x   (ssm state)
    h += out_proj(y * silu(z))

TPU mapping: the time recurrence is a lax.scan (the "SSM_SCAN" op), the
depthwise conv is d_conv shifted multiply-adds, and the whole stack jits
into one program.  Recurrent state replaces the KV cache: per sequence
conv [d_inner, d_conv-1] and ssm [d_inner, d_state] tensors per layer
(cf. the reference (ab)using kv cells to store states).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.ops.norms import rms_norm
from llama_kotlin_tpu.ops.qmatmul import qmatmul, take_rows


class MambaState(NamedTuple):
    conv: jnp.ndarray  # [n_layer, B, d_inner, d_conv-1]
    ssm: jnp.ndarray  # [n_layer, B, d_inner, d_state]

    @staticmethod
    def create(cfg: ModelConfig, batch: int = 1, dtype=jnp.float32) -> "MambaState":
        e = cfg.extra
        return MambaState(
            conv=jnp.zeros((cfg.n_layer, batch, e["ssm_d_inner"],
                            e["ssm_d_conv"] - 1), dtype),
            ssm=jnp.zeros((cfg.n_layer, batch, e["ssm_d_inner"],
                           e["ssm_d_state"]), dtype),
        )


def _softplus(x):
    # dt <= 20 ? log1p(exp(dt)) : dt — the reference's overflow guard
    return jnp.where(x <= 20.0, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))), x)


def _layer(cfg: ModelConfig, lp: dict, h, conv_state, ssm_state, compute_dtype):
    """One mamba block over [B, T, E]; returns (h, conv_state, ssm_state)."""
    e = cfg.extra
    d_conv, d_inner = e["ssm_d_conv"], e["ssm_d_inner"]
    d_state, dt_rank = e["ssm_d_state"], e["ssm_dt_rank"]
    B_, T, E = h.shape

    x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
    xz = qmatmul(x.reshape(B_ * T, E), lp["ssm_in"], compute_dtype=compute_dtype)
    xz = xz.reshape(B_, T, 2 * d_inner).astype(jnp.float32)
    xp, z = xz[..., :d_inner], xz[..., d_inner:]

    # causal depthwise conv over time: d_conv shifted multiply-adds
    conv_in = jnp.concatenate([conv_state, xp.swapaxes(1, 2)], axis=-1)
    new_conv = conv_in[..., T:]
    w = lp["ssm_conv1d"].astype(jnp.float32)  # [d_inner, d_conv]
    xc = sum(conv_in[:, :, k : k + T] * w[None, :, k, None] for k in range(d_conv))
    xc = xc + lp["ssm_conv1d_b"].astype(jnp.float32)[None, :, None]
    xc = (xc * jax.nn.sigmoid(xc)).swapaxes(1, 2)  # silu -> [B, T, d_inner]

    x_db = qmatmul(xc.reshape(B_ * T, d_inner).astype(compute_dtype), lp["ssm_x"],
                   compute_dtype=compute_dtype)
    x_db = x_db.reshape(B_, T, dt_rank + 2 * d_state).astype(jnp.float32)
    dt_in = x_db[..., :dt_rank]
    Bc = x_db[..., dt_rank : dt_rank + d_state]
    Cc = x_db[..., dt_rank + d_state :]
    if e.get("ssm_dt_b_c_rms"):  # falcon-mamba
        one = jnp.ones((), jnp.float32)
        dt_in = rms_norm(dt_in, one, cfg.rms_eps)
        Bc = rms_norm(Bc, one, cfg.rms_eps)
        Cc = rms_norm(Cc, one, cfg.rms_eps)

    dt = qmatmul(dt_in.reshape(B_ * T, dt_rank).astype(compute_dtype), lp["ssm_dt"],
                 compute_dtype=compute_dtype).reshape(B_, T, d_inner)
    dt = _softplus(dt.astype(jnp.float32) + lp["ssm_dt_b"].astype(jnp.float32))

    A = lp["ssm_a"].astype(jnp.float32)  # [d_inner, d_state] (negative values)
    x_dt = xc.astype(jnp.float32) * dt  # [B, T, d_inner]
    dA = jnp.exp(dt[..., None] * A[None, None])  # [B, T, d_inner, d_state]
    dBx = Bc[:, :, None, :] * x_dt[..., None]  # [B, T, d_inner, d_state]

    def scan_step(state, inp):
        dA_t, dBx_t, C_t = inp
        state = state * dA_t + dBx_t  # [B, d_inner, d_state]
        y_t = jnp.einsum("bis,bs->bi", state, C_t)
        return state, y_t

    new_ssm, y = jax.lax.scan(
        scan_step, ssm_state,
        (dA.swapaxes(0, 1), dBx.swapaxes(0, 1), Cc.swapaxes(0, 1)),
    )
    y = y.swapaxes(0, 1)  # [B, T, d_inner]
    y = y + xc.astype(jnp.float32) * lp["ssm_d"].astype(jnp.float32)
    y = y * (z * jax.nn.sigmoid(z))
    out = qmatmul(y.reshape(B_ * T, d_inner).astype(compute_dtype), lp["ssm_out"],
                  compute_dtype=compute_dtype).reshape(B_, T, E)
    return h + out.astype(h.dtype), new_conv, new_ssm


def mamba_forward(params, cfg: ModelConfig, tokens, state: MambaState,
                  *, compute_dtype=jnp.float32):
    """tokens [B, T] -> (logits [B, T, vocab] f32, new MambaState)."""
    B_, T = tokens.shape
    h = take_rows(params["tok_embd"], tokens.reshape(-1), dtype=compute_dtype)
    h = h.reshape(B_, T, -1)
    convs, ssms = [], []
    for i, lp in enumerate(params["layers"]):
        h, c, s = _layer(cfg, lp, h, state.conv[i], state.ssm[i], compute_dtype)
        convs.append(c)
        ssms.append(s)
    h = rms_norm(h, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["tok_embd"]
    E = h.shape[-1]
    logits = qmatmul(h.reshape(B_ * T, E), out_w, compute_dtype=compute_dtype)
    logits = logits.reshape(B_, T, -1).astype(jnp.float32)
    return logits, MambaState(conv=jnp.stack(convs), ssm=jnp.stack(ssms))


class MambaContext:
    """Minimal recurrent-state decode driver (single or batched seqs).

    The state replaces the KV cache; decode() appends tokens and returns
    the logits of the last position.  clear() resets the recurrence.
    """

    def __init__(self, cfg: ModelConfig, params: dict, batch: int = 1,
                 compute_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.batch = batch
        self.compute_dtype = compute_dtype
        self.state = MambaState.create(cfg, batch)
        self._fwd = jax.jit(
            lambda p, t, s: mamba_forward(p, cfg, t, s,
                                          compute_dtype=compute_dtype)
        )
        self._logits = None

    def clear(self) -> None:
        self.state = MambaState.create(self.cfg, self.batch)

    def decode(self, tokens) -> int:
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim == 1:
            tokens = tokens[None]
        logits, self.state = self._fwd(self.params, jnp.asarray(tokens), self.state)
        self._logits = logits
        return 0

    def get_logits(self) -> np.ndarray:
        """[B, T, vocab] logits of the last decode."""
        return np.asarray(self._logits)

    def generate(self, prompt, n_steps: int) -> list[int]:
        self.decode(np.asarray(prompt, np.int32))
        out = [int(self.get_logits()[0, -1].argmax())]
        for _ in range(n_steps - 1):
            self.decode(np.array([out[-1]], np.int32))
            out.append(int(self.get_logits()[0, -1].argmax()))
        return out
