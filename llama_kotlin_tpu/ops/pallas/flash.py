"""Flash attention over the unified cell cache (Pallas TPU).

Computes the same masked GQA attention as ops/attention.py's reference
(the TPU-native analogue of llm_build_kqv's ggml_flash_attn_ext path,
reference src/llama.cpp:8826) without materialising [nt, cells] scores in
HBM: online-softmax accumulation over cell tiles.

Shapes: q [nt, H, D], k/v [KV, cells, D] (head-major cache layout),
mask int8/bool [nt, cells].  Grid (head, cell_tile); the q block and the
f32 accumulator live in VMEM across the cell sweep.  GQA maps query head
h to kv head h // (H // KV) in the k/v index maps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, acc_ref, m_ref, l_ref,
            *, scale, logit_softcap, n_ctiles):
    c_i = pl.program_id(1)

    @pl.when(c_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)  # [nt, D]
    k = k_ref[0].astype(jnp.float32)  # [Ct, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [nt, Ct]
    if logit_softcap > 0.0:
        s = jnp.tanh(s / logit_softcap) * logit_softcap
    visible = mask_ref[...] != 0
    s = jnp.where(visible, s, NEG_INF)

    m_prev = m_ref[...]  # [nt, 128] replicated stats
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [nt, 1]
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)  # [nt, 128]
    p = jnp.exp(s - m_new[:, :1])  # [nt, Ct]
    p = jnp.where(visible, p, 0.0)
    l_ref[...] = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_new
    v = v_ref[0].astype(jnp.float32)  # [Ct, D]
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [nt, D]
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[-1]] + pv

    @pl.when(c_i == n_ctiles - 1)
    def _final():
        l = l_ref[...][:, : acc_ref.shape[-1]]
        safe = jnp.where(l > 0.0, l, 1.0)
        out_ref[0] = (acc_ref[...] / safe).astype(out_ref.dtype)


def flash_attention(q, k, v, mask, *, scale: float, logit_softcap: float = 0.0,
                    interpret: bool = False) -> Optional[jnp.ndarray]:
    """q [nt, H, D], k/v [KV, cells, D], mask [nt, cells] -> [nt, H, D]."""
    nt, h, d = q.shape
    kv, cells, _ = k.shape
    if h % kv != 0 or d not in (64, 128) or nt % 8 != 0:
        return None
    rep = h // kv
    ct = next((c for c in (512, 256, 128) if cells % c == 0), 0)
    if ct == 0:
        return None
    n_ctiles = cells // ct

    qh = q.swapaxes(0, 1)  # [H, nt, D]
    mask_i8 = mask.astype(jnp.int8) if mask.dtype != jnp.int8 else mask

    grid = (h, n_ctiles)
    out = pl.pallas_call(
        lambda *refs: _kernel(*refs, scale=scale, logit_softcap=logit_softcap,
                              n_ctiles=n_ctiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nt, d), (lambda hi, ci: (hi, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, d), (lambda hi, ci: (hi // rep, ci, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, d), (lambda hi, ci: (hi // rep, ci, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, ct), (lambda hi, ci: (0, ci)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nt, d), (lambda hi, ci: (hi, 0, 0)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, nt, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nt, d), jnp.float32),
            pltpu.VMEM((nt, 128), jnp.float32),
            pltpu.VMEM((nt, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qh, k, v, mask_i8)
    return out.swapaxes(0, 1)


def flash_attention_or_none(q, k, v, mask, *, scale, logit_softcap=0.0):
    try:
        return flash_attention(q, k, v, mask, scale=scale, logit_softcap=logit_softcap)
    except Exception:
        return None
