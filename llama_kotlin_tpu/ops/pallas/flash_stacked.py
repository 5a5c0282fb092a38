"""Stacked-layer flash attention: reads the whole-cache [L, KV, cells, D]
operand with the layer selected inside BlockSpecs (scalar prefetch), and
merges the current ubatch's freshly-computed K/V rows in the final grid
step — so the KV cache never has to be carried (and copied) through
lax.scan, and the per-layer scatter happens once outside the scan.

Online-softmax over cell tiles, then one extra merge of the [nt] new
rows with their own visibility mask (the new tokens' cache cells are
excluded from `mask_cells` by the caller).

Supports the same two cache extensions as ops/pallas/flash.py:
`n_vis` bounds the cell sweep to the bucketed live prefix, and int8
quantized K/V caches ride their per-row scales into the score /
probability tiles (the fresh rows stay float — they were computed this
step).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(L_ref, q_ref, k_ref, v_ref, mask_ref, kn_ref, vn_ref, mask_new_ref,
            *rest, scale, logit_softcap, n_ctiles, quantized):
    if quantized:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = rest
    else:
        out_ref, acc_ref, m_ref, l_ref = rest
    c_i = pl.program_id(1)

    @pl.when(c_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)  # [nt, D]

    def online_update(s, visible, v_tile, v_colscale=None):
        """Merge one score tile [nt, C] + value tile [C, D] into the
        running softmax stats."""
        if logit_softcap > 0.0:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        s = jnp.where(visible, s, NEG_INF)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])
        p = jnp.where(visible, p, 0.0)
        l_ref[...] = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_ref[...] = m_new
        if v_colscale is not None:  # per-cell V scales fold into the probs
            p = p * v_colscale
        pv = jax.lax.dot_general(
            p, v_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[-1]] + pv

    k = k_ref[0, 0].astype(jnp.float32)  # [Ct, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if quantized:
        s = s * ks_ref[0, 0][None, :]
        online_update(s, mask_ref[...] != 0, v_ref[0, 0].astype(jnp.float32),
                      v_colscale=vs_ref[0, 0][None, :])
    else:
        online_update(s, mask_ref[...] != 0, v_ref[0, 0].astype(jnp.float32))

    @pl.when(c_i == n_ctiles - 1)
    def _merge_new_and_finalize():
        kn = kn_ref[0].astype(jnp.float32)  # [nt, D]
        sn = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        online_update(sn, mask_new_ref[...] != 0, vn_ref[0].astype(jnp.float32))
        l = l_ref[...][:, : acc_ref.shape[-1]]
        safe = jnp.where(l > 0.0, l, 1.0)
        out_ref[0] = (acc_ref[...] / safe).astype(out_ref.dtype)


def flash_attention_stacked(q, k_stacked, v_stacked, layer, new_k, new_v,
                            mask_cells, mask_new, *, scale: float,
                            logit_softcap: float = 0.0,
                            k_scale=None, v_scale=None,
                            n_vis: Optional[int] = None,
                            interpret: bool = False) -> Optional[jnp.ndarray]:
    """q [nt, H, D]; k/v_stacked [L, KV, cells, D]; layer scalar;
    new_k/new_v [nt, KV, D]; mask_cells [nt, n_vis]; mask_new [nt, nt].
    Returns [nt, H, D] or None if unsupported."""
    nt, h, d = q.shape
    _, kv, cells, _ = k_stacked.shape
    n_vis = n_vis if n_vis is not None else mask_cells.shape[1]
    if h % kv != 0 or d not in (64, 128) or nt % 8 != 0 or n_vis > cells:
        return None
    if mask_cells.shape[1] != n_vis:
        return None
    quantized = k_scale is not None
    rep = h // kv
    ct = next((c for c in (512, 256, 128) if n_vis % c == 0), 0)
    if ct == 0:
        return None
    n_ctiles = n_vis // ct

    qh = q.swapaxes(0, 1)  # [H, nt, D]
    knh = new_k.swapaxes(0, 1)  # [KV, nt, D]
    vnh = new_v.swapaxes(0, 1)
    m_cells = mask_cells.astype(jnp.int8)
    m_new = mask_new.astype(jnp.int8)

    in_specs = [
        pl.BlockSpec((1, nt, d), (lambda hi, ci, L: (hi, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ct, d), (lambda hi, ci, L: (L[0], hi // rep, ci, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ct, d), (lambda hi, ci, L: (L[0], hi // rep, ci, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nt, ct), (lambda hi, ci, L: (0, ci)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nt, d), (lambda hi, ci, L: (hi // rep, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nt, d), (lambda hi, ci, L: (hi // rep, 0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((nt, nt), (lambda hi, ci, L: (0, 0)), memory_space=pltpu.VMEM),
    ]
    operands = [qh, k_stacked, v_stacked, m_cells, knh, vnh, m_new]
    if quantized:
        # scales ride as [L*KV, 1, cells]: the singleton second-minor keeps
        # the (1, ct) block legal under Mosaic's sublane-tiling rule (a
        # [L, KV, cells] layout puts KV second-minor, and a 1-block over
        # KV not divisible by 8 is rejected at compile)
        in_specs += [
            pl.BlockSpec((1, 1, ct),
                         (lambda hi, ci, L: (L[0] * kv + hi // rep, 0, ci)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ct),
                         (lambda hi, ci, L: (L[0] * kv + hi // rep, 0, ci)),
                         memory_space=pltpu.VMEM),
        ]
        nL = k_stacked.shape[0]
        operands += [
            k_scale.astype(jnp.float32).reshape(nL * kv, 1, cells),
            v_scale.astype(jnp.float32).reshape(nL * kv, 1, cells),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nt, d), (lambda hi, ci, L: (hi, 0, 0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt, d), jnp.float32),
            pltpu.VMEM((nt, 128), jnp.float32),
            pltpu.VMEM((nt, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        lambda *refs: _kernel(*refs, scale=scale, logit_softcap=logit_softcap,
                              n_ctiles=n_ctiles, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, nt, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return out.swapaxes(0, 1)


def flash_attention_stacked_or_none(*args, **kw):
    try:
        return flash_attention_stacked(*args, **kw)
    except Exception:
        return None
