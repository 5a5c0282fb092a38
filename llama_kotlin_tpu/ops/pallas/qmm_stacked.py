"""Stacked-layer fused dequantize-matmul: layer selection inside the kernel.

Under lax.scan, slicing a layer's weights out of the stacked [L, ...]
arrays materialises a copy of every weight tile before each pallas_call
(~9ms/step on an 8B model — dynamic-slice can't fuse into a custom call).
This variant keeps the FULL stacked arrays as kernel operands and selects
the layer inside the BlockSpec index maps via a scalar-prefetch argument
(pltpu.PrefetchScalarGridSpec), so only the tiles actually streamed are
read — zero copies.

Math is identical to ops/pallas/qmm.py (same exact-bf16 scale scheme);
geometry helpers are imported from there.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.ops.pallas.qmm import (
    SB_ROWS,
    _CONTRACT,
    _CONTRACT_T,
    _codes_i8,
    _exact_dot,
    _expansion_matrices,
    _is_int_dtype,
    _plan_tiles,
    _sb_selection,
    _tile_dequant_dot,
    _to_f32,
)
from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN


def qmm_stacked(x: jnp.ndarray, w: QTensor, layer: jnp.ndarray, *,
                compute_dtype=jnp.bfloat16,
                interpret: bool = False) -> Optional[jnp.ndarray]:
    """x [..., k] @ w[layer]^T where w carries stacked [L, ...] arrays.

    `layer` is a traced int32 scalar.  Returns [..., n] f32 or None.
    """
    if w.codes.ndim != 3:
        return None
    n, k = w.shape  # static per-layer shape
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != k:
        return None
    bits = w.bits
    n_planes = {8: 1, 4: 2, 2: 4}[bits]
    k_pad = w.codes.shape[-1] * (8 // bits) if bits != 8 else w.codes.shape[-1]
    plan = _plan_tiles(n, k_pad, w.group_size)
    if plan is None:
        return None
    bn, bk = plan
    b = max(8, (b_real + 7) // 8 * 8)
    if b > 1024:
        return None

    bc = bk // n_planes if bits != 8 else bk
    g = w.group_size
    has_min = w.g_min is not None
    has_sb = w.sb_scale is not None
    has_sbm = has_min and (w.sb_min is not None)
    off = float(w.code_offset)
    gk = bk // g
    g_total = k_pad // g
    sb_total = k_pad // SPAN
    sbk = bk // SPAN
    n_ksteps = k_pad // bk
    sc_int = _is_int_dtype(w.g_scale.dtype)
    mn_int = has_min and _is_int_dtype(w.g_min.dtype)

    x2 = x.reshape(b_real, k)
    if b != b_real or k_pad != k:
        x2 = jnp.pad(x2, ((0, b - b_real), (0, k_pad - k)))
    if bits == 8:
        x_planes = [x2]
    else:
        s = SPAN // n_planes
        xr = x2.reshape(b, k_pad // SPAN, n_planes, s)
        x_planes = [xr[:, :, p, :].reshape(b, k_pad // n_planes) for p in range(n_planes)]

    e_g_np, e_sb_np = _expansion_matrices(bits, g, bc, n_planes, gk)
    e_g = [jnp.asarray(e, jnp.bfloat16) for e in e_g_np]
    e_sb = jnp.asarray(e_sb_np, jnp.bfloat16)
    sel_g = jnp.eye(g_total, dtype=jnp.bfloat16)
    sel_sb = jnp.asarray(_sb_selection(sb_total, sbk), jnp.bfloat16) if has_sb else None

    # index maps receive the scalar-prefetch ref as the last argument
    in_specs = [
        pl.BlockSpec((b, bc), (lambda i, j, L: (0, j)), memory_space=pltpu.VMEM)
        for _ in range(n_planes)
    ]
    operands: list = list(x_planes)
    in_specs.append(
        pl.BlockSpec((1, bn, bc), (lambda i, j, L: (L[0], i, j)), memory_space=pltpu.VMEM)
    )
    operands.append(w.codes)
    in_specs.append(
        pl.BlockSpec((1, bn, g_total), (lambda i, j, L: (L[0], i, 0)), memory_space=pltpu.VMEM)
    )
    operands.append(w.g_scale)
    if has_min:
        in_specs.append(
            pl.BlockSpec((1, bn, g_total), (lambda i, j, L: (L[0], i, 0)), memory_space=pltpu.VMEM)
        )
        operands.append(w.g_min)
    if has_sb:
        in_specs.append(
            pl.BlockSpec((1, bn, sb_total), (lambda i, j, L: (L[0], i, 0)), memory_space=pltpu.VMEM)
        )
        operands.append(w.sb_scale)
    if has_sbm:
        in_specs.append(
            pl.BlockSpec((1, bn, sb_total), (lambda i, j, L: (L[0], i, 0)), memory_space=pltpu.VMEM)
        )
        operands.append(w.sb_min)
    in_specs.append(pl.BlockSpec((gk, g_total), (lambda i, j, L: (j, 0)), memory_space=pltpu.VMEM))
    operands.append(sel_g)
    if has_sb:
        in_specs.append(
            pl.BlockSpec((SB_ROWS, sb_total), (lambda i, j, L: (j, 0)), memory_space=pltpu.VMEM)
        )
        operands.append(sel_sb)
        in_specs.append(pl.BlockSpec(e_sb.shape, (lambda i, j, L: (0, 0)), memory_space=pltpu.VMEM))
        operands.append(e_sb)
    for e in e_g:
        in_specs.append(pl.BlockSpec(e.shape, (lambda i, j, L: (0, 0)), memory_space=pltpu.VMEM))
        operands.append(e)

    def kernel(L_ref, *refs):
        it = iter(refs)
        x_refs = [next(it) for _ in range(n_planes)]
        codes_ref = next(it)
        sc_ref = next(it)
        mn_ref = next(it) if has_min else None
        sb_ref = next(it) if has_sb else None
        sbm_ref = next(it) if has_sbm else None
        sel_ref = next(it)
        selsb_ref = next(it) if has_sb else None
        esb_ref = next(it) if has_sb else None
        e_refs = [next(it) for _ in range(n_planes)]
        out_ref = next(it)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        sel = sel_ref[...]
        sc_step = _exact_dot(_to_f32(sc_ref[0]), sel, _CONTRACT_T, sc_int)
        mn_step = (
            _exact_dot(_to_f32(mn_ref[0]), sel, _CONTRACT_T, mn_int)
            if mn_ref is not None else None
        )
        sb_cols = None
        sbm_cols = None
        if sb_ref is not None:
            sb_step = _exact_dot(_to_f32(sb_ref[0]), selsb_ref[...], _CONTRACT_T, False)
            sb_cols = _exact_dot(sb_step, esb_ref[...], _CONTRACT, False)
            if sbm_ref is not None:
                sbm_step = _exact_dot(_to_f32(sbm_ref[0]), selsb_ref[...], _CONTRACT_T, False)
                sbm_cols = _exact_dot(sbm_step, esb_ref[...], _CONTRACT, False)

        acc = _tile_dequant_dot(
            x_refs, codes_ref[0], sc_step, mn_step, sb_cols,
            sbm_cols, e_refs, out_ref, bits=bits, n_planes=n_planes, off=off,
            sc_int=sc_int, mn_int=mn_int, compute_dtype=compute_dtype,
        )
        out_ref[...] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, n_ksteps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, bn), (lambda i, j, L: (0, i)), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return out[:b_real].reshape(*lead_shape, n)


def qmm_stacked_or_none(x, w, layer, *, compute_dtype=jnp.bfloat16):
    try:
        return qmm_stacked(x, w, layer, compute_dtype=compute_dtype)
    except Exception:
        return None
