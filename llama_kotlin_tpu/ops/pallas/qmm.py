"""Fused dequantize-matmul Pallas TPU kernel.

y[b, n] = sum_k x[b, k] * ((codes[n, k] - off) * eff_scale[n, g(k)] - eff_min[n, g(k)])

Replaces the reference's per-format CPU vec_dot hot loops
(ggml_vec_dot_q4_K_q8_K etc., ggml/src/ggml-quants.c) with one MXU-shaped
kernel family over the uniform QTensor layout (quant/qtensor.py):

- packed codes stream HBM->VMEM tile by tile (the decode path is
  weight-bandwidth-bound; dequantized weights never touch HBM)
- nibble planes unpack with integer shifts on the VPU
- per-column scales/mins are produced by small constant "expansion
  matmuls" (eff [BN, G] @ E [G, BC]) on the MXU — no lane shuffles
- the dequantized tile feeds jax.lax.dot_general with f32 accumulation
- grid (n, k), output block revisited across k and accumulated in VMEM

Supported: every repacked format (4-bit planes, 2-bit planes, int8 codes),
one- or two-level scales, optional mins.  Returns None for shapes that
don't tile; the caller falls back to the XLA dequant+dot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN


def _expansion_matrices(bits: int, group_size: int, bc: int, n_planes: int):
    """Constant maps from scale columns to byte columns for each plane.

    Returns (E_g[p] [G, bc], E_sb [S, bc]).  For byte column c of plane p,
    the element index within the tile is span*SPAN + p*(SPAN/n_planes) + j
    (j = c % bytes_per_span), so its group column is elem // group_size and
    its superblock column is the span index.
    """
    bytes_per_span = SPAN // n_planes if bits != 8 else SPAN
    n_spans = bc // bytes_per_span
    groups_per_span = SPAN // group_size
    g_total = n_spans * groups_per_span
    e_g = []
    for p in range(n_planes):
        e = np.zeros((g_total, bc), np.float32)
        for c in range(bc):
            span, j = divmod(c, bytes_per_span)
            elem = span * SPAN + p * bytes_per_span + j
            e[span * groups_per_span + (elem % SPAN) // group_size, c] = 1.0
        e_g.append(e)
    e_sb = np.zeros((n_spans, bc), np.float32)
    for c in range(bc):
        e_sb[c // bytes_per_span, c] = 1.0
    return e_g, e_sb


def _expand(mat_ref, e_ref) -> jnp.ndarray:
    """[BN, G] x [G, BC] -> per-column values [BN, BC] on the MXU."""
    return jax.lax.dot_general(
        mat_ref.astype(jnp.float32), e_ref,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _plan_tiles(n: int, k_pad: int) -> Optional[tuple[int, int]]:
    bk = next((c for c in (1024, 512, 256) if k_pad % c == 0), 0)
    if bk == 0:
        return None
    bn = next((c for c in (256, 128) if n % c == 0), 0)
    if bn == 0:
        return None
    return bn, bk


def qmm(x: jnp.ndarray, w: QTensor, *, compute_dtype=jnp.bfloat16,
        interpret: bool = False) -> Optional[jnp.ndarray]:
    """x [..., k] @ w^T -> [..., n] f32, or None if the shape doesn't tile."""
    n, k = w.shape
    k_pad = w.k_pad
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != k:
        return None
    plan = _plan_tiles(n, k_pad)
    if plan is None:
        return None
    bn, bk = plan
    b = max(8, (b_real + 7) // 8 * 8)
    if b > 1024:
        return None

    n_planes = {8: 1, 4: 2, 2: 4}[w.bits]
    bc = bk // n_planes if w.bits != 8 else bk
    g = w.group_size
    has_min = w.g_min is not None
    has_sb = w.sb_scale is not None
    has_sbm = has_min and (w.sb_min is not None)
    off = float(w.code_offset)
    bits = w.bits

    x2 = x.reshape(b_real, k)
    if b != b_real or k_pad != k:
        x2 = jnp.pad(x2, ((0, b - b_real), (0, k_pad - k)))
    if bits == 8:
        x_planes = [x2]
    else:
        s = SPAN // n_planes
        xr = x2.reshape(b, k_pad // SPAN, n_planes, s)
        x_planes = [xr[:, :, p, :].reshape(b, k_pad // n_planes) for p in range(n_planes)]

    e_g_np, e_sb_np = _expansion_matrices(bits, g, bc, n_planes)
    e_g = [jnp.asarray(e) for e in e_g_np]
    e_sb = jnp.asarray(e_sb_np)

    grid = (n // bn, k_pad // bk)

    in_specs = [
        pl.BlockSpec((b, bc), (lambda i, j: (0, j)), memory_space=pltpu.VMEM)
        for _ in range(n_planes)
    ]
    operands: list = list(x_planes)
    in_specs.append(pl.BlockSpec((bn, bc), (lambda i, j: (i, j)), memory_space=pltpu.VMEM))
    operands.append(w.codes)
    in_specs.append(pl.BlockSpec((bn, bk // g), (lambda i, j: (i, j)), memory_space=pltpu.VMEM))
    operands.append(w.g_scale)
    if has_min:
        in_specs.append(pl.BlockSpec((bn, bk // g), (lambda i, j: (i, j)), memory_space=pltpu.VMEM))
        operands.append(w.g_min)
    if has_sb:
        in_specs.append(pl.BlockSpec((bn, bk // SPAN), (lambda i, j: (i, j)), memory_space=pltpu.VMEM))
        operands.append(w.sb_scale)
    if has_sbm:
        in_specs.append(pl.BlockSpec((bn, bk // SPAN), (lambda i, j: (i, j)), memory_space=pltpu.VMEM))
        operands.append(w.sb_min)
    for e in e_g:
        in_specs.append(pl.BlockSpec(e.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM))
        operands.append(e)
    in_specs.append(pl.BlockSpec(e_sb.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM))
    operands.append(e_sb)

    def kernel(*refs):
        it = iter(refs)
        x_refs = [next(it) for _ in range(n_planes)]
        codes_ref = next(it)
        sc_ref = next(it)
        mn_ref = next(it) if has_min else None
        sb_ref = next(it) if has_sb else None
        sbm_ref = next(it) if has_sbm else None
        e_refs = [next(it) for _ in range(n_planes)]
        e_sb_ref = next(it)
        out_ref = next(it)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        codes = codes_ref[...]
        sb_cols = _expand(sb_ref[...], e_sb_ref[...]) if has_sb else None
        sbm_cols = _expand(sbm_ref[...], e_sb_ref[...]) if has_sbm else None
        acc = jnp.zeros_like(out_ref)
        for p in range(n_planes):
            if bits == 8:
                plane = codes.astype(jnp.float32)
            else:
                shift = (4 if bits == 4 else 2) * p
                mask = 0xF if bits == 4 else 0x3
                plane = ((codes.astype(jnp.int32) >> shift) & mask).astype(jnp.float32)
            sc_cols = _expand(sc_ref[...], e_refs[p][...])
            if sb_cols is not None:
                sc_cols = sc_cols * sb_cols
            w_tile = (plane - off) * sc_cols
            if mn_ref is not None:
                mn_cols = _expand(mn_ref[...], e_refs[p][...])
                if sbm_cols is not None:
                    mn_cols = mn_cols * sbm_cols
                w_tile = w_tile - mn_cols
            acc = acc + jax.lax.dot_general(
                x_refs[p][...].astype(compute_dtype), w_tile.astype(compute_dtype),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
        out_ref[...] += acc

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, bn), (lambda i, j: (0, i)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*operands)
    return out[:b_real].reshape(*lead_shape, n)


def qmm_pallas_or_none(x, w: QTensor, *, compute_dtype=jnp.bfloat16):
    try:
        return qmm(x, w, compute_dtype=compute_dtype)
    except Exception:
        return None
