"""Fused dequantize-matmul Pallas TPU kernel.

y[b, n] = sum_k x[b, k] * ((codes[n, k] - off) * eff_scale[n, g(k)] - eff_min[n, g(k)])

Replaces the reference's per-format CPU vec_dot hot loops
(ggml_vec_dot_q4_K_q8_K etc., ggml/src/ggml-quants.c) with one MXU-shaped
kernel family over the uniform QTensor layout (quant/qtensor.py):

- packed codes stream HBM->VMEM tile by tile (the decode path is
  weight-bandwidth-bound; dequantized weights never touch HBM)
- nibble planes unpack with integer shifts on the VPU
- all scale addressing runs on the MXU with 0/1 selection/expansion
  matrices: a blocked identity picks the k-step's group columns, and
  constant maps broadcast group/superblock scales to byte columns.
  Every such matmul is EXACT in bfloat16 because each output element has
  exactly one nonzero contribution: integer scale planes (<=8 bits) take
  one bf16 dot, float planes take a hi/lo bf16 split (16 mantissa bits
  cover the f16 wire scales).  f32 MXU matmuls here were the original
  decode bottleneck (~4x slower passes, ~20M MAC per tile).
- superblock scales expand at span granularity (8-padded rows), so their
  per-column cost is ~n_planes x smaller than the group expansion
- grid (n, k), output block revisited across k and accumulated in VMEM

Supported: every repacked format with group_size <= 128 (4-bit planes,
2-bit planes, int8 codes), one- or two-level scales, optional mins.
Returns None for shapes that don't tile; callers fall back to XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN

SB_ROWS = 8  # padded rows per k-step in the superblock selection matrix


def _codes_i32(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.uint8:
        return pltpu.bitcast(x, jnp.int8).astype(jnp.int32) & 0xFF
    return x.astype(jnp.int32)


def _codes_i8(x: jnp.ndarray) -> jnp.ndarray:
    return pltpu.bitcast(x, jnp.int8) if x.dtype == jnp.uint8 else x


def _unpack_plane_f32(codes: jnp.ndarray, bits: int, p: int,
                      hi_signed: bool = False) -> jnp.ndarray:
    """One bit-plane of packed codes -> f32, staying in 8-bit vectors for
    the shifts/masks (the i32 path quadruples VPU register pressure and was
    the decode bottleneck).  Mosaic has no i8 arithmetic shift (shrsi), so
    sub-byte planes shift logically in uint8 and bitcast to i8 (nibble
    values <= 15 are sign-safe) before the i8->f32 convert.

    hi_signed (the W4 fast-mode packing, quant/fold.py): the low nibble is
    the raw code and the high nibble is stored pre-signed, so both planes
    unpack with ONE byte-wide AND (no shifts): plane 1's bitcast-int8
    value is exactly 16*(q-8) and the fold's m_adj absorbs the -8, so the
    kernel just scales by 1/16 (exact)."""
    if bits == 8:
        return _codes_i8(codes).astype(jnp.float32)
    if hi_signed:
        if p == 0:
            return pltpu.bitcast(codes & jnp.uint8(0x0F), jnp.int8).astype(jnp.float32)
        hi16 = pltpu.bitcast(codes & jnp.uint8(0xF0), jnp.int8).astype(jnp.float32)
        return hi16 * (1.0 / 16.0)
    # Mosaic legalizes neither shrsi nor shrui on 8-bit vectors, so the
    # nibble extraction widens to i32 (shift there is supported)
    c32 = _codes_i32(codes)
    shift = (4 if bits == 4 else 2) * p
    mask = 0xF if bits == 4 else 0x3
    return ((c32 >> shift) & mask).astype(jnp.float32)


def _tile_dequant_dot(x_refs, c8, sc_step, mn_step, sb_cols, sbm_cols, e_refs,
                      out_like, *, bits, n_planes, off, sc_int, mn_int,
                      compute_dtype, hi_signed=False):
    """Shared per-tile math: unpack planes, build per-column scales on the
    MXU, single FMA dequant, accumulate x @ w^T."""
    acc = jnp.zeros_like(out_like)
    for p in range(n_planes):
        plane = _unpack_plane_f32(c8, bits, p, hi_signed)
        e = e_refs[p][...]
        sc_cols = _exact_dot(sc_step, e, _CONTRACT, sc_int)
        if sb_cols is not None:
            sc_cols = sc_cols * sb_cols
        adj = None
        if off != 0.0:
            adj = sc_cols * off
        if mn_step is not None:
            mn_cols = _exact_dot(mn_step, e, _CONTRACT, mn_int)
            if sbm_cols is not None:
                mn_cols = mn_cols * sbm_cols
            adj = mn_cols if adj is None else adj + mn_cols
        w_tile = plane * sc_cols
        if adj is not None:
            w_tile = w_tile - adj
        acc = acc + jax.lax.dot_general(
            x_refs[p][...].astype(compute_dtype), w_tile.astype(compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    return acc


def _is_int_dtype(dt) -> bool:
    return dt in (np.uint8, np.int8, jnp.uint8, jnp.int8) or \
        np.dtype(dt) in (np.dtype(np.uint8), np.dtype(np.int8))


def _to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Mosaic-safe cast to f32 (no direct u8->f32 support)."""
    if x.dtype == jnp.uint8:
        return (pltpu.bitcast(x, jnp.int8).astype(jnp.int32) & 0xFF).astype(jnp.float32)
    if x.dtype == jnp.int8:
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _exact_dot(mat_f32: jnp.ndarray, e_bf16: jnp.ndarray, dims, is_int: bool) -> jnp.ndarray:
    """f32 matrix x 0/1 matrix on the bf16 MXU, exactly (see module doc)."""
    d = lambda m: jax.lax.dot_general(m, e_bf16, dims, preferred_element_type=jnp.float32)
    if is_int:
        return d(mat_f32.astype(jnp.bfloat16))
    hi = mat_f32.astype(jnp.bfloat16)
    lo = (mat_f32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(hi) + d(lo)


_CONTRACT_T = (((1,), (1,)), ((), ()))  # [bn, X] x [rows, X] -> [bn, rows]
_CONTRACT = (((1,), (0,)), ((), ()))  # [bn, rows] x [rows, BC] -> [bn, BC]


def _expansion_matrices(bits: int, group_size: int, bc: int, n_planes: int, gk: int):
    """E_p [gk, bc]: step-local group column -> byte column map per plane,
    and E_sb [SB_ROWS, bc]: step-local span -> byte column (plane-agnostic)."""
    bytes_per_span = SPAN // n_planes if bits != 8 else SPAN
    groups_per_span = SPAN // group_size
    e_g = []
    for p in range(n_planes):
        e = np.zeros((gk, bc), np.float32)
        for c in range(bc):
            span, j = divmod(c, bytes_per_span)
            elem = span * SPAN + p * bytes_per_span + j
            e[span * groups_per_span + (elem % SPAN) // group_size, c] = 1.0
        e_g.append(e)
    e_sb = np.zeros((SB_ROWS, bc), np.float32)
    for c in range(bc):
        e_sb[c // bytes_per_span, c] = 1.0
    return e_g, e_sb


def _sb_selection(sb_total: int, sbk: int) -> np.ndarray:
    """[n_ksteps * SB_ROWS, sb_total]: rows j*8..j*8+sbk select step j's
    superblock columns (8-padded so BlockSpec rows stay sublane-aligned)."""
    n_ksteps = sb_total // sbk
    sel = np.zeros((n_ksteps * SB_ROWS, sb_total), np.float32)
    for j in range(n_ksteps):
        for r in range(sbk):
            sel[j * SB_ROWS + r, j * sbk + r] = 1.0
    return sel


def _plan_tiles(n: int, k_pad: int, group_size: int,
                n_planes: int = 1) -> Optional[tuple[int, int]]:
    """Prefer big tiles: per-tile fixed costs (small scale dots, pipeline
    bubbles) dominate at small tiles; VMEM comfortably fits (bn*bk/2 codes
    double-buffered <= 1MB at (512, 2048))."""
    if group_size > 128:
        return None  # q8_K-style giant groups: XLA path
    kc = k_pad // n_planes  # per-plane code columns
    for bk in (2048, 1024, 512, 256):
        bc = bk // n_planes
        # Mosaic lane rule: a block's last dim must be a multiple of 128
        # or the whole array extent (hit by 2-bit formats at small k:
        # bits=2 -> 4 planes -> bc=64 blocks on a 192-col plane)
        if bc % 128 and bc != kc:
            continue
        if k_pad % bk == 0 and bk // group_size >= 8 and bk >= SPAN:
            for bn in (512, 256, 128):
                if n % bn == 0:
                    return bn, bk
    return None


def qmm(x: jnp.ndarray, w: QTensor, *, compute_dtype=jnp.bfloat16,
        interpret: bool = False) -> Optional[jnp.ndarray]:
    """x [..., k] @ w^T -> [..., n] f32, or None if the shape doesn't tile."""
    n, k = w.shape
    k_pad = w.k_pad
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != k:
        return None
    if w.hi_signed and (w.bits != 4 or w.code_offset != 0 or w.g_min is None):
        return None  # only the W4 fold layout is supported among hi_signed
    plan = _plan_tiles(n, k_pad, w.group_size,
                       n_planes={8: 1, 4: 2, 2: 4}[w.bits])
    if plan is None:
        return None
    bn, bk = plan
    b = max(8, (b_real + 7) // 8 * 8)
    if b > 1024:
        # long prefill: row-chunk to keep VMEM blocks bounded
        x2 = x.reshape(b_real, k)
        outs = [qmm(x2[i : i + 1024], w, compute_dtype=compute_dtype,
                    interpret=interpret) for i in range(0, b_real, 1024)]
        if any(o is None for o in outs):
            return None
        return jnp.concatenate(outs, 0).reshape(*lead_shape, n)

    n_planes = {8: 1, 4: 2, 2: 4}[w.bits]
    bc = bk // n_planes if w.bits != 8 else bk
    g = w.group_size
    has_min = w.g_min is not None
    has_sb = w.sb_scale is not None
    has_sbm = has_min and (w.sb_min is not None)
    off = float(w.code_offset)
    bits = w.bits
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

    grid = (n // bn, n_ksteps)

    in_specs = [
        pl.BlockSpec((b, bc), (lambda i, j: (0, j)), memory_space=pltpu.VMEM)
        for _ in range(n_planes)
    ]
    operands: list = list(x_planes)
    in_specs.append(pl.BlockSpec((bn, bc), (lambda i, j: (i, j)), memory_space=pltpu.VMEM))
    operands.append(w.codes)
    # full-K-extent scale blocks: fetched once per n-block (index constant in j)
    in_specs.append(pl.BlockSpec((bn, g_total), (lambda i, j: (i, 0)), memory_space=pltpu.VMEM))
    operands.append(w.g_scale)
    if has_min:
        in_specs.append(pl.BlockSpec((bn, g_total), (lambda i, j: (i, 0)), memory_space=pltpu.VMEM))
        operands.append(w.g_min)
    if has_sb:
        in_specs.append(pl.BlockSpec((bn, sb_total), (lambda i, j: (i, 0)), memory_space=pltpu.VMEM))
        operands.append(w.sb_scale)
    if has_sbm:
        in_specs.append(pl.BlockSpec((bn, sb_total), (lambda i, j: (i, 0)), memory_space=pltpu.VMEM))
        operands.append(w.sb_min)
    # blocked identity: rows [j*gk, j*gk+gk) select this step's groups
    in_specs.append(pl.BlockSpec((gk, g_total), (lambda i, j: (j, 0)), memory_space=pltpu.VMEM))
    operands.append(sel_g)
    if has_sb:
        in_specs.append(pl.BlockSpec((SB_ROWS, sb_total), (lambda i, j: (j, 0)),
                                     memory_space=pltpu.VMEM))
        operands.append(sel_sb)
        in_specs.append(pl.BlockSpec(e_sb.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM))
        operands.append(e_sb)
    for e in e_g:
        in_specs.append(pl.BlockSpec(e.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM))
        operands.append(e)

    def kernel(*refs):
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

        sel = sel_ref[...]  # [gk, G_total] bf16 0/1

        # batch the group-scale selection+expansion: sc and mn stack along
        # rows so each needs ONE pick and ONE expansion dot (per-tile small
        # matmuls carry fixed MXU issue cost and were a decode bottleneck)
        if mn_ref is not None and mn_int == sc_int:
            both = jnp.concatenate(
                [_to_f32(sc_ref[...]), _to_f32(mn_ref[...])], axis=0
            )
            both_step = _exact_dot(both, sel, _CONTRACT_T, sc_int)
            sc_step = both_step[:bn]
            mn_step = both_step[bn:]
        else:
            sc_step = _exact_dot(_to_f32(sc_ref[...]), sel, _CONTRACT_T, sc_int)
            mn_step = (
                _exact_dot(_to_f32(mn_ref[...]), sel, _CONTRACT_T, mn_int)
                if mn_ref is not None else None
            )
        # superblock scales: hi/lo rows of (sb, sbm) batch the same way
        sb_cols = None
        sbm_cols = None
        if sb_ref is not None:
            mats = [_to_f32(sb_ref[...])]
            if sbm_ref is not None:
                mats.append(_to_f32(sbm_ref[...]))
            stackf = jnp.concatenate(mats, axis=0) if len(mats) > 1 else mats[0]
            hi = stackf.astype(jnp.bfloat16)
            lo = (stackf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            hilo = jnp.concatenate([hi, lo], axis=0)  # [2*len*bn, SB]
            step = jax.lax.dot_general(hilo, selsb_ref[...], _CONTRACT_T,
                                       preferred_element_type=jnp.float32)
            cols = jax.lax.dot_general(step.astype(jnp.bfloat16), esb_ref[...],
                                       _CONTRACT, preferred_element_type=jnp.float32)
            half = cols.shape[0] // 2
            cols = cols[:half] + cols[half:]  # hi + lo reconstruction
            sb_cols = cols[:bn]
            if sbm_ref is not None:
                sbm_cols = cols[bn:]

        acc = _tile_dequant_dot(
            x_refs, codes_ref[...], sc_step, mn_step, sb_cols,
            sbm_cols, e_refs, out_ref, bits=bits, n_planes=n_planes, off=off,
            sc_int=sc_int, mn_int=mn_int, compute_dtype=compute_dtype,
            hi_signed=w.hi_signed,
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


def qmm_pallas_or_none(x, w: QTensor, *, compute_dtype=jnp.bfloat16,
                       interpret: bool = False):
    try:
        return qmm(x, w, compute_dtype=compute_dtype, interpret=interpret)
    except Exception:
        return None
