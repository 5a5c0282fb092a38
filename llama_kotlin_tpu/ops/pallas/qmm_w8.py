"""W8A8 block-diagonal matmul: exact int8-code weights x int8 activations
with per-group (16/32) f32 rescale — the int8-resident sibling of the W4
kernel (ops/pallas/qmm_w4.py) for formats whose codes don't fit 4 bits.

Serves q6_K (the reference Q4_K_M lm_head / some ffn_down layers,
ggml_vec_dot_q6_K_q8_K in ggml/src/ggml-quants.c), q3_K, q5_K, q8_0 and
the IQ-format repacks EXACTLY: the weight-side numerics are bit-identical
to the wire format (signed int8 codes, f32 effective scales), integer dots
are exact, and the only approximation is the activation quantization —
the same per-superblock Q8 row quantization the reference uses (Q8_K,
quantize_row_q8_K), or dual-plane ~15.8-bit in precise mode.

Same design as qmm_w4 minus nibble planes: activations are laid out
block-diagonally over the MXU row dimension at GROUP granularity
(X_bd[r*b + i, c] = x8[i, c] iff (c // gs) % NG == r, NG = 512/gs row
blocks per 512-column chunk), so one [NG*b, 512] x [512, bn] int8 dot
yields all NG group partials at once; per-group f32 scales multiply the
[NG*b, bn] partials (1/gs of per-element VPU work) and a reshape-sum
folds the group rows back to [b, bn].  Formats with mins (q5_K, q2_K)
subtract the min term OUTSIDE the kernel via one small group-sum matmul,
exactly like the W4 path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN

CHUNK = 512  # element columns per block-diagonal dot


def _plan(n: int, k_pad: int, ng: int, b: int) -> Optional[tuple[int, int]]:
    """(bn, bk): output rows and element columns per grid step, sized so
    x_bd [ng*b, bk] + codes [bn, bk] + scw stay well under VMEM."""
    if k_pad % CHUNK != 0:
        return None
    rows = ng * b
    for bk in (2048, 1024, 512):
        if k_pad % bk == 0 and rows * bk <= 1 << 21:  # x_bd block <= 2 MiB
            for bn in (512, 256, 128):
                if n % bn == 0:
                    return bn, bk
    return None


def build_xbd_w8(x8: jnp.ndarray, gs: int) -> jnp.ndarray:
    """x8 [b, k_pad] int8 (element order) -> block-diagonal [NG*b, k_pad]
    int8 with NG = 512/gs row blocks repeating every CHUNK columns."""
    b, k_pad = x8.shape
    ng = CHUNK // gs
    col_block = (jax.lax.broadcasted_iota(jnp.int32, (ng * b, k_pad), 1) // gs) % ng
    row_block = jax.lax.broadcasted_iota(jnp.int32, (ng * b, k_pad), 0) // b
    rep = jnp.broadcast_to(x8[None], (ng, b, k_pad)).reshape(ng * b, k_pad)
    return jnp.where(col_block == row_block, rep, jnp.int8(0))


def build_sxv_w8(sx: jnp.ndarray, k_pad: int, gs: int) -> jnp.ndarray:
    """sx [b, S] f32 -> [k_pad/CHUNK, NG*b]: chunk t, row (r, i) ->
    sx[i, 2t + (gs*r)//256] (chunk t's columns span superblocks 2t, 2t+1;
    row-block r covers global group NG*t + r)."""
    b = sx.shape[0]
    ng = CHUNK // gs
    nch = k_pad // CHUNK
    t = np.arange(nch)[:, None, None]
    r = np.arange(ng)[None, :, None]
    i = np.arange(b)[None, None, :]
    sb = np.broadcast_to(2 * t + (gs * r) // SPAN, (nch, ng, b))
    ii = np.broadcast_to(i, (nch, ng, b))
    return sx[ii.reshape(-1), sb.reshape(-1)].reshape(nch, ng * b)


def qmm_w8_matmul(x: jnp.ndarray, w: QTensor, *, interpret: bool = False,
                  max_rows: int = 32) -> Optional[jnp.ndarray]:
    """x [..., k] (float) @ W8 w^T -> [..., n] f32, or None if ineligible.

    Decode-path entry: quantizes activations per-256 superblock (the
    reference's Q8_K row quantization), runs the block-diagonal kernel for
    the scale-weighted main term, and subtracts the per-group min term via
    one [b, G] x [G, n] matmul on sx-scaled group sums when the format has
    mins.  Precise (dual-plane) tensors stack both activation planes along
    the batch axis of the same kernel and sum the halves at the end.
    """
    from llama_kotlin_tpu.ops.pallas.qmm_int8 import quantize_activations
    from llama_kotlin_tpu.ops.pallas.qmm_w4 import quantize_activations_2p

    if w.aux is None or "scw" not in w.aux or w.bits != 8:
        return None
    precise = "precise" in w.aux
    n, k = w.shape
    k_pad = w.codes.shape[-1]
    gs = w.group_size
    ng = CHUNK // gs
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != k or b_real > max_rows:
        return None  # prefill batches route to the dense/bf16 path
    # Minimal power-of-two batch pad: the block-diagonal rows (ng*bp per
    # plane, 2 planes in precise mode) only need to reach the int8 sublane
    # tile of 32 — larger pads multiply MXU work by the block-diagonal
    # redundancy for nothing (see qmm_w4.py for the v5e balance math).
    f = 2 if precise else 1
    bp = max(-(-32 // (ng * f)),
             int(2 ** np.ceil(np.log2(max(b_real, 1)))))
    nb = bp * f
    if _plan(n, k_pad, ng, nb) is None:
        return None
    x2 = x.reshape(b_real, k).astype(jnp.float32)
    if bp != b_real or k_pad != k:
        x2 = jnp.pad(x2, ((0, bp - b_real), (0, k_pad - k)))
    if precise:
        x8, sx = quantize_activations_2p(x2)  # [2bp, k_pad], [2bp, S]
    else:
        x8, sx = quantize_activations(x2)     # [bp, k_pad], [bp, S]
    xbd = build_xbd_w8(x8, gs)
    sxv = jnp.asarray(build_sxv_w8(sx, k_pad, gs))
    y = qmm_w8(xbd, sxv, w, interpret=interpret)
    if y is None:
        return None
    if w.g_min is not None:
        G = k_pad // gs
        xg = x8.reshape(x8.shape[0], G, gs).astype(jnp.int32).sum(axis=-1)
        xg = xg.astype(jnp.float32) * jnp.repeat(sx, SPAN // gs, axis=-1)
        y = y - jnp.dot(xg, w.g_min.astype(jnp.float32).T,
                        preferred_element_type=jnp.float32)
    if precise:
        y = y[:bp] + y[bp:]
    return y[:b_real].reshape(*lead_shape, n)


def qmm_w8_or_none(x, w, **kw):
    try:
        return qmm_w8_matmul(x, w, **kw)
    except Exception:
        return None


def qmm_w8(x_bd: jnp.ndarray, sxv: jnp.ndarray, w: QTensor, *,
           interpret: bool = False) -> Optional[jnp.ndarray]:
    """Main term: [nb, n] f32 (min term applied by caller).  x_bd is the
    block-diagonal int8 activation array [NG*nb, k_pad]; sxv the matching
    per-chunk activation scales [k_pad/CHUNK, NG*nb]."""
    n, k = w.shape
    k_pad = w.codes.shape[-1]
    gs = w.group_size
    ng = CHUNK // gs
    rows = x_bd.shape[0]
    nb = rows // ng
    plan = _plan(n, k_pad, ng, nb)
    if plan is None:
        return None
    bn, bk = plan
    scw = w.aux["scw"]  # [G, n] f32

    # k-blocks OUTER, n-blocks inner: the activation block only moves with
    # the k position, so it's fetched once per k-block instead of once per
    # (n, k) grid step (see qmm_w4.py for the traffic math)
    grid = (k_pad // bk, n // bn)
    nch_blk = bk // CHUNK
    nch = k_pad // CHUNK  # sxv rides whole (tiny); block-sliced spec breaks
    # Mosaic's (8,128)-divisibility rule when nch_blk < nch

    def kernel(xbd_ref, sxv_ref, codes_ref, scw_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        cw = codes_ref[...]  # [bn, bk] i8
        ch0 = pl.program_id(0) * nch_blk
        acc = jnp.zeros_like(out_ref)
        for t in range(nch_blk):
            sl = slice(t * CHUNK, (t + 1) * CHUNK)
            p = jax.lax.dot_general(
                xbd_ref[:, sl], cw[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [ng*nb, bn]
            sc = jnp.repeat(scw_ref[t * ng:(t + 1) * ng, :], nb, axis=0)
            sxc = sxv_ref[ch0 + t, :][:, None]  # [ng*nb, 1]
            contrib = p.astype(jnp.float32) * sc * sxc
            acc = acc + contrib.reshape(ng, nb, bn).sum(axis=0)
        out_ref[...] += acc

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, bk), (lambda j, i: (0, j)), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, rows), (lambda j, i: (0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), (lambda j, i: (i, j)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // gs, bn), (lambda j, i: (j, i)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, bn), (lambda j, i: (0, i)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x_bd, sxv, w.codes, scw)
    return out
