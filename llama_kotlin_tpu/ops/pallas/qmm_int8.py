"""W8A8 fast-mode matmul: flat int8 weights, int8 activations, MXU integer
dots with per-superblock scale application on the output partials.

Any wire format converts at load time to "Q8F": codes int8 [n, k] with one
f32 scale per 256-superblock (quant/repack.py:to_q8flat).  Requantization
error adds ~(sb_range/254)^2/12 variance — below the source format's own
quantization noise for <=6-bit formats (validated by KL tests).

Activations quantize per (row, superblock) to int8 inside the kernel's
caller (absmax scaling).  The kernel then runs pure int8 x int8 -> int32
MXU dots — measured at ~4-7x the bandwidth of the exact dequant kernel —
and applies sw[n,s] * sx[b,s] on the [B, BN] partial outputs (VPU-cheap).

y[b,n] = sum_s sw[n,s] * sx[b,s] * (sum_{k in s} q[n,k] * x8[b,k])
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN


def quantize_activations(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x [b, k] f32/bf16 -> (x8 int8, sx f32 [b, k/256]) per-superblock."""
    b, k = x.shape
    xr = x.astype(jnp.float32).reshape(b, k // SPAN, SPAN)
    amax = jnp.max(jnp.abs(xr), axis=-1)  # [b, S]
    sx = amax / 127.0
    safe = jnp.where(sx > 0, sx, 1.0)
    x8 = jnp.clip(jnp.round(xr / safe[..., None]), -127, 127).astype(jnp.int8)
    return x8.reshape(b, k), sx


def qmm_int8(x: jnp.ndarray, w: QTensor, *, interpret: bool = False
             ) -> Optional[jnp.ndarray]:
    """x [..., k] (float) @ q8flat w^T -> [..., n] f32, or None."""
    if w.bits != 8 or w.group_size != SPAN or w.g_min is not None \
            or w.sb_scale is not None:
        return None  # only Q8F layout
    n, k = w.shape
    k_pad = w.codes.shape[-1]
    lead_shape = x.shape[:-1]
    b_real = int(np.prod(lead_shape)) if lead_shape else 1
    if x.shape[-1] != k:
        return None
    # bk=4096 measured 620 GB/s vs 531 at bk=2048 on [14336,4096]xB8 (v5e),
    # beating even the unscaled XLA int8 dot (612); larger k blocks amortize
    # the per-step scale pipeline.
    bk = next((c for c in (4096, 2048, 1024, 512, 256) if k_pad % c == 0), 0)
    bn = next((c for c in (512, 256, 128) if n % c == 0), 0)
    if not bk or not bn:
        return None
    b = max(8, (b_real + 7) // 8 * 8)
    if b > 1024:
        # long prefill: row-chunk to keep VMEM blocks bounded
        x2 = x.reshape(b_real, k)
        outs = [qmm_int8(x2[i : i + 1024], w, interpret=interpret)
                for i in range(0, b_real, 1024)]
        if any(o is None for o in outs):
            return None
        return jnp.concatenate(outs, 0).reshape(*lead_shape, n)
    sb_total = k_pad // SPAN
    sbk = bk // SPAN

    x2 = x.reshape(b_real, k)
    if b != b_real or k_pad != k:
        x2 = jnp.pad(x2.astype(jnp.float32), ((0, b - b_real), (0, k_pad - k)))
    x8, sx = quantize_activations(x2)

    n_ksteps = k_pad // bk
    grid = (n // bn, n_ksteps)
    # scale arrays reshaped so each k-step's superblock columns form the
    # full (lane-aligned) trailing dim of a 3-D block
    sx3 = sx.reshape(b, n_ksteps, sbk).swapaxes(0, 1)  # [steps, b, sbk]
    sw3 = w.g_scale.reshape(n, n_ksteps, sbk).swapaxes(0, 1)  # [steps, n, sbk]

    def kernel(x_ref, sx_ref, w_ref, sw_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        acc = jnp.zeros_like(out_ref)
        for s in range(sbk):
            p = jax.lax.dot_general(
                x_ref[:, s * SPAN : (s + 1) * SPAN],
                w_ref[:, s * SPAN : (s + 1) * SPAN],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
            )  # [b, bn] i32
            scale = sx_ref[0][:, s][:, None] * sw_ref[0][:, s][None, :]
            acc = acc + p.astype(jnp.float32) * scale
        out_ref[...] += acc

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, bk), (lambda i, j: (0, j)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, sbk), (lambda i, j: (j, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), (lambda i, j: (i, j)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, sbk), (lambda i, j: (j, i, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), (lambda i, j: (0, i)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x8, sx3, w.codes, sw3)
    return out[:b_real].reshape(*lead_shape, n)


def qmm_int8_or_none(x, w, **kw):
    try:
        return qmm_int8(x, w, **kw)
    except Exception:
        return None
