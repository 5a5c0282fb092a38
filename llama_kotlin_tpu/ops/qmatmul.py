"""Quantized matmul: y = x @ W^T with W a QTensor (or plain array).

Two code paths:
- reference/jnp: dequantize to the compute dtype, then jnp.dot (XLA).  Used
  on CPU, for tests, and as the fallback.
- Pallas TPU kernel (ops/pallas/qmm.py): streams packed codes HBM->VMEM,
  dequantizes in-registers and feeds the MXU, avoiding materialising the
  dequantized weights in HBM.  Activated for TPU backends when shapes
  qualify; cross-checked against this path by tests/test_ops.py.

Replaces the reference's per-format ``ggml_vec_dot_*`` CPU hot loops
(ggml/src/ggml-quants.c) and tinyBLAS prompt-processing matmul
(ggml/src/llamafile/sgemm.cpp) with a single MXU-shaped design.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from llama_kotlin_tpu.quant.qtensor import QTensor, dequantize

Weight = Union[QTensor, jax.Array]


class StackedSlice:
    """Deferred layer selection on stacked [L, ...] weights (scan path).

    Resolved by plain leading-axis indexing.  A zero-copy scalar-prefetch
    kernel variant (qmm_stacked) was built and device-measured ~20x SLOWER
    than sliced qmm — prefetched block indices defeat Mosaic's pipelining —
    so it was removed; see git history (ops/pallas/qmm_stacked.py) for the
    measurement context.
    """

    def __init__(self, w, index):
        self.w = w
        self.index = index


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def qmatmul(x: jnp.ndarray, w: Weight, *, compute_dtype=jnp.bfloat16,
            allow_pallas: bool = True) -> jnp.ndarray:
    """x [..., k] @ w[n, k]^T -> [..., n].

    Accumulation in f32 (preferred_element_type), inputs cast to
    `compute_dtype` for the MXU.  LoraWeight wrappers add their low-rank
    delta on the fly (cf. llm_build_lora_mm, src/llama.cpp:8515).
    """
    from llama_kotlin_tpu.models.lora import LoraWeight

    if isinstance(w, StackedSlice):
        inner = w.w
        if isinstance(inner, QTensor):
            sliced = jax.tree.map(lambda a: a[w.index], inner)
        elif isinstance(inner, LoraWeight):
            sliced = jax.tree.map(lambda a: a[w.index], inner)
        else:
            sliced = inner[w.index]
        return qmatmul(x, sliced, compute_dtype=compute_dtype, allow_pallas=allow_pallas)
    if isinstance(w, LoraWeight):
        y = qmatmul(x, w.base, compute_dtype=compute_dtype, allow_pallas=allow_pallas)
        xa = jnp.dot(x.astype(compute_dtype), w.a.T.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
        delta = jnp.dot(xa.astype(compute_dtype), w.b.T.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        return y + w.scale * delta
    if isinstance(w, QTensor):
        if allow_pallas and _use_pallas():
            if w.hi_signed:
                from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_or_none

                y = qmm_w4_or_none(x, w)
                if y is not None:
                    return y
            if w.aux is not None and "scw" in w.aux:
                from llama_kotlin_tpu.ops.pallas.qmm_w8 import qmm_w8_or_none

                y = qmm_w8_or_none(x, w)
                if y is not None:
                    return y
            if w.bits == 8 and w.group_size == 256 and w.g_min is None \
                    and w.sb_scale is None:
                from llama_kotlin_tpu.ops.pallas.qmm_int8 import qmm_int8_or_none

                y = qmm_int8_or_none(x, w)
                if y is not None:
                    return y
            from llama_kotlin_tpu.ops.pallas.qmm import qmm_pallas_or_none

            y = qmm_pallas_or_none(x, w, compute_dtype=compute_dtype)
            if y is not None:
                return y
        wf = dequantize(w, dtype=compute_dtype)
    else:
        wf = w.astype(compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype), wf.T, preferred_element_type=jnp.float32
    )
    return y


def take_rows(w: Weight, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Row gather (embedding lookup) from a possibly-quantized [n, k] weight.

    Equivalent of ggml_get_rows on quantized tensors: gathers the packed
    rows first, dequantizes only the gathered rows.
    """
    from llama_kotlin_tpu.models.lora import LoraWeight

    if isinstance(w, LoraWeight):
        w = w.base  # row gathers bypass LoRA, like ggml_get_rows
    if not isinstance(w, QTensor):
        return w[ids].astype(dtype)
    sub = QTensor(
        codes=w.codes[ids],
        g_scale=w.g_scale[ids],
        g_min=None if w.g_min is None else w.g_min[ids],
        sb_scale=None if w.sb_scale is None else w.sb_scale[ids],
        sb_min=None if w.sb_min is None else w.sb_min[ids],
        qtype=w.qtype, bits=w.bits, group_size=w.group_size,
        code_offset=w.code_offset, shape=(int(ids.shape[0]), w.k),
        hi_signed=w.hi_signed,
    )
    return dequantize(sub, dtype=dtype)
