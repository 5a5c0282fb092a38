"""Fused dequantize-matmul Pallas kernel (placeholder: jnp fallback).

The real kernel streams packed codes HBM->VMEM, dequantizes in-registers
and feeds the MXU. Until it lands, return None so qmatmul uses the XLA
dequant+dot path.
"""

from __future__ import annotations


def qmm_pallas_or_none(x, w, *, compute_dtype):
    return None
