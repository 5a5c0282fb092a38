"""Op cross-check harness (pattern: reference tests/test-backend-ops.cpp):
each Pallas kernel is compared against the jnp reference implementation
with per-op NMSE budgets, in interpreter mode on CPU.  The same tests run
compiled on real TPU via tools/run_tpu_checks.py."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.synthetic import synthetic_qtensor
from llama_kotlin_tpu.ops.qmatmul import qmatmul
from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE
from llama_kotlin_tpu.quant import qtensor as qt_mod
from llama_kotlin_tpu.ops.pallas.qmm import qmm


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.mean(b * b) + 1e-12
    return float(np.mean((a - b) ** 2) / denom)


QMM_TYPES = ["q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "q2_K", "q3_K", "q4_K", "q5_K", "q6_K"]


@pytest.mark.parametrize("tname", QMM_TYPES)
@pytest.mark.parametrize("b", [1, 8])
def test_qmm_matches_reference(rng, tname, b):
    n, k = 256, 512
    w = synthetic_qtensor(rng, n, k, NAME_TO_TYPE[tname])
    w = jnp.tree_util.tree_map(jnp.asarray, w) if hasattr(jnp, "tree_util") else w
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)

    ref = qmatmul(x, w, compute_dtype=jnp.float32, allow_pallas=False)
    out = qmm(x, w, compute_dtype=jnp.float32, interpret=True)
    assert out is not None, "kernel refused a tileable shape"
    assert out.shape == ref.shape
    err = nmse(out, ref)
    assert err < 1e-8, f"{tname} b={b}: NMSE {err}"


def test_qmm_bf16_accumulation(rng):
    """bf16 MXU inputs: NMSE vs the f32 reference stays tiny."""
    n, k = 256, 512
    w = synthetic_qtensor(rng, n, k, NAME_TO_TYPE["q4_K"])
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    ref = qmatmul(x, w, compute_dtype=jnp.float32, allow_pallas=False)
    out = qmm(x, w, compute_dtype=jnp.bfloat16, interpret=True)
    assert nmse(out, ref) < 1e-4


def test_qmm_padded_k(rng):
    """Logical k below the padded span boundary must be handled."""
    from llama_kotlin_tpu.quant.repack import repack_float

    n, k = 128, 320  # pads to 512
    xw = rng.standard_normal((n, k)).astype(np.float32) * 0.1
    w = repack_float(xw, NAME_TO_TYPE["q8_0"])
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.float32)
    ref = qmatmul(x, w, compute_dtype=jnp.float32, allow_pallas=False)
    out = qmm(x, w, compute_dtype=jnp.float32, interpret=True)
    assert out is not None
    assert nmse(out, ref) < 1e-8


def test_qmm_rejects_untileable(rng):
    w = synthetic_qtensor(rng, 100, 512, NAME_TO_TYPE["q8_0"])  # n=100 untileable
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    assert qmm(x, w, interpret=True) is None


# -- flash attention ---------------------------------------------------------


@pytest.mark.parametrize("nt,cells,h,kv,d", [
    (8, 256, 8, 4, 64),    # GQA rep=2, kv heads pack into one grid step
    (16, 128, 4, 4, 128),  # MHA, all heads in one step
    (8, 512, 16, 16, 128),  # MHA decode shape: VMEM-capped kvps, >1 group
    (256, 256, 8, 2, 64),  # prefill bucket: r_rows>256 per-head sweep
])
def test_flash_attention_matches_reference(rng, nt, cells, h, kv, d):
    from llama_kotlin_tpu.ops.attention import attention_reference
    from llama_kotlin_tpu.ops.pallas.flash import flash_attention

    q = jnp.asarray(rng.standard_normal((nt, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, cells, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, cells, d)), jnp.float32)
    # realistic mask: causal-ish with some empty cells and fully-masked rows
    mask_np = rng.random((nt, cells)) < 0.5
    mask_np[3] = False  # fully masked row
    mask = jnp.asarray(mask_np)
    scale = 1.0 / np.sqrt(d)

    ref = attention_reference(q, k, v, mask, scale=scale)
    out = flash_attention(q, k, v, mask, scale=scale, interpret=True)
    assert out is not None
    assert nmse(out, ref) < 1e-9


@pytest.mark.parametrize("nt,h,kv", [(1, 8, 8), (1, 8, 2), (8, 16, 16)])
def test_flash_attention_layered_4d(rng, nt, h, kv):
    """4D whole-cache operands + static layer index (the unrolled decode
    path) match the per-layer reference, including nt=1 single-token
    decode (full-dim blocks are legal at any nt)."""
    from llama_kotlin_tpu.ops.attention import attention_reference
    from llama_kotlin_tpu.ops.pallas.flash import flash_attention

    L, cells, d = 3, 256, 64
    q = jnp.asarray(rng.standard_normal((nt, h, d)), jnp.float32)
    k4 = jnp.asarray(rng.standard_normal((L, kv, cells, d)), jnp.float32)
    v4 = jnp.asarray(rng.standard_normal((L, kv, cells, d)), jnp.float32)
    mask = jnp.asarray(rng.random((nt, cells)) < 0.5)
    scale = 1.0 / np.sqrt(d)
    for li in (0, 2):
        ref = attention_reference(q, k4[li], v4[li], mask, scale=scale)
        out = flash_attention(q, k4, v4, mask, scale=scale, layer=li,
                              interpret=True)
        assert out is not None
        assert nmse(out, ref) < 1e-9


def test_flash_attention_layered_4d_quantized(rng):
    """Layered + int8 quantized cache: the [L*KV, 1, cells] scale layout
    selects the right layer's scales."""
    from llama_kotlin_tpu.ops.attention import attention_reference
    from llama_kotlin_tpu.ops.pallas.flash import flash_attention
    from llama_kotlin_tpu.runtime.kv_cache import quantize_rows

    L, kv, cells, d, nt, h = 2, 4, 256, 64, 1, 8
    q = jnp.asarray(rng.standard_normal((nt, h, d)), jnp.float32)
    kf = rng.standard_normal((L, kv, cells, d)).astype(np.float32)
    vf = rng.standard_normal((L, kv, cells, d)).astype(np.float32)
    kq, ks = quantize_rows(jnp.asarray(kf.reshape(L * kv, cells, d)))
    vq, vs = quantize_rows(jnp.asarray(vf.reshape(L * kv, cells, d)))
    k4 = kq.reshape(L, kv, cells, d)
    v4 = vq.reshape(L, kv, cells, d)
    ks4, vs4 = ks.reshape(L, kv, cells), vs.reshape(L, kv, cells)
    mask = jnp.asarray(rng.random((nt, cells)) < 0.6)
    for li in (0, 1):
        kd = np.asarray(k4[li], np.float32) * np.asarray(ks4[li])[..., None]
        vd = np.asarray(v4[li], np.float32) * np.asarray(vs4[li])[..., None]
        ref = attention_reference(q, jnp.asarray(kd), jnp.asarray(vd), mask,
                                  scale=0.125)
        out = flash_attention(q, k4, v4, mask, scale=0.125, layer=li,
                              k_scale=ks4, v_scale=vs4, interpret=True)
        assert out is not None
        assert nmse(out, ref) < 1e-4


def test_flash_attention_softcap(rng):
    from llama_kotlin_tpu.ops.attention import attention_reference
    from llama_kotlin_tpu.ops.pallas.flash import flash_attention

    nt, cells, h, kv, d = 8, 128, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((nt, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, cells, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, cells, d)), jnp.float32)
    mask = jnp.asarray(rng.random((nt, cells)) < 0.7)
    ref = attention_reference(q, k, v, mask, scale=0.125, logit_softcap=30.0)
    out = flash_attention(q, k, v, mask, scale=0.125, logit_softcap=30.0, interpret=True)
    assert nmse(out, ref) < 1e-9
