"""Fused post-attention layer megakernel (o-proj + residual + RMSNorm +
gated FFN in one Pallas launch, ops/pallas/qmm_w4_ffn.qmm_w4_layer_matmul)
vs the composed unfused path — see _assert_bf16_close for why the bound
is quantization-noise-class rather than bitwise."""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_matmul
from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import (qmm_w4_ffn_matmul,
                                                    qmm_w4_layer_matmul)
from llama_kotlin_tpu.ops.norms import rms_norm
from llama_kotlin_tpu.quant.fold import fold_to_w4
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.quant.repack import repack_float


def _w4(rng, n, k, qtype=GGMLQuantType.Q4_K, scale=0.05):
    wf = (rng.standard_normal((n, k)) * scale).astype(np.float32)
    return jax.tree.map(jnp.asarray, fold_to_w4(repack_float(wf, qtype)))


def _assert_bf16_close(got, ref):
    """Quantization-noise-class agreement with the composed path.

    Bitwise equality is ill-defined here: XLA elides intermediate bf16
    rounding in fused elementwise chains, so the kernel's residual adds
    single-round (more accurate than the eager two-rounding composition).
    A 1-ulp h2 difference shifts the FFN's activation-quantization
    boundaries, so downstream values legitimately differ at the Q8
    noise level — the bound is global, like the other W4A8 kernel
    tests."""
    g32 = np.asarray(got, np.float32)
    r32 = np.asarray(ref, np.float32)
    scale = np.abs(r32).max() + 1e-6
    assert np.abs(g32 - r32).max() / scale < 2e-2


def _compose_reference(attn, h, o_t, gu, dn, nw, eps, act):
    """The unfused model chain (models/llama.py post_attn_ffn)."""
    o_out = qmm_w4_matmul(attn.astype(jnp.float32), o_t, interpret=True)
    h2 = h + o_out.astype(h.dtype)
    r = rms_norm(h2, nw, eps)
    ffn = qmm_w4_ffn_matmul(r, gu, dn, act=act, interpret=True)
    assert ffn is not None
    return h2 + ffn.astype(h.dtype)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(19)


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_0])
def test_layer_fused_matches_composed(rng, qtype, monkeypatch):
    """Compact (Q4_K default fold) and sym (Q4_0) flavors, b=2."""
    E, F = 2048, 2048
    o_t = _w4(rng, E, E, qtype)
    gu = _w4(rng, 2 * F, E, qtype)
    dn = _w4(rng, E, F, qtype)
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(E), jnp.float32)
    attn = jnp.asarray(rng.standard_normal((2, E)) * 0.5, jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((2, E)) * 0.5, jnp.bfloat16)
    eps = 1e-5

    got = qmm_w4_layer_matmul(attn, h, o_t, gu, dn, nw, eps=eps,
                              act="silu", interpret=True)
    assert got is not None and got.shape == (2, E) and got.dtype == h.dtype
    ref = _compose_reference(attn, h, o_t, gu, dn, nw, eps, "silu")
    _assert_bf16_close(got, ref)


def test_layer_fused_legacy_aux(rng, monkeypatch):
    """Legacy (non-compact) scw/madj planes."""
    monkeypatch.setenv("LKTPU_W4_COMPACT", "0")
    E, F = 2048, 2048
    o_t = _w4(rng, E, E)
    gu = _w4(rng, 2 * F, E)
    dn = _w4(rng, E, F)
    assert "q6_t" not in gu.aux and "madj_t" in gu.aux
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(E), jnp.float32)
    attn = jnp.asarray(rng.standard_normal((2, E)) * 0.5, jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((2, E)) * 0.5, jnp.bfloat16)
    got = qmm_w4_layer_matmul(attn, h, o_t, gu, dn, nw, eps=1e-5,
                              act="silu", interpret=True)
    assert got is not None
    ref = _compose_reference(attn, h, o_t, gu, dn, nw, 1e-5, "silu")
    _assert_bf16_close(got, ref)


def test_layer_fused_model_parity(rng, monkeypatch):
    """End-to-end: the model's fused-layer fast path vs LKTPU_LAYER_FUSED=0
    on the same W4A8 params — logits must agree at bf16 resolution."""
    from llama_kotlin_tpu.models.config import ModelConfig
    from llama_kotlin_tpu.models.synthetic import synthetic_params_device
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext

    monkeypatch.setenv("LKTPU_FORCE_PALLAS_INTERPRET", "1")
    cfg = ModelConfig(arch="llama", vocab_size=512, n_embd=2048, n_layer=2,
                      n_head=16, n_head_kv=8, n_ff=2048)
    params = synthetic_params_device(cfg, GGMLQuantType.Q4_K,
                                     fast_w4a8=True, fuse=True)
    toks = np.array([3, 5, 9], np.int32)

    outs = {}
    import llama_kotlin_tpu.ops.pallas.qmm_w4_ffn as ffn_mod

    calls = []
    orig = ffn_mod.qmm_w4_layer_matmul

    def counting(*a, **kw):
        y = orig(*a, **kw)
        if y is not None:
            calls.append(1)
        return y

    monkeypatch.setattr(ffn_mod, "qmm_w4_layer_matmul", counting)
    for fused in ("1", "0"):
        monkeypatch.setenv("LKTPU_LAYER_FUSED", fused)
        ctx = LlamaContext(cfg, params, n_cells=64)
        rc = ctx.decode(Batch.single(toks))
        assert rc == 0
        outs[fused] = ctx.get_logits()[-1].astype(np.float32)
    assert calls, "fused layer path never dispatched"
    a, b = outs["1"], outs["0"]
    scale = np.abs(b).max() + 1e-6
    assert np.abs(a - b).max() / scale < 2e-2
