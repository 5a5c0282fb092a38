"""W8A8 fast-mode tests: kernel vs reference NMSE (activation-quant noise
budget) and end-to-end quality of wire->Q8F conversion (KL gates)."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.ops.pallas.qmm_int8 import qmm_int8, quantize_activations
from llama_kotlin_tpu.ops.qmatmul import qmatmul
from llama_kotlin_tpu.quant.formats import GGMLQuantType, NAME_TO_TYPE
from llama_kotlin_tpu.quant import numpy_ref as Q
from llama_kotlin_tpu.quant.repack import float_to_q8flat, repack_q8flat
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.tools.perplexity import kl_divergence

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


def nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2) / (np.mean(b * b) + 1e-12))


def test_activation_quantization(rng):
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    x8, sx = quantize_activations(x)
    rec = np.asarray(x8, np.float32).reshape(4, 2, 256) * np.asarray(sx)[..., None]
    assert nmse(rec.reshape(4, 512), x) < 1e-4


def test_qmm_int8_matches_float(rng):
    n, k = 256, 512
    wf = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    w = float_to_q8flat(wf)
    import jax
    w = jax.tree.map(jnp.asarray, w)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    ref = x @ wf.T
    out = qmm_int8(x, w, interpret=True)
    assert out is not None
    # W8 + A8 double quantization noise
    assert nmse(out, ref) < 3e-4, nmse(out, ref)


def test_q8flat_requant_noise_below_source(rng):
    """Q4_K -> Q8F must add less error than Q4_K itself carries."""
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    wire = Q.quantize(x, GGMLQuantType.Q4_K)
    w_q4k = Q.dequantize(wire, GGMLQuantType.Q4_K, shape=x.shape)
    q8f = repack_q8flat(wire, GGMLQuantType.Q4_K, 8, 1024)
    from llama_kotlin_tpu.quant.qtensor import dequantize

    w_q8f = np.asarray(dequantize(q8f))
    src_err = np.mean((w_q4k - x) ** 2)
    extra_err = np.mean((w_q8f - w_q4k) ** 2)
    assert extra_err < src_err * 0.05, (extra_err, src_err)


def test_int8_mode_model_quality(tmp_path):
    """fast_mode=int8 model: logits KL vs the exact model stays tiny."""
    rng = np.random.default_rng(5)
    dims = tiny_llama_dims(n_embd=64, n_ff=96, vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, weights, dims, qtype=GGMLQuantType.Q8_0)

    toks = np.array([3, 17, 42, 9, 101], np.int32)

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    exact = ctx.get_logits()

    cfg2, params2, f2 = load_gguf_model(path, compute_dtype=jnp.float32,
                                        fast_mode="int8")
    f2.close()
    ctx2 = LlamaContext(cfg2, params2, n_cells=32, compute_dtype=jnp.float32)
    ctx2.decode(Batch.single(toks, logits_last_only=False))
    fast = ctx2.get_logits()

    kl, top1 = kl_divergence([exact.astype(np.float16)], [fast.astype(np.float16)])
    assert kl < 0.02, kl
    assert top1 >= 0.8


@pytest.mark.parametrize("mode", ["w4", "w4x"])
def test_w4_mode_model_load(tmp_path, mode):
    """fast_mode=w4/w4x: Q4_K weights fold to the 4-bit-resident layout
    (hi_signed QTensors) and logits stay close to the exact model."""
    from llama_kotlin_tpu.quant.qtensor import QTensor

    rng = np.random.default_rng(6)
    # Q4_K needs k % 256 == 0 on every quantized tensor's contraction axis
    dims = tiny_llama_dims(n_embd=256, n_ff=256, vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "m4.gguf"
    write_llama_gguf(path, weights, dims, qtype=GGMLQuantType.Q4_K)

    toks = np.array([3, 17, 42, 9, 101], np.int32)

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    exact = ctx.get_logits()

    cfg2, params2, f2 = load_gguf_model(path, compute_dtype=jnp.float32,
                                        fast_mode=mode)
    f2.close()
    w = params2["layers"][0]["ffn_up"]
    assert isinstance(w, QTensor) and w.hi_signed
    assert ("precise" in w.aux) == (mode == "w4x")
    ctx2 = LlamaContext(cfg2, params2, n_cells=32, compute_dtype=jnp.float32)
    ctx2.decode(Batch.single(toks, logits_last_only=False))
    fast = ctx2.get_logits()

    kl, top1 = kl_divergence([exact.astype(np.float16)], [fast.astype(np.float16)])
    # CPU path dequantizes W4 (no pallas): w4x is bit-exact, w4 only bf16
    # scale rounding — both tiny
    assert kl < (1e-6 if mode == "w4x" else 0.01), kl
    assert top1 >= 0.9


def test_qmm_long_prefill_chunking():
    """b > 1024 row-chunks instead of bailing to the XLA fallback."""
    import jax

    rng = np.random.default_rng(0)
    wf = (rng.standard_normal((128, 512)) * 0.05).astype(np.float32)
    qt = jax.tree.map(jnp.asarray, float_to_q8flat(wf))
    x = jnp.asarray((rng.standard_normal((1500, 512)) * 0.5).astype(np.float32))
    y = qmm_int8(x, qt, interpret=True)
    assert y is not None and y.shape == (1500, 128)
    ref = np.asarray(x) @ np.asarray(qt.codes.astype(jnp.float32)
                                     * jnp.repeat(qt.g_scale, 256, -1)).T
    np.testing.assert_allclose(np.asarray(y), ref, atol=0.5, rtol=0.1)
