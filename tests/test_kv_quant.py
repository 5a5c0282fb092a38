"""Quantized KV cache (type_k/type_v analogue) + used-prefix attention
bucketing tests.

Parity targets: reference include/llama.h:304-311 (type_k/type_v cache
quantization) and the cache-prefix attention views (n_kv range in the
reference build path) — redesigned as per-row int8 scales consumed inside
the flash kernel and a static bucketed `n_vis` grid bound.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.ops.attention import attention_reference
from llama_kotlin_tpu.ops.pallas.flash import flash_attention
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.runtime.kv_cache import KVCache, quantize_rows

from tests.fixtures import (
    random_llama_weights,
    tiny_llama_dims,
    write_llama_gguf,
)
from llama_kotlin_tpu.models.loader import load_gguf_model


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    rng = np.random.default_rng(11)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("models") / "tiny_kvq.gguf"
    write_llama_gguf(path, weights, dims)
    return path


def _ctx(path, **kw):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    kw.setdefault("n_cells", 128)
    kw.setdefault("compute_dtype", jnp.float32)
    return LlamaContext(cfg, params, **kw)


def test_quantize_rows_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((3, 5, 64)).astype(np.float32))
    codes, scale = quantize_rows(x)
    assert codes.dtype == jnp.int8 and scale.shape == (3, 5)
    back = np.asarray(codes, np.float32) * np.asarray(scale)[..., None]
    err = np.abs(back - np.asarray(x)).max()
    assert err <= np.abs(np.asarray(x)).max() / 127.0 * 0.51 + 1e-7
    # zero rows quantize to zero (no NaN from 0/0)
    z, s = quantize_rows(jnp.zeros((2, 8)))
    assert not np.asarray(z).any() and not np.asarray(s).any()


def test_kv_quant_logits_parity(tiny_model):
    """int8 KV decode matches bf16-cache decode within quantization noise."""
    toks = np.array([3, 14, 15, 9, 2, 6], np.int32)
    ref = _ctx(tiny_model)
    ref.decode(Batch.single(toks))
    base = ref.get_logits()

    q = _ctx(tiny_model, kv_quant=True)
    assert q.cache.quantized and q.cache.k.dtype == jnp.int8
    q.decode(Batch.single(toks))
    got = q.get_logits()

    # prefill: only logits for the prompt tail; errors stay in the int8 class
    denom = np.abs(base).max()
    assert np.abs(got - base).max() / denom < 0.05

    # multi-step decode keeps tracking: greedy continuations agree
    for step in range(6):
        nb = int(np.argmax(base[-1]))
        ng = int(np.argmax(got[-1]))
        assert nb == ng, f"diverged at step {step}"
        pos = len(toks) + step
        ref.decode(Batch.single(np.array([nb], np.int32), pos0=pos))
        q.decode(Batch.single(np.array([ng], np.int32), pos0=pos))
        base, got = ref.get_logits(), q.get_logits()


def test_kv_quant_flash_kernel_interpret(rng):
    """Flash kernel (interpret) with int8 K/V + scales == reference
    attention on the dequantized cache."""
    kv, cells, d, h, nt = 2, 256, 64, 4, 8
    kf = rng.standard_normal((kv, cells, d)).astype(np.float32)
    vf = rng.standard_normal((kv, cells, d)).astype(np.float32)
    kc, ks = quantize_rows(jnp.asarray(kf))
    vc, vs = quantize_rows(jnp.asarray(vf))
    q = jnp.asarray(rng.standard_normal((nt, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((nt, cells)) < 0.7)

    out = flash_attention(q, kc, vc, mask, scale=0.125,
                          k_scale=ks, v_scale=vs, interpret=True)
    k_hat = np.asarray(kc, np.float32) * np.asarray(ks)[..., None]
    v_hat = np.asarray(vc, np.float32) * np.asarray(vs)[..., None]
    ref = attention_reference(q, jnp.asarray(k_hat), jnp.asarray(v_hat),
                              mask, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_n_vis_prefix(rng):
    """n_vis bounds the sweep: identical to full-array attention when all
    live cells sit in the prefix."""
    kv, cells, d, h, nt = 2, 512, 64, 4, 8
    n_vis = 256
    k = rng.standard_normal((kv, cells, d)).astype(np.float32)
    v = rng.standard_normal((kv, cells, d)).astype(np.float32)
    # cells beyond the prefix are garbage — they must never be read
    k[:, n_vis:] = np.nan
    v[:, n_vis:] = np.nan
    q = jnp.asarray(rng.standard_normal((nt, h, d)).astype(np.float32))
    mask_pre = jnp.asarray(rng.random((nt, n_vis)) < 0.6)

    out = flash_attention(q, jnp.asarray(k), jnp.asarray(v), mask_pre,
                          scale=0.125, n_vis=n_vis, interpret=True)
    ref = attention_reference(q, jnp.asarray(k[:, :n_vis]),
                              jnp.asarray(v[:, :n_vis]), mask_pre, scale=0.125)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vis_bucketing_exactness(tiny_model):
    """Bucketed attention span gives bit-identical logits to the
    full-span context (masked dead cells contribute nothing)."""
    toks = np.arange(10, dtype=np.int32) % 7 + 2
    full = _ctx(tiny_model, n_cells=1024, vis_bucketing=False)
    bucketed = _ctx(tiny_model, n_cells=1024, vis_bucketing=True)
    assert bucketed._vis_buckets[0] == 512 and bucketed._vis_buckets[-1] == 1024

    full.decode(Batch.single(toks))
    bucketed.decode(Batch.single(toks))
    a, b = full.get_logits(), bucketed.get_logits()
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # decode steps stay on the small bucket
    nxt = int(np.argmax(b[-1]))
    full.decode(Batch.single(np.array([nxt], np.int32), pos0=10))
    bucketed.decode(Batch.single(np.array([nxt], np.int32), pos0=10))
    np.testing.assert_allclose(full.get_logits(), bucketed.get_logits(),
                               rtol=1e-6, atol=1e-6)


def test_kv_quant_k_shift(tiny_model):
    """seq_add on a quantized cache rotates K via dequant/requant; decode
    afterwards matches the bf16-cache context's shifted decode."""
    toks = np.array([2, 9, 4, 7], np.int32)
    ref = _ctx(tiny_model)
    q = _ctx(tiny_model, kv_quant=True)
    for c in (ref, q):
        c.decode(Batch.single(toks))
        c.seq_add(0, 0, -1, -2)  # shift all positions down by 2
        c.decode(Batch.single(np.array([5], np.int32), pos0=2))
    base, got = ref.get_logits(), q.get_logits()
    # two rounds of int8 requantization noise (initial write + shift):
    # bound is loose because tiny random models have no margin structure
    assert np.abs(got - base).max() / np.abs(base).max() < 0.12


def test_kv_quant_state_roundtrip(tiny_model):
    """Save from a quantized ctx, restore into a fresh quantized ctx."""
    from llama_kotlin_tpu.runtime.state import get_state_data, set_state_data

    toks = np.array([4, 8, 3], np.int32)
    a = _ctx(tiny_model, kv_quant=True)
    a.decode(Batch.single(toks))
    blob = get_state_data(a)

    b = _ctx(tiny_model, kv_quant=True)
    set_state_data(b, blob)
    b.decode(Batch.single(np.array([6], np.int32), pos0=3))
    a.decode(Batch.single(np.array([6], np.int32), pos0=3))
    np.testing.assert_allclose(b.get_logits(), a.get_logits(),
                               rtol=1e-5, atol=1e-5)


def test_kv_quant_stacked_scan_path(tiny_model):
    """The lax.scan (stacked) forward handles quantized caches too."""
    toks = np.array([3, 14, 15, 9], np.int32)
    unrolled = _ctx(tiny_model, kv_quant=True, prefer_unrolled=True)
    stacked = _ctx(tiny_model, kv_quant=True, prefer_unrolled=False)
    assert "layers_stacked" in stacked.params
    unrolled.decode(Batch.single(toks))
    stacked.decode(Batch.single(toks))
    np.testing.assert_allclose(stacked.get_logits(), unrolled.get_logits(),
                               rtol=2e-4, atol=2e-4)


# -- int4 (q4_0-class) KV cache ---------------------------------------------


def test_quantize_rows_q4_roundtrip(rng):
    from llama_kotlin_tpu.runtime.kv_cache import quantize_rows_q4, unpack_q4_rows

    x = jnp.asarray(rng.standard_normal((3, 5, 64)).astype(np.float32))
    packed, scale = quantize_rows_q4(x)
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 5, 32)
    back = np.asarray(unpack_q4_rows(packed)) * np.asarray(scale)[..., None]
    err = np.abs(back - np.asarray(x)).max()
    assert err <= np.abs(np.asarray(x)).max() / 7.0 * 0.51 + 1e-7
    z, s = quantize_rows_q4(jnp.zeros((2, 8)))
    # zero rows: codes lo=8, hi=0 but scale 0 -> dequantizes to exactly 0
    assert not (np.asarray(unpack_q4_rows(z)) * np.asarray(s)[..., None]).any()


def test_kv_q4_flash_kernel_interpret(rng):
    """Flash kernel (interpret) with packed int4 K/V == reference attention
    on the dequantized cache (the AND-only nibble unpack + bias folds)."""
    from llama_kotlin_tpu.runtime.kv_cache import (
        dequantize_cache_layer,
        quantize_rows_q4,
    )

    kv, cells, d, h, nt = 2, 256, 128, 4, 8
    kf = rng.standard_normal((kv, cells, d)).astype(np.float32)
    vf = rng.standard_normal((kv, cells, d)).astype(np.float32)
    kc, ks = quantize_rows_q4(jnp.asarray(kf))
    vc, vs = quantize_rows_q4(jnp.asarray(vf))
    assert kc.shape == (kv, cells, d // 2)
    q = jnp.asarray(rng.standard_normal((nt, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((nt, cells)) < 0.7)

    out = flash_attention(q, kc, vc, mask, scale=0.125,
                          k_scale=ks, v_scale=vs, kv_bits=4, interpret=True)
    k_hat = dequantize_cache_layer(kc, ks, bits=4)
    v_hat = dequantize_cache_layer(vc, vs, bits=4)
    ref = attention_reference(q, k_hat, v_hat, mask, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kv_q4_logits_parity(tiny_model):
    """int4 KV decode tracks the bf16-cache decode within int4 noise and
    the cache arrays really are half-width."""
    toks = np.array([3, 14, 15, 9, 2, 6], np.int32)
    ref = _ctx(tiny_model)
    ref.decode(Batch.single(toks))
    base = ref.get_logits()

    q = _ctx(tiny_model, kv_quant="q4_0")
    assert q.cache.quantized and q.cache.kv_bits == 4
    assert q.cache.k.dtype == jnp.uint8
    assert q.cache.k.shape[-1] * 2 == ref.cache.k.shape[-1]
    q.decode(Batch.single(toks))
    got = q.get_logits()
    denom = np.abs(base).max()
    assert np.abs(got - base).max() / denom < 0.15  # int4 noise class

    # multi-step decode keeps tracking: feed the SAME token to both and
    # check the logits error stays in the int4 noise class (a random tiny
    # model's argmax can legitimately flip under 1/7-step quantization)
    for _ in range(4):
        nb = int(np.argmax(base[-1]))
        ref.decode(Batch.single(np.array([nb], np.int32),
                                pos0=ref.meta.seq_pos_max(0) + 1))
        q.decode(Batch.single(np.array([nb], np.int32),
                              pos0=q.meta.seq_pos_max(0) + 1))
        base, got = ref.get_logits(), q.get_logits()
        assert np.abs(got - base).max() / np.abs(base).max() < 0.2


def test_kv_q4_k_shift(tiny_model):
    """K-shift on an int4 cache: dequant->rotate->requant keeps greedy
    decode consistent after a context shift."""
    q = _ctx(tiny_model, kv_quant="q4_0")
    toks = np.arange(12, dtype=np.int32) % 9 + 1
    q.decode(Batch.single(toks))
    q.seq_rm(0, 0, 4)
    q.seq_add(0, 4, -1, -4)
    nxt = np.array([5], np.int32)
    rc = q.decode(Batch.single(nxt, pos0=q.meta.seq_pos_max(0) + 1))
    assert rc == 0
    assert np.isfinite(q.get_logits()).all()


def test_kv_q4_state_roundtrip(tiny_model):
    from llama_kotlin_tpu.runtime import state as state_io

    q = _ctx(tiny_model, kv_quant="q4_0")
    toks = np.array([4, 9, 2, 11], np.int32)
    q.decode(Batch.single(toks))
    logits_before = q.get_logits().copy()
    blob = state_io.get_state_data(q)

    q2 = _ctx(tiny_model, kv_quant="q4_0")
    state_io.set_state_data(q2, blob)
    nxt = int(np.argmax(logits_before[-1]))
    for ctx_ in (q, q2):
        rc = ctx_.decode(Batch.single(np.array([nxt], np.int32),
                                      pos0=ctx_.meta.seq_pos_max(0) + 1))
        assert rc == 0
    np.testing.assert_allclose(q.get_logits(), q2.get_logits(),
                               rtol=1e-5, atol=1e-5)


def test_flash_mla_head_dims(rng):
    """Flash kernel supports MLA-style unequal k/v head dims (deepseek2:
    k 192, v 128) — output takes the V dim (interpret mode vs reference)."""
    kv, cells, kd, vd, h, nt = 2, 256, 192, 128, 4, 8
    k = jnp.asarray(rng.standard_normal((kv, cells, kd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((kv, cells, vd)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((nt, h, kd)).astype(np.float32))
    mask = jnp.asarray(rng.random((nt, cells)) < 0.7)
    out = flash_attention(q, k, v, mask, scale=0.1, interpret=True)
    assert out is not None and out.shape == (nt, h, vd)
    ref = attention_reference(q, k, v, mask, scale=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("vd", [192, 256])
def test_flash_wide_v_head_dims(rng, vd):
    """v head dims wider than the 128-lane softmax stats (regression: the
    fixed scratch made vd=192/256 fail at trace time and silently fall
    back to the reference path forever)."""
    kv, cells, h, nt = 2, 256, 4, 8
    kd = vd
    k = jnp.asarray(rng.standard_normal((kv, cells, kd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((kv, cells, vd)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((nt, h, kd)).astype(np.float32))
    mask = jnp.asarray(rng.random((nt, cells)) < 0.7)
    out = flash_attention(q, k, v, mask, scale=0.1, interpret=True)
    assert out is not None and out.shape == (nt, h, vd)
    ref = attention_reference(q, k, v, mask, scale=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_metadata_device_view_not_aliased():
    """jnp.asarray on CPU can zero-copy alias numpy buffers; the decode
    path must hand the device COPIES of the live cell metadata, or an
    in-flight async decode reads later in-place mutations (the root cause
    of the historical test_kv_quant_k_shift / context-shift flakes)."""
    import numpy as np

    from llama_kotlin_tpu.runtime.kv_cache import CellMetadata

    meta = CellMetadata(64)
    meta.pos[:8] = np.arange(8)
    meta.seq[:8] = 1
    pos_dev, seq_dev = meta.device_view(16)
    meta.pos[:] = -5  # simulate a post-dispatch seq op mutating in place
    meta.seq[:] = 0
    assert np.asarray(pos_dev)[:8].tolist() == list(range(8))
    assert np.asarray(seq_dev)[:8].tolist() == [1] * 8
