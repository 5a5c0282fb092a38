"""Fused-projection serving fold: concat_qtensors + the decoder's
wqkv_fused / ffn_gateup_fused paths.

One kernel launch for q|k|v (and gate|up) replaces 2-3: each Pallas
invocation carries ~10-15us of fixed ramp on the decode path (round-3
device traces), so the reference's fused-QKV layout choice (cf.
build_starcoder / build_qwen keeping a single wqkv tensor) becomes a
load-time fold here.  These tests pin (a) concat numerics == stacked
individual matmuls for every fast-mode layout, (b) model-level logits
parity fused vs unfused, (c) the device-side synthetic builder's fused
output decodes.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.models.synthetic import (preset_config,
                                               synthetic_params,
                                               synthetic_params_device)
from llama_kotlin_tpu.ops.qmatmul import qmatmul
from llama_kotlin_tpu.quant.fold import fold_to_w4, fold_to_w8
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.quant.qtensor import concat_qtensors
from llama_kotlin_tpu.quant.repack import float_to_q8flat, repack_float
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext


def _mk(rng, n, k, layout):
    xf = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    if layout == "w4":
        return fold_to_w4(repack_float(xf, GGMLQuantType.Q4_K))
    if layout == "w4x":
        return fold_to_w4(repack_float(xf, GGMLQuantType.Q4_K), precise=True)
    if layout == "w8":
        return fold_to_w8(repack_float(xf, GGMLQuantType.Q6_K))
    if layout == "q8f":
        return float_to_q8flat(xf)
    return repack_float(xf, GGMLQuantType.Q4_K)  # plain QTensor


@pytest.mark.parametrize("layout", ["w4", "w4x", "w8", "q8f", "plain"])
def test_concat_matches_individual(rng, layout):
    k = 512
    parts = [_mk(rng, n, k, layout) for n in (256, 256, 512)]
    fused = concat_qtensors([jax.tree.map(jnp.asarray, p) for p in parts])
    assert fused.shape == (1024, k)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    ref = jnp.concatenate(
        [qmatmul(x, jax.tree.map(jnp.asarray, p), compute_dtype=jnp.float32)
         for p in parts], axis=-1)
    out = qmatmul(x, fused, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)


def test_concat_rejects_mismatch(rng):
    a = _mk(rng, 256, 512, "w4")
    b = _mk(rng, 256, 512, "w8")
    with pytest.raises(ValueError):
        concat_qtensors([a, b])


def _fuse_params(params):
    """Rewrite unfused layer params into the fused layout (test helper
    mirroring what the loader fold does)."""
    import copy

    out = copy.copy(params)
    out["layers"] = []
    for lp in params["layers"]:
        lp2 = dict(lp)
        lp2["wqkv_fused"] = concat_qtensors(
            [lp["wq"], lp["wk"], lp["wv"]])
        for k_ in ("wq", "wk", "wv"):
            del lp2[k_]
        if lp.get("ffn_gate") is not None:
            lp2["ffn_gateup_fused"] = concat_qtensors(
                [lp["ffn_gate"], lp["ffn_up"]])
            del lp2["ffn_gate"], lp2["ffn_up"]
        out["layers"].append(lp2)
    return out


@pytest.mark.parametrize("mode", ["w4a8", "int8"])
def test_fused_model_logits_parity(rng, mode):
    cfg = preset_config("test-tiny")
    params = synthetic_params(cfg, GGMLQuantType.Q4_K,
                              fast_int8=(mode == "int8"),
                              fast_w4a8=(mode == "w4a8"))
    prompt = rng.integers(0, cfg.vocab_size, 6).astype(np.int32)

    ctx = LlamaContext(cfg, params, n_cells=64)
    assert ctx.decode(Batch.single(prompt)) == 0
    ref = np.asarray(ctx.get_logits()[0])

    cfg2 = preset_config("test-tiny")
    ctx2 = LlamaContext(cfg2, _fuse_params(params), n_cells=64)
    assert ctx2.decode(Batch.single(prompt)) == 0
    got = np.asarray(ctx2.get_logits()[0])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fast_mode", [None, "w4", "int8"])
def test_loader_fuse_logits_parity(rng, tmp_path, fast_mode):
    """load_gguf_model(fuse=True) serves byte-identical logits to the
    unfused load (same QTensors, concatenated)."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from tests.fixtures import (random_llama_weights, tiny_llama_dims,
                                write_llama_gguf)

    dims = tiny_llama_dims()
    w = random_llama_weights(dims, rng)
    path = tmp_path / "m.gguf"
    write_llama_gguf(path, w, dims, qtype=GGMLQuantType.Q4_K)

    cfg, params, f = load_gguf_model(path, fast_mode=fast_mode)
    f.close()
    cfg2, params2, f2 = load_gguf_model(path, fast_mode=fast_mode, fuse=True)
    f2.close()
    assert "wqkv_fused" in params2["layers"][0]
    assert "ffn_gateup_fused" in params2["layers"][0]

    prompt = rng.integers(0, dims["vocab"], 7).astype(np.int32)
    ctx = LlamaContext(cfg, params, n_cells=64)
    assert ctx.decode(Batch.single(prompt)) == 0
    ref = np.asarray(ctx.get_logits()[0])
    ctx2 = LlamaContext(cfg2, params2, n_cells=64)
    assert ctx2.decode(Batch.single(prompt)) == 0
    got = np.asarray(ctx2.get_logits()[0])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_synthetic_device_fused_decodes(rng):
    cfg = preset_config("test-tiny")
    params = synthetic_params_device(cfg, GGMLQuantType.Q4_K,
                                     fast_w4a8=True, fuse=True)
    lp = params["layers"][0]
    assert "wqkv_fused" in lp and "wq" not in lp
    assert "ffn_gateup_fused" in lp and "ffn_gate" not in lp
    ctx = LlamaContext(cfg, params, n_cells=64)
    prompt = rng.integers(0, cfg.vocab_size, 5).astype(np.int32)
    assert ctx.decode(Batch.single(prompt)) == 0
    logits = np.asarray(ctx.get_logits()[0])
    assert np.isfinite(logits).all()
