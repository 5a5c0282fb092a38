"""On-device generate loop vs step-wise decode, and tensor-parallel logits
parity on the 8-virtual-device CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.runtime.generate import SampleParams, generate

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    rng = np.random.default_rng(41)
    dims = tiny_llama_dims()
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    write_llama_gguf(path, weights, dims)
    return path


def _ctx(path, **kw):
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    kw.setdefault("n_cells", 128)
    kw.setdefault("compute_dtype", jnp.float32)
    return LlamaContext(cfg, params, **kw)


def test_generate_loop_matches_stepwise(model):
    prompt = np.array([3, 17, 42], np.int32)
    n = 8

    ctx1 = _ctx(model)
    ctx1.decode(Batch.single(prompt))
    toks = [int(np.argmax(ctx1.get_logits()[0]))]
    pos = len(prompt)
    while len(toks) < n:
        ctx1.decode(Batch(tokens=[toks[-1]], pos=[pos], seq_id=[0], output=[True]))
        toks.append(int(np.argmax(ctx1.get_logits()[0])))
        pos += 1

    ctx2 = _ctx(model)
    loop_toks = generate(ctx2, prompt, n, SampleParams())
    assert loop_toks == toks


def test_tp_sharded_logits_match_single_device(model):
    """Shard the model over a (2, 4) mesh; logits must match unsharded."""
    from llama_kotlin_tpu.parallel.mesh import make_mesh
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")

    # dims must divide tp=4: use a purpose-built model
    import tempfile, pathlib

    rng = np.random.default_rng(52)
    dims = tiny_llama_dims(n_embd=128, n_head=8, n_head_kv=4, n_ff=256, vocab=256)
    weights = random_llama_weights(dims, rng)
    path = pathlib.Path(tempfile.mkdtemp()) / "tp.gguf"
    write_llama_gguf(path, weights, dims)

    toks = np.array([3, 17, 42, 9], np.int32)

    ctx = _ctx(path, n_cells=64)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    base = ctx.get_logits()

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    mesh = make_mesh(dp=2, tp=4)
    params = shard_params(params, cfg, mesh)
    ctx_tp = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ctx_tp.cache = shard_cache(ctx_tp.cache, mesh)
    with mesh:
        ctx_tp.decode(Batch.single(toks, logits_last_only=False))
        sharded = ctx_tp.get_logits()

    np.testing.assert_allclose(sharded, base, atol=1e-4, rtol=1e-3)


def test_tp_sharded_moe_logits_match(tmp_path):
    """MoE experts TP-sharded per expert (EXPERT_COLUMN/ROW rules) must
    match unsharded logits — the §2.7 expert-parallel row."""
    from llama_kotlin_tpu.parallel.mesh import make_mesh
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params
    from tests.fixtures import random_mixtral_weights, tiny_mixtral_dims, write_mixtral_gguf

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    rng = np.random.default_rng(61)
    dims = tiny_mixtral_dims(n_embd=128, n_head=8, n_head_kv=4, n_ff=256,
                             vocab=256, n_expert=4, n_expert_used=2)
    weights = random_mixtral_weights(dims, rng)
    path = tmp_path / "moe_tp.gguf"
    write_mixtral_gguf(path, weights, dims)

    toks = np.array([3, 17, 42, 9], np.int32)
    ctx = _ctx(path, n_cells=64)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    base = ctx.get_logits()

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    mesh = make_mesh(dp=2, tp=4)
    params = shard_params(params, cfg, mesh)
    # experts really got the tp layout
    e0 = params["layers"][0]["ffn_gate_exps"][0]
    spec = (e0.codes if hasattr(e0, "codes") else e0).sharding.spec
    assert spec[0] == "tp"
    ctx_tp = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ctx_tp.cache = shard_cache(ctx_tp.cache, mesh)
    with mesh:
        ctx_tp.decode(Batch.single(toks, logits_last_only=False))
        sharded = ctx_tp.get_logits()
    np.testing.assert_allclose(sharded, base, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("kvq", ["q8_0", "q4_0"])
def test_tp_sharded_quantized_kv_matches_single_device(kvq):
    """Quantized-KV caches (int8 + packed int4) shard their code AND scale
    arrays over the tp mesh axis; logits must match the unsharded
    quantized run exactly (same quantization, different layout)."""
    from llama_kotlin_tpu.parallel.mesh import make_mesh
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    import pathlib
    import tempfile

    rng = np.random.default_rng(53)
    dims = tiny_llama_dims(n_embd=128, n_head=8, n_head_kv=4, n_ff=256, vocab=256)
    weights = random_llama_weights(dims, rng)
    path = pathlib.Path(tempfile.mkdtemp()) / "tpq.gguf"
    write_llama_gguf(path, weights, dims)
    toks = np.array([3, 17, 42, 9], np.int32)

    ctx = _ctx(path, n_cells=64, kv_quant=kvq)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    base = ctx.get_logits()

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    mesh = make_mesh(dp=2, tp=4)
    params = shard_params(params, cfg, mesh)
    ctx_tp = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32,
                          kv_quant=kvq)
    assert ctx_tp.cache.kv_bits == (4 if kvq == "q4_0" else 8)
    ctx_tp.cache = shard_cache(ctx_tp.cache, mesh)
    with mesh:
        ctx_tp.decode(Batch.single(toks, logits_last_only=False))
        sharded = ctx_tp.get_logits()
    np.testing.assert_allclose(sharded, base, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("fast_mode", ["w4", "w4x", "int8"])
def test_tp_sharded_fast_mode_logits_match(fast_mode):
    """Fast-mode (W4/W4X/Q8F) weights shard over the tp axis — including
    the TRANSPOSED aux scale planes and rank-0 markers — and produce the
    same logits as the unsharded fast-mode run (CPU exercises the XLA
    fallback paths; kernel specs are identical by construction)."""
    from llama_kotlin_tpu.parallel.mesh import make_mesh
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    import pathlib
    import tempfile

    rng = np.random.default_rng(54)
    dims = tiny_llama_dims(n_embd=512, n_head=8, n_head_kv=4, n_ff=1024,
                           vocab=256)
    weights = random_llama_weights(dims, rng)
    path = pathlib.Path(tempfile.mkdtemp()) / "tpf.gguf"
    from llama_kotlin_tpu.quant.formats import GGMLQuantType

    write_llama_gguf(path, weights, dims, qtype=GGMLQuantType.Q4_K)
    toks = np.array([3, 17, 42, 9], np.int32)

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32,
                                     fast_mode=fast_mode)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    base = ctx.get_logits()

    mesh = make_mesh(dp=2, tp=4)
    params_sh = shard_params(params, cfg, mesh)
    # aux planes must carry the swapped spec, markers replicate
    wq = params_sh["layers"][0]["wq"]
    if wq.aux is not None:
        for k, v in wq.aux.items():
            if getattr(v, "ndim", 0) == 2:
                sp = tuple(v.sharding.spec)
                assert "tp" in sp and sp[0] != "tp", (k, sp)
    ctx_tp = LlamaContext(cfg, params_sh, n_cells=64, compute_dtype=jnp.float32)
    ctx_tp.cache = shard_cache(ctx_tp.cache, mesh)
    with mesh:
        ctx_tp.decode(Batch.single(toks, logits_last_only=False))
        sharded = ctx_tp.get_logits()
    np.testing.assert_allclose(sharded, base, atol=1e-4, rtol=1e-3)
