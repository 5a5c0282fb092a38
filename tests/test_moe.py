"""MoE (Mixtral-style) tests vs transformers MixtralForCausalLM oracle."""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext

from tests.fixtures import (
    build_hf_mixtral,
    random_mixtral_weights,
    tiny_mixtral_dims,
    write_mixtral_gguf,
)


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    rng = np.random.default_rng(31)
    dims = tiny_mixtral_dims()
    weights = random_mixtral_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "moe.gguf"
    write_mixtral_gguf(path, weights, dims)
    return path, weights, dims


def test_moe_config_and_load(moe_model):
    path, _, dims = moe_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.n_expert == dims["n_expert"]
    assert cfg.n_expert_used == dims["n_expert_used"]
    layer = params["layers"][0]
    assert len(layer["ffn_gate_exps"]) == dims["n_expert"]
    assert layer["ffn_gate_inp"].shape == (dims["n_expert"], dims["n_embd"])


def test_moe_logits_match_transformers(moe_model):
    import torch

    path, weights, dims = moe_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    hf = build_hf_mixtral(weights, dims)

    toks = np.array([3, 17, 42, 9, 101], np.int32)
    assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
    ours = ctx.get_logits()
    with torch.no_grad():
        theirs = hf(torch.from_numpy(toks[None].astype(np.int64))).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-3)


def test_grouped_ffn_matches_sweep(rng):
    """ops/moe.py ragged grouped path == the dense expert sweep."""
    import jax
    import jax.numpy as jnp
    from llama_kotlin_tpu.ops.moe import moe_grouped_ffn

    nt, d, f, E, k = 5, 32, 48, 8, 2
    x = jnp.asarray(rng.standard_normal((nt, d)).astype(np.float32))
    wg = jnp.asarray(rng.standard_normal((E, f, d)).astype(np.float32) * 0.1)
    wu = jnp.asarray(rng.standard_normal((E, f, d)).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.standard_normal((E, d, f)).astype(np.float32) * 0.1)
    probs = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((nt, E)).astype(np.float32)), -1)
    top_w, top_i = jax.lax.top_k(probs, k)
    act = jax.nn.silu

    got = moe_grouped_ffn(x, wg, wu, wd, top_i, top_w, act)

    ref = np.zeros((nt, d), np.float32)
    for e in range(E):
        w_tok = np.asarray(jnp.sum(jnp.where(top_i == e, top_w, 0.0), -1))
        y = np.asarray(act(x @ wg[e].T) * (x @ wu[e].T)) @ np.asarray(wd[e]).T
        ref += w_tok[:, None] * y
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_grouped_path_selected_for_stacked(moe_model):
    """The loader produces stacked dense experts and forward routes them
    through the grouped path (same logits as before the optimisation)."""
    path, _, _ = moe_model
    cfg, params, fobj = load_gguf_model(path, compute_dtype=jnp.float32)
    fobj.close()
    w = params["layers"][0]["ffn_gate_exps"]
    assert not isinstance(w, list) and w.ndim == 3


def test_gathered_quant_matches_sweep(rng):
    """ops/moe.py gathered quantized path (stacked QTensors, routed-only
    gather) == the dense expert sweep on the same dequantized weights."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.ops.moe import moe_gathered_quant
    from llama_kotlin_tpu.quant import qtensor
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.quant.repack import repack_float

    nt, d, f, E, k = 3, 256, 256, 16, 2
    mk = lambda n_, k_: [repack_float(
        (rng.standard_normal((n_, k_)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K) for _ in range(E)]
    qg = jax.tree.map(jnp.asarray, qtensor.stack_qtensors(mk(f, d)))
    qu = jax.tree.map(jnp.asarray, qtensor.stack_qtensors(mk(f, d)))
    qd = jax.tree.map(jnp.asarray, qtensor.stack_qtensors(mk(d, f)))

    x = jnp.asarray(rng.standard_normal((nt, d)).astype(np.float32))
    probs = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((nt, E)).astype(np.float32)), -1)
    top_w, top_i = jax.lax.top_k(probs, k)
    act = jax.nn.silu

    got = np.asarray(moe_gathered_quant(x, qg, qu, qd, top_i, top_w, act,
                                        compute_dtype=jnp.float32))

    ref = np.zeros((nt, d), np.float32)
    for e in range(E):
        w_tok = np.asarray(jnp.sum(jnp.where(top_i == e, top_w, 0.0), -1))
        wg = np.asarray(qtensor.dequantize(qg[e]))
        wu = np.asarray(qtensor.dequantize(qu[e]))
        wd = np.asarray(qtensor.dequantize(qd[e]))
        y = np.asarray(act(jnp.asarray(x @ wg.T)) * (x @ wu.T)) @ wd.T
        ref += w_tok[:, None] * y
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_gathered_path_selected_for_quantized_decode(tmp_path):
    """A quantized MoE model with a large expert count routes decode-shaped
    batches through moe_gathered_quant with logits matching the sweep."""
    import jax.numpy as jnp
    from unittest import mock

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.ops import moe as moe_ops
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.quant.qtensor import QTensor
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext

    rng = np.random.default_rng(71)
    # E must exceed the padded slot count (token bucket 8 x k = 16) for
    # the gather to beat the sweep — arctic/qwen2moe class
    dims = tiny_mixtral_dims(n_embd=256, n_ff=256, vocab=128,
                             n_expert=32, n_expert_used=2)
    weights = random_mixtral_weights(dims, rng)
    path = tmp_path / "moe_q.gguf"
    write_mixtral_gguf(path, weights, dims, qtype=GGMLQuantType.Q4_K)

    cfg, params, fobj = load_gguf_model(path, compute_dtype=jnp.float32)
    fobj.close()
    w = params["layers"][0]["ffn_gate_exps"]
    assert isinstance(w, QTensor) and w.is_stacked and len(w) == 32

    toks = np.array([3, 7], np.int32)  # decode-shaped (nt*k < n_expert)
    calls = []
    orig = moe_ops.moe_gathered_quant

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    with mock.patch.object(moe_ops, "moe_gathered_quant", side_effect=spy):
        ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
        assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
        gathered = ctx.get_logits()
    assert calls, "gathered quantized MoE path was not selected"

    np.testing.assert_allclose(
        gathered, _sweep_logits(cfg, params, toks), rtol=2e-3, atol=2e-3)


def _sweep_logits(cfg, params, toks):
    """Reference logits with the gathered path replaced by an explicit
    dense-sweep equivalent over the same stacked QTensors."""
    import jax.numpy as jnp
    from unittest import mock

    from llama_kotlin_tpu.ops import moe as moe_ops
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.quant import qtensor as QT

    def sweep_equiv(x, qg, qu, qd, top_i, top_w, act, compute_dtype):
        nt = x.shape[0]
        down = jnp.zeros((nt, x.shape[1]), jnp.float32)
        E = len(qg)
        for e in range(E):
            w_tok = jnp.sum(jnp.where(top_i == e, top_w, 0.0), axis=-1)
            g = jnp.dot(x.astype(compute_dtype), QT.dequantize(qg[e], compute_dtype).T)
            u = jnp.dot(x.astype(compute_dtype), QT.dequantize(qu[e], compute_dtype).T)
            fe = act(g) * u
            de = jnp.dot(fe.astype(compute_dtype), QT.dequantize(qd[e], compute_dtype).T)
            down = down + w_tok[:, None] * de.astype(jnp.float32)
        return down

    with mock.patch.object(moe_ops, "moe_gathered_quant", new=sweep_equiv):
        ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
        assert ctx.decode(Batch.single(toks, logits_last_only=False)) == 0
        return ctx.get_logits()


def test_loader_fast_mode_expert_policy(tmp_path):
    """Fast-mode expert layout policy: E <= 16 -> per-expert W4/Q8F fold
    LIST (sweep hits the block-diagonal/int8 kernels); E > 16 or exact
    mode -> stacked standard QTensor (routed-expert gather)."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.quant.qtensor import QTensor
    from tests.fixtures import (
        random_mixtral_weights,
        tiny_mixtral_dims,
        write_mixtral_gguf,
    )

    rng = np.random.default_rng(5)
    for ne, fm, want in [(8, "w4", "w4list"), (8, "int8", "q8list"),
                         (8, None, "stacked"), (32, "w4", "stacked")]:
        dims = tiny_mixtral_dims(n_embd=256, n_ff=256, n_expert=ne,
                                 n_expert_used=2, vocab=160)
        p = tmp_path / f"m{ne}_{fm}.gguf"
        write_mixtral_gguf(p, random_mixtral_weights(dims, rng), dims,
                           qtype=GGMLQuantType.Q4_K)
        cfg, params, f = load_gguf_model(p, fast_mode=fm)
        f.close()
        g = params["layers"][0]["ffn_gate_exps"]
        if want == "stacked":
            assert isinstance(g, QTensor) and g.is_stacked, (ne, fm)
        else:
            assert isinstance(g, list) and len(g) == ne, (ne, fm)
            assert (g[0].aux is not None) == (want == "w4list"), (ne, fm)
