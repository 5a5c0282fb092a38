"""Fast-mode Pallas kernels under a tensor-parallel mesh (shard_map path).

XLA's SPMD partitioner cannot split a Pallas custom call, so
ops/qmatmul.py wraps the fast kernels in jax.shard_map when a weight
carries a tp_axis marker (parallel/sharding.py) and ops/attention.py does
the same for the flash kernel over the tp-split head axis.  These tests
run the REAL kernels in interpret mode on the 8-virtual-device CPU mesh
(LKTPU_FORCE_PALLAS_INTERPRET=1) and assert both numerics parity and that
the kernel path actually executed (no silent dequant fallback — the
property the reference guarantees by running its hot loop under every
split mode, ggml-backend.c:1258-1841).
"""

from __future__ import annotations

import pathlib
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.quant.fold import fold_to_w4, fold_to_w8
from llama_kotlin_tpu.quant.repack import repack_float

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setenv("LKTPU_FORCE_PALLAS_INTERPRET", "1")


def _mesh(dp=1, tp=2):
    from llama_kotlin_tpu.parallel.mesh import make_mesh, set_active_mesh

    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])
    set_active_mesh(mesh)
    return mesh


def _count_calls(monkeypatch, module, name):
    calls = []
    orig = getattr(module, name)

    def wrapper(*a, **kw):
        out = orig(*a, **kw)
        if out is not None:
            calls.append(name)
        return out

    monkeypatch.setattr(module, name, wrapper)
    return calls


@needs_mesh
@pytest.mark.parametrize("axis", [0, 1])
def test_tp_qmatmul_kernel_parity(monkeypatch, axis):
    """Column- and row-parallel W4 matmuls run the block-diagonal kernel
    per shard and match the unsharded kernel to f32 noise."""
    import importlib

    qm = importlib.import_module("llama_kotlin_tpu.ops.qmatmul")
    from llama_kotlin_tpu.ops.pallas import qmm_w4
    from llama_kotlin_tpu.parallel.sharding import _put
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(dp=1, tp=2)
    rng = np.random.default_rng(7)
    n, k = 512, 2048  # local: column (256, 2048), row (512, 1024) — both plan
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = fold_to_w4(repack_float(wf, GGMLQuantType.Q4_K))
    x = jnp.asarray((rng.standard_normal((8, k)) * 0.5).astype(np.float32))

    y_ref = qm.qmatmul(x, qt, compute_dtype=jnp.float32)

    spec = P("tp", None) if axis == 0 else P(None, "tp")
    qt_sh = _put(qt, mesh, spec)
    assert qt_sh.tp_axis == axis

    calls = _count_calls(monkeypatch, qmm_w4, "qmm_w4_matmul")
    with mesh:
        y_sh = qm.qmatmul(x, qt_sh, compute_dtype=jnp.float32)
    assert calls, "W4 kernel did not execute under the tp mesh"
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


@needs_mesh
@pytest.mark.parametrize("axis", [0, 1])
def test_tp_qmatmul_w8_kernel_parity(monkeypatch, axis):
    """The W8 (exact int8-code) kernel also runs per shard under tp."""
    import importlib

    qm = importlib.import_module("llama_kotlin_tpu.ops.qmatmul")
    from llama_kotlin_tpu.ops.pallas import qmm_w8
    from llama_kotlin_tpu.parallel.sharding import _put
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(dp=1, tp=2)
    rng = np.random.default_rng(8)
    n, k = 512, 2048
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = fold_to_w8(repack_float(wf, GGMLQuantType.Q6_K))
    x = jnp.asarray((rng.standard_normal((8, k)) * 0.5).astype(np.float32))

    y_ref = qm.qmatmul(x, qt, compute_dtype=jnp.float32)
    qt_sh = _put(qt, mesh, P("tp", None) if axis == 0 else P(None, "tp"))
    calls = _count_calls(monkeypatch, qmm_w8, "qmm_w8_matmul")
    with mesh:
        y_sh = qm.qmatmul(x, qt_sh, compute_dtype=jnp.float32)
    assert calls, "W8 kernel did not execute under the tp mesh"
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


@needs_mesh
def test_tp_ffn_megakernel_parity(monkeypatch):
    """The FFN megakernel (separate gate/up layout) dispatches PER SHARD
    under the tp mesh (ops/qmatmul._tp_qmm_ffn) and matches the unsharded
    megakernel to f32 reduce-association tolerance (the row-parallel down
    psums per-shard f-block partials)."""
    import importlib

    qm = importlib.import_module("llama_kotlin_tpu.ops.qmatmul")
    from llama_kotlin_tpu.ops.pallas import qmm_w4_ffn
    from llama_kotlin_tpu.parallel.sharding import _put
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(dp=1, tp=2)
    rng = np.random.default_rng(11)
    E, F = 2048, 4096  # per-shard F=2048: bf=1024 plan holds
    gate = fold_to_w4(repack_float(
        (rng.standard_normal((F, E)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K))
    up = fold_to_w4(repack_float(
        (rng.standard_normal((F, E)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K))
    dn = fold_to_w4(repack_float(
        (rng.standard_normal((E, F)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K))
    x = jnp.asarray((rng.standard_normal((2, E)) * 0.5).astype(np.float32))

    y_ref = qm.qmm_ffn(x, jax.tree.map(jnp.asarray, gate),
                       jax.tree.map(jnp.asarray, dn), act="silu",
                       up=jax.tree.map(jnp.asarray, up))
    assert y_ref is not None, "unsharded separate-tensor megakernel declined"

    gate_sh = _put(gate, mesh, P("tp", None))
    up_sh = _put(up, mesh, P("tp", None))
    dn_sh = _put(dn, mesh, P(None, "tp"))
    assert gate_sh.tp_axis == 0 and dn_sh.tp_axis == 1
    calls = _count_calls(monkeypatch, qmm_w4_ffn, "qmm_w4_ffn_matmul")
    with mesh:
        y_sh = qm.qmm_ffn(x, gate_sh, dn_sh, act="silu", up=up_sh)
    assert y_sh is not None, "TP megakernel path declined"
    assert calls, "megakernel did not execute under the tp mesh"
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=2e-3, rtol=1e-3)


@needs_mesh
def test_tp_qmatmul_declines_misaligned_row_shard():
    """A row shard whose local k doesn't fit the kernel plan must NOT take
    the shard_map path (sharded numerics stay mode-consistent): the global
    dequant fallback serves instead."""
    import importlib

    qm = importlib.import_module("llama_kotlin_tpu.ops.qmatmul")
    from llama_kotlin_tpu.parallel.sharding import _put
    from llama_kotlin_tpu.quant.qtensor import dequantize
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(dp=1, tp=8)
    rng = np.random.default_rng(9)
    n, k = 512, 2048  # local k 256 -> kc 128: W4 plan is None
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = fold_to_w4(repack_float(wf, GGMLQuantType.Q4_K))
    qt_sh = _put(qt, mesh, P(None, "tp"))
    assert qt_sh.tp_axis == 1
    x = jnp.asarray((rng.standard_normal((8, k)) * 0.5).astype(np.float32))
    with mesh:
        y = qm.qmatmul(x, qt_sh, compute_dtype=jnp.float32)
    # dequant fallback is exact f32: matches the dense product tightly
    y_dense = x @ np.asarray(dequantize(qt, dtype=jnp.float32)).T
    np.testing.assert_allclose(np.asarray(y), y_dense, atol=1e-3, rtol=1e-4)


@pytest.fixture(scope="module")
def tp_model():
    """Q4_K model whose dims keep every matmul kernel-eligible per shard at
    tp=2 (k % 2048 == 0 so row shards still satisfy the 512-plane-column
    chunk)."""
    rng = np.random.default_rng(77)
    dims = tiny_llama_dims(n_embd=2048, n_layer=1, n_head=16, n_head_kv=8,
                           n_ff=4096, vocab=512)
    weights = random_llama_weights(dims, rng)
    path = pathlib.Path(tempfile.mkdtemp()) / "tpk.gguf"
    write_llama_gguf(path, weights, dims, qtype=GGMLQuantType.Q4_K)
    return path


@needs_mesh
@pytest.mark.parametrize("fast_mode", ["w4", "w4x"])
def test_tp_sharded_w4_decode_runs_kernels(monkeypatch, tp_model, fast_mode):
    """End-to-end decode with TP-sharded W4/W4X weights: every projection
    runs the block-diagonal kernel under shard_map (column AND row), and
    the logits match the unsharded fast-mode run."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.ops.pallas import qmm_w4
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext

    toks = np.array([3, 17, 42, 9], np.int32)

    cfg, params, f = load_gguf_model(tp_model, compute_dtype=jnp.float32,
                                     fast_mode=fast_mode)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    base = ctx.get_logits()

    mesh = _mesh(dp=1, tp=2)
    params_sh = shard_params(params, cfg, mesh)
    assert params_sh["layers"][0]["wq"].tp_axis == 0
    assert params_sh["layers"][0]["ffn_down"].tp_axis == 1
    calls = _count_calls(monkeypatch, qmm_w4, "qmm_w4_matmul")
    from llama_kotlin_tpu.ops.pallas import qmm_w4_ffn
    ffn_calls = _count_calls(monkeypatch, qmm_w4_ffn, "qmm_w4_ffn_matmul")
    ctx_tp = LlamaContext(cfg, params_sh, n_cells=64, compute_dtype=jnp.float32)
    ctx_tp.cache = shard_cache(ctx_tp.cache, mesh)
    with mesh:
        ctx_tp.decode(Batch.single(toks, logits_last_only=False))
        sharded = ctx_tp.get_logits()
    # wq, wk, wv, wo + output head on the W4 kernel; gate|up|down go
    # through the per-shard FFN megakernel when the shapes qualify (w4x
    # tensors are megakernel-ineligible and use the two-launch kernels)
    assert len(calls) + 3 * len(ffn_calls) >= 8, \
        f"kernels ran only {len(calls)}+ffn:{len(ffn_calls)} times"
    np.testing.assert_allclose(sharded, base, atol=2e-3, rtol=1e-3)


@needs_mesh
def test_tp_sharded_flash_attention_runs_kernel(monkeypatch):
    """TP-sharded decode runs the flash kernel per head shard via shard_map
    (int8-quantized KV: codes and per-row scales split on the KV axis)."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.ops.pallas import flash as flash_mod
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext

    rng = np.random.default_rng(78)
    dims = tiny_llama_dims(n_embd=512, n_layer=2, n_head=8, n_head_kv=4,
                           n_ff=768, vocab=256)
    weights = random_llama_weights(dims, rng)
    path = pathlib.Path(tempfile.mkdtemp()) / "tpfl.gguf"
    write_llama_gguf(path, weights, dims)
    toks = np.array([3, 17, 42, 9, 7, 1, 2, 5], np.int32)

    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=128, compute_dtype=jnp.float32,
                       kv_quant="q8_0", prefer_unrolled=True)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    base = ctx.get_logits()

    mesh = _mesh(dp=2, tp=4)
    params_sh = shard_params(params, cfg, mesh)
    ctx_tp = LlamaContext(cfg, params_sh, n_cells=128,
                          compute_dtype=jnp.float32, kv_quant="q8_0",
                          prefer_unrolled=True)
    ctx_tp.cache = shard_cache(ctx_tp.cache, mesh)
    assert ctx_tp.cache.tp == 4
    calls = _count_calls(monkeypatch, flash_mod, "flash_attention")
    with mesh:
        ctx_tp.decode(Batch.single(toks, logits_last_only=False))
        sharded = ctx_tp.get_logits()
    assert calls, "flash kernel did not execute under the tp mesh"
    np.testing.assert_allclose(sharded, base, atol=2e-3, rtol=1e-3)


@pytest.fixture(autouse=True)
def _reset_mesh():
    yield
    from llama_kotlin_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)
