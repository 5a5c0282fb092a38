"""Mosaic-under-shard_map proof on the real chip (VERDICT r3 #5).

The TP fast path (ops/qmatmul._tp_qmatmul, ops/attention._tp_attention)
had only ever executed in interpret mode on virtual CPU devices; real
multi-chip hardware is unavailable here.  This script runs the SAME
shard_map wrappers over a 1-device mesh on the real TPU — numerically a
no-op split, but it proves Mosaic accepts the shard_map-wrapped kernels
(qmm_w4 block-diagonal + flash attention) on hardware and measures the
dispatch overhead vs the unsharded kernels.

Reference analogue: the reference runs its hot loop under every backend
split mode (ggml-backend.c:1258-1841).

Usage:  timeout 1800 python scripts/tp_onchip.py
Writes JSON rows; multi-second rep loops (host wall-clock of sub-ms
device calls through the tunnel is garbage — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ["LKTPU_TP_PROVE1"] = "1"


def timed_loop(fn, x, reps: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x + acc[..., :1])
            return acc + y[..., :1] * 1e-30
        return jax.lax.fori_loop(
            0, reps, body, jnp.zeros(x.shape[:-1] + (1,), jnp.float32))

    jax.block_until_ready(run(x))  # compile + warm
    t0 = time.time()
    jax.block_until_ready(run(x))
    return (time.time() - t0) / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    import importlib

    # ops/__init__ re-exports the qmatmul FUNCTION, shadowing the
    # submodule on attribute imports — resolve the module explicitly
    qm = importlib.import_module("llama_kotlin_tpu.ops.qmatmul")
    from llama_kotlin_tpu.ops.attention import _tp_attention, attention_reference
    from llama_kotlin_tpu.parallel.mesh import make_mesh, set_active_mesh
    from llama_kotlin_tpu.parallel.sharding import _put
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.quant.fold import fold_to_w4
    from llama_kotlin_tpu.quant.repack import repack_float
    from llama_kotlin_tpu.utils.profiling import enable_compile_cache
    from jax.sharding import PartitionSpec as P

    enable_compile_cache()
    dev = jax.devices()[0]
    print(json.dumps({"backend": dev.platform, "device": str(dev),
                      "interpret_forced":
                          os.environ.get("LKTPU_FORCE_PALLAS_INTERPRET", "")}),
          flush=True)
    assert dev.platform != "cpu", "this proof must run on the TPU"

    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    rng = np.random.default_rng(3)

    # ---- W4 block-diagonal kernel, column- and row-parallel shard_map ----
    n, k = 4096, 4096
    wf = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    qt = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(wf, GGMLQuantType.Q4_K)))
    x = jnp.asarray((rng.standard_normal((2, k)) * 0.5).astype(np.float32))
    reps = 2000

    set_active_mesh(None)
    base = qm.qmatmul(x, qt, compute_dtype=jnp.bfloat16)
    dt0 = timed_loop(lambda xx: qm.qmatmul(xx, qt, compute_dtype=jnp.bfloat16),
                     x, reps)
    for axis, spec in ((0, P("tp", None)), (1, P(None, "tp"))):
        qt_sh = _put(qt, mesh, spec)
        assert qt_sh.tp_axis == axis
        set_active_mesh(mesh)
        y = qm._tp_qmatmul(x, qt_sh, compute_dtype=jnp.bfloat16)
        assert y is not None, "tp fast path declined"
        np.testing.assert_allclose(np.asarray(y), np.asarray(base),
                                   atol=2e-2, rtol=2e-2)
        dt1 = timed_loop(
            lambda xx: qm._tp_qmatmul(xx, qt_sh, compute_dtype=jnp.bfloat16),
            x, reps)
        set_active_mesh(None)
        print(json.dumps({
            "kind": "w4_shardmap", "axis": axis, "shape": [n, k],
            "unsharded_ms": round(dt0 * 1e3, 4),
            "shardmap_ms": round(dt1 * 1e3, 4),
            "overhead_pct": round((dt1 / dt0 - 1) * 100, 1)}), flush=True)

    # ---- flash attention under shard_map over the (1-way) head axis ----
    set_active_mesh(mesh)  # _tp_attention declines without an active mesh
    H, KV, D, cells, nt = 32, 8, 128, 1024, 2
    q = jnp.asarray(rng.standard_normal((nt, H, D)), jnp.float32).astype(jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((KV, cells, D)), jnp.float32).astype(jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((KV, cells, D)), jnp.float32).astype(jnp.bfloat16)
    mask = jnp.ones((nt, cells), jnp.int8)
    scale = 1.0 / np.sqrt(D)

    from llama_kotlin_tpu.ops.pallas.flash import flash_attention

    def unsharded(qq):
        return flash_attention(qq, kc, vc, mask, scale=scale)

    def sharded(qq):
        return _tp_attention(qq, kc, vc, mask, scale=scale, logit_softcap=0.0,
                             k_scale=None, v_scale=None, n_vis=cells,
                             kv_bits=8, tp=1)

    ref = attention_reference(q, kc, vc, mask.astype(bool), scale=scale)
    y0, y1 = unsharded(q), sharded(q)
    assert y1 is not None, "tp attention declined"
    np.testing.assert_allclose(np.asarray(y0, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32), atol=3e-2, rtol=3e-2)

    def loop3(fn):
        import jax

        @jax.jit
        def run(qq):
            def body(i, acc):
                y = fn(qq + acc[:, :1, :1])
                return acc + y[:, :1, :1] * 1e-30
            return jax.lax.fori_loop(
                0, 2000, body, jnp.zeros((nt, 1, 1), jnp.float32))

        jax.block_until_ready(run(q))
        t0 = time.time()
        jax.block_until_ready(run(q))
        return (time.time() - t0) / 2000

    dt0 = loop3(unsharded)
    set_active_mesh(mesh)
    dt1 = loop3(sharded)
    set_active_mesh(None)
    print(json.dumps({
        "kind": "flash_shardmap", "q": list(q.shape), "cells": cells,
        "unsharded_ms": round(dt0 * 1e3, 4),
        "shardmap_ms": round(dt1 * 1e3, 4),
        "overhead_pct": round((dt1 / dt0 - 1) * 100, 1)}), flush=True)

    # ---- FFN megakernel under shard_map (headline decode kernel, 8B
    # shapes: gate/up column-parallel, down row-parallel + psum) ----
    from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import qmm_w4_ffn_matmul

    E_f, F_f = 4096, 14336
    gate_q = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(
        (rng.standard_normal((F_f, E_f)) * 0.02).astype(np.float32),
        GGMLQuantType.Q4_K)))
    up_q = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(
        (rng.standard_normal((F_f, E_f)) * 0.02).astype(np.float32),
        GGMLQuantType.Q4_K)))
    dn_q = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(
        (rng.standard_normal((E_f, F_f)) * 0.02).astype(np.float32),
        GGMLQuantType.Q4_K)))
    xf = jnp.asarray((rng.standard_normal((2, E_f)) * 0.5).astype(np.float32))
    set_active_mesh(None)
    base = qmm_w4_ffn_matmul(xf, gate_q, dn_q, up=up_q, act="silu")
    assert base is not None, "unsharded megakernel declined"
    dt0 = timed_loop(
        lambda xx: qmm_w4_ffn_matmul(xx, gate_q, dn_q, up=up_q, act="silu"),
        xf, 2000)
    gate_sh = _put(gate_q, mesh, P("tp", None))
    up_sh = _put(up_q, mesh, P("tp", None))
    dn_sh = _put(dn_q, mesh, P(None, "tp"))
    assert gate_sh.tp_axis == 0 and dn_sh.tp_axis == 1
    set_active_mesh(mesh)
    y_sh = qm._tp_qmm_ffn(xf, gate_sh, dn_sh, up_sh, "silu")
    assert y_sh is not None, "TP megakernel path declined"
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(base),
                               atol=2e-2, rtol=2e-2)
    dt1 = timed_loop(
        lambda xx: qm._tp_qmm_ffn(xx, gate_sh, dn_sh, up_sh, "silu"),
        xf, 2000)
    set_active_mesh(None)
    print(json.dumps({
        "kind": "ffn_megakernel_shardmap", "shape": [E_f, F_f],
        "unsharded_ms": round(dt0 * 1e3, 4),
        "shardmap_ms": round(dt1 * 1e3, 4),
        "overhead_pct": round((dt1 / dt0 - 1) * 100, 1)}), flush=True)


if __name__ == "__main__":
    main()
