"""Multi-process (2 local CPU processes) jax.distributed test: global mesh
spanning both processes, a psum collective, and a TP-sharded qmatmul —
validating the multi-host code path without real multi-host hardware
(SURVEY.md §4.3's required addition; the reference has no analogue)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["REPO"])

    from llama_kotlin_tpu.parallel.distributed import init_distributed, process_info

    init_distributed(
        coordinator=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PID"]),
    )
    pid, n = process_info()
    assert n == 2
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()  # 4 global devices (2 per process)
    assert len(devs) == 4
    mesh = Mesh(np.array(devs).reshape(2, 2), ("dp", "tp"))

    # global array sharded over both processes; sum must be global
    from llama_kotlin_tpu.parallel.distributed import shard_batch_across_hosts
    local = np.full((2, 8), float(pid + 1), np.float32)  # dp-shard per process
    garr = shard_batch_across_hosts(local, mesh)
    total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
    expect = (1.0 + 2.0) * 2 * 8
    assert float(total) == expect, (float(total), expect)

    # full TP decode step with the tp axis SPANNING the two processes:
    # row-parallel psums cross the process boundary, and the sharded
    # logits must match an unsharded single-device reference
    from llama_kotlin_tpu.models import llama as llama_model
    from llama_kotlin_tpu.models.config import ModelConfig
    from llama_kotlin_tpu.models.synthetic import synthetic_params
    from llama_kotlin_tpu.parallel.sharding import shard_cache, shard_params
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.runtime.kv_cache import KVCache

    tp = 2
    mesh_tp = Mesh(np.array(devs).reshape(2, 2).T, ("dp", "tp"))  # tp crosses procs
    cfg = ModelConfig(arch="llama", vocab_size=512 * tp, n_embd=256 * tp,
                      n_layer=2, n_head=2 * tp, n_head_kv=tp, n_ff=256 * tp,
                      n_ctx_train=128)
    params = synthetic_params(cfg, GGMLQuantType.Q4_K, compute_dtype=jnp.bfloat16)

    nt, n_cells = 8, 64
    tokens = jnp.arange(nt, dtype=jnp.int32)
    pos = jnp.arange(nt, dtype=jnp.int32)
    seq = jnp.zeros(nt, jnp.int32)
    slots = jnp.arange(nt, dtype=jnp.int32)
    cell_pos = jnp.concatenate([pos, jnp.full(n_cells - nt, -1, jnp.int32)])
    cell_seq = jnp.concatenate([jnp.ones(nt, jnp.int32),
                                jnp.zeros(n_cells - nt, jnp.int32)])
    out_ids = jnp.array([nt - 1], jnp.int32)

    def run(params_in, cache_in, out_shardings=None):
        f = lambda *a: llama_model.forward(
            *a, compute_dtype=jnp.bfloat16)[0]
        jf = jax.jit(f, out_shardings=out_shardings, static_argnums=(1,))
        return jf(params_in, cfg, tokens, pos, seq, slots, cache_in,
                  cell_pos, cell_seq, out_ids)

    ref = np.asarray(run(
        params, KVCache.create(cfg.n_layer, n_cells, cfg.n_head_kv,
                               cfg.head_dim, dtype=jnp.bfloat16)))
    sp = shard_params(params, cfg, mesh_tp)
    sc = shard_cache(KVCache.create(cfg.n_layer, n_cells, cfg.n_head_kv,
                                    cfg.head_dim, dtype=jnp.bfloat16),
                     mesh_tp)
    with mesh_tp:
        got = run(sp, sc, out_shardings=NamedSharding(mesh_tp, P()))
    got = np.asarray(got)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert err < 5e-2, f"TP-across-processes logits mismatch: {err}"
    print(f"proc {pid}: distributed OK (tp decode err {err:.2e})", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    env_base = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    for pid in range(2):
        env = dict(env_base, COORD=coord, PID=str(pid), REPO=repo,
                   PYTHONPATH=os.environ.get("PYTHONPATH", ""))
        procs.append(subprocess.Popen([sys.executable, str(script)], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = []
    ok = True
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out.decode(errors="replace"))
        ok = ok and p.returncode == 0
    assert ok, "\n---\n".join(outs)
    assert all("distributed OK" in o for o in outs)
