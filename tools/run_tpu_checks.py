"""Compiled-on-TPU kernel checks: runs the same cross-checks as
tests/test_ops.py but compiled on the real device (the CI suite runs them
in interpreter mode on CPU).  Usage: python tools/run_tpu_checks.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.synthetic import synthetic_qtensor
    from llama_kotlin_tpu.ops.qmatmul import qmatmul
    from llama_kotlin_tpu.ops.pallas.qmm import qmm
    from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    failures = 0
    for tname in ["q8_0", "q4_0", "q4_1", "q5_0", "q5_1", "q2_K", "q3_K", "q4_K", "q5_K", "q6_K"]:
        for b in (1, 16):
            n, k = 512, 1024
            w = synthetic_qtensor(rng, n, k, NAME_TO_TYPE[tname])
            w = jax.tree.map(jnp.asarray, w)
            x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
            ref = np.asarray(qmatmul(x, w, compute_dtype=jnp.float32, allow_pallas=False))
            t0 = time.time()
            out = qmm(x, w, compute_dtype=jnp.float32)
            if out is None:
                print(f"FAIL {tname} b={b}: kernel refused shape")
                failures += 1
                continue
            out = np.asarray(out)
            dt = time.time() - t0
            err = float(np.mean((out - ref) ** 2) / (np.mean(ref**2) + 1e-12))
            # TPU "f32" matmul runs as bf16 passes; ~1e-5 NMSE is expected
            status = "ok" if err < 1e-4 else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"{status} {tname} b={b} nmse={err:.3e} ({dt:.1f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
