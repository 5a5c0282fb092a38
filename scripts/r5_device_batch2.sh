#!/bin/bash
# Round-5 device batch 2: reruns with the fixed harnesses.
set -u
cd /root/repo
mkdir -p /tmp/r5
R5=/tmp/r5

echo "=== bkc512 compact re-smoke (k=7168 must now take the LEGACY fold) ==="
timeout 1200 python - > $R5/bkc512_smoke2.log 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, '/root/repo')
from llama_kotlin_tpu.models.synthetic import synthetic_w4_device
from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_matmul
from llama_kotlin_tpu.quant.qtensor import dequantize
k = 7168
w = synthetic_w4_device(jax.random.PRNGKey(1), 2048, k)
assert "q6_t" not in (w.aux or {}), "fold should have gone legacy"
x = jax.random.normal(jax.random.PRNGKey(2), (2, k), jnp.float32) * 0.5
y = qmm_w4_matmul(x, w)
assert y is not None, "legacy kernel declined"
ref = jnp.dot(x, dequantize(w, jnp.float32).T)
err = float(jnp.max(jnp.abs(y - ref))) / (float(jnp.max(jnp.abs(ref))) + 1e-6)
print("legacy bkc512 smoke: rel err", err)
assert err < 0.03
print("OK")
EOF
tail -2 $R5/bkc512_smoke2.log

echo "=== longctx (fixed opts) ==="
timeout 5400 python scripts/longctx_bench.py --preset mistral-7b \
    --fills 512,2048,8192,32768 --kv bf16,q8_0,q4_0 --steps 64 \
    > $R5/longctx2.log 2>&1
tail -20 $R5/longctx2.log

echo "=== spec_bench device (device-loop draft chain) ==="
timeout 2400 python scripts/spec_bench.py --n-predict 128 \
    > $R5/spec_device2.log 2>&1
tail -3 $R5/spec_device2.log

echo "=== spec_bench --components (on-device loop timing) ==="
timeout 2400 python scripts/spec_bench.py --components \
    > $R5/spec_components2.log 2>&1
tail -3 $R5/spec_components2.log

echo "=== batched int8 (smaller footprint) ==="
timeout 3000 python -m llama_kotlin_tpu.tools.batched_bench \
    --synthetic llama3-8b --mode int8 --warm -npp 128 -ntg 64 \
    -npl 1 8 16 32 -c 4096 -o json > $R5/batched_int8b.json 2>$R5/batched_int8b.err
tail -1 $R5/batched_int8b.json

echo "=== batched dual-fold switch (chunked attach) ==="
LKTPU_DUAL_FOLD=1 LKTPU_W4_BMAX=8 timeout 3000 python -m \
    llama_kotlin_tpu.tools.batched_bench --synthetic llama3-8b --mode w4a8 \
    --warm -npp 128 -ntg 64 -npl 8 16 32 -c 4096 -o json \
    > $R5/batched_dualb.json 2>$R5/batched_dualb.err
tail -1 $R5/batched_dualb.json

echo "=== TTFT under load ==="
timeout 3600 python scripts/ttft_load.py > $R5/ttft_load.log 2>&1
tail -4 $R5/ttft_load.log

echo "=== pp matrix (BENCH_PP=512,1024,4096; decode steps minimal) ==="
BENCH_PP=512,1024,4096 BENCH_STEPS=16 timeout 3000 python bench.py \
    > $R5/pp_matrix.log 2>&1
tail -1 $R5/pp_matrix.log

echo "=== DONE batch 2 ==="
