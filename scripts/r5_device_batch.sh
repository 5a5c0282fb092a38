#!/bin/bash
# Round-5 serialized device batch (TPU single-tenant). Each stage logs to
# /tmp/r5/<stage>.log; keep stages independent so a failure doesn't block
# the rest.
set -u
cd /root/repo
mkdir -p /tmp/r5
R5=/tmp/r5

echo "=== spec_bench (device, trained pair) ==="
timeout 2400 python scripts/spec_bench.py --n-predict 128 \
    > $R5/spec_device.log 2>&1
tail -5 $R5/spec_device.log

echo "=== spec_bench --components (8B-scale latencies) ==="
timeout 2400 python scripts/spec_bench.py --components \
    > $R5/spec_components.log 2>&1
tail -5 $R5/spec_components.log

echo "=== ADVICE r4 #2: kc%1024!=0 compact fx2 device smoke (k=7168) ==="
timeout 1200 python - > $R5/bkc512_smoke.log 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, '/root/repo')
from llama_kotlin_tpu.models.synthetic import synthetic_w4_device
from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_matmul
from llama_kotlin_tpu.quant.qtensor import dequantize
k = 7168  # kc=3584 -> bkc=512 plan: the q6_t (4,16,bn) tile class
w = synthetic_w4_device(jax.random.PRNGKey(1), 2048, k)
x = jax.random.normal(jax.random.PRNGKey(2), (2, k), jnp.float32) * 0.5
y = qmm_w4_matmul(x, w)
assert y is not None, "kernel declined"
ref = jnp.dot(x, dequantize(w, jnp.float32).T)
err = float(jnp.max(jnp.abs(y - ref))) / (float(jnp.max(jnp.abs(ref))) + 1e-6)
print("bkc512 compact smoke: rel err", err)
assert err < 0.03
print("OK")
EOF
tail -3 $R5/bkc512_smoke.log

echo "=== longctx (mistral-7b 32k, bf16/q8_0/q4_0 KV) ==="
timeout 5400 python scripts/longctx_bench.py --preset mistral-7b \
    --fills 512,2048,8192,32768 --kv bf16,q8_0,q4_0 --steps 64 \
    > $R5/longctx.log 2>&1
tail -20 $R5/longctx.log

echo "=== batched int8 + dual-fold switch sweeps ==="
timeout 3000 python -m llama_kotlin_tpu.tools.batched_bench \
    --synthetic llama3-8b --mode int8 --warm -npp 128 -ntg 128 \
    -npl 1 8 16 32 -c 8192 -o json > $R5/batched_int8.json 2>$R5/batched_int8.err
tail -1 $R5/batched_int8.json
LKTPU_DUAL_FOLD=1 LKTPU_W4_BMAX=8 timeout 3000 python -m \
    llama_kotlin_tpu.tools.batched_bench --synthetic llama3-8b --mode w4a8 \
    --warm -npp 128 -ntg 128 -npl 8 16 32 -c 8192 -o json \
    > $R5/batched_dual.json 2>$R5/batched_dual.err
tail -1 $R5/batched_dual.json

echo "=== 100M quality ladder (train on TPU, score incl. imatrix IQ rungs) ==="
timeout 9000 python -m llama_kotlin_tpu.tools.quant_quality \
    --steps 2000 --n-embd 768 --n-layer 14 --n-head 12 --n-ff 2048 \
    --n-ctx 256 --batch 16 --corpus-cap 4000000 \
    --corpus-root /opt/venv/lib/python3.12/site-packages/jax \
    --corpus-root /opt/venv/lib/python3.12/site-packages/numpy \
    --imatrix --out-dir /tmp/r5/qq100m \
    --ladder Q8_0,Q6_K,Q5_K_M,Q4_K_M,Q4_0,Q3_K_M,IQ3_S,IQ3_XXS,Q2_K,IQ2_XS,IQ2_XXS \
    > $R5/qq100m.log 2>&1
tail -20 $R5/qq100m.log

echo "=== grammar bench (devmask vs hostpath + churn p99) ==="
timeout 2400 python scripts/grammar_bench.py > $R5/grammar.log 2>&1
grep grammar_bench $R5/grammar.log | tail -12

echo "=== flash-XLA-below A/B (headline contexts) ==="
LKTPU_FLASH_XLA_BELOW=512 LKTPU_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=98304,xla_tpu_async_copy_bandwidth_scaling_factor=2.0" \
    timeout 1800 python scripts/trace_decode.py --preset llama3-8b \
    --out none > $R5/flashxla_ab.log 2>&1
grep best $R5/flashxla_ab.log

echo "=== DONE device batch ==="
