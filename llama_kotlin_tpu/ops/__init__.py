"""Compute ops: each op has a jnp reference implementation and (for the hot
ops) a Pallas TPU kernel, cross-checked by the NMSE harness in
tests/test_ops.py (pattern: reference tests/test-backend-ops.cpp)."""

from llama_kotlin_tpu.ops.norms import rms_norm, layer_norm  # noqa: F401
from llama_kotlin_tpu.ops.rope import apply_rope, RopeParams  # noqa: F401
from llama_kotlin_tpu.ops.qmatmul import qmatmul  # noqa: F401
from llama_kotlin_tpu.ops.attention import attention  # noqa: F401
