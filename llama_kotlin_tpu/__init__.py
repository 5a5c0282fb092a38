"""llama_kotlin_tpu — TPU-native quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
SolaceHarmony/llama.kotlin (a llama.cpp-lineage engine): GGUF model loading,
ggml block-quant formats, fused dequant-matmul kernels, paged KV cache with
continuous batching, full sampling stack, GBNF grammars, tokenizers, and an
OpenAI-compatible server — designed TPU-first (MXU-shaped matmuls, SPMD
sharding over a device mesh, XLA-friendly static shapes) rather than as a
translation of the reference's C/CUDA architecture.
"""

__version__ = "0.1.0"

from llama_kotlin_tpu.quant import formats as quant_formats  # noqa: F401
