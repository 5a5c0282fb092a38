"""Block-quantization core.

Implements the ggml block-quant wire formats (the on-disk GGUF tensor
encodings) plus TPU-friendly repacked layouts:

- ``formats``   — per-type descriptors (block size, type size, names)
- ``numpy_ref`` — layout-exact numpy encode/decode of the wire formats
  (parity target: ggml-quants.c; cited per function)
- ``repack``    — wire blocks -> structure-of-arrays layout (packed int
  planes + scale planes) shaped for TPU lanes
- ``jax_dequant`` — jnp dequantization of repacked tensors (reference path
  for the Pallas fused kernels)
"""

from llama_kotlin_tpu.quant.formats import (  # noqa: F401
    GGMLQuantType,
    QK_K,
    TYPE_TRAITS,
    block_count,
    row_byte_size,
)
