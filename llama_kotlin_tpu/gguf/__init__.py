"""GGUF container support: zero-copy reader (memmap), writer (fixtures and
the quantize tool), and metadata -> model-config mapping."""

from llama_kotlin_tpu.gguf.reader import GGUFFile, GGUFTensorInfo  # noqa: F401
from llama_kotlin_tpu.gguf.writer import GGUFWriter  # noqa: F401
