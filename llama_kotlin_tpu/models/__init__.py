"""Model layer: config mapping from GGUF metadata, arch registry, and
functional decoder implementations (params as pytrees, jit-once forward)."""

from llama_kotlin_tpu.models.config import ModelConfig  # noqa: F401
