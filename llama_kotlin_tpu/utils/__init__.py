from llama_kotlin_tpu.utils.profiling import annotate, device_trace

__all__ = ["annotate", "device_trace"]
