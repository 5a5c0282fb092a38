"""Runtime: KV cache, decode context, batching, state I/O, serving engine."""
