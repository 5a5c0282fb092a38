"""Parallelism: device mesh construction and sharding rules.

Replaces (by design, not translation) the reference's multi-device
machinery — tensor_split/split_mode row splitting (llama.cpp:3216-3289),
the backend scheduler's pipeline parallelism (ggml-backend.c:1747-1841)
and the RPC distributed backend (ggml-rpc.cpp) — with JAX SPMD: weights
and KV cache carry NamedShardings over a (dp, tp) mesh and XLA inserts
the collectives (psum/all-gather) that ride ICI.
"""

from llama_kotlin_tpu.parallel.mesh import make_mesh  # noqa: F401
from llama_kotlin_tpu.parallel.sharding import shard_params, shard_cache  # noqa: F401
