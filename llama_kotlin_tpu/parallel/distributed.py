"""Multi-host initialisation.

Replaces the reference's RPC distributed backend (ggml-rpc.cpp: TCP
proxying of every backend op) with jax.distributed: all hosts run the
same program, the mesh spans every host's devices, and XLA moves data
over ICI/DCN — no application-level RPC layer exists at all
(SURVEY.md §2.7's "single biggest architectural win").

Usage (same command on every host):
    from llama_kotlin_tpu.parallel.distributed import init_distributed
    init_distributed(coordinator="host0:1234", num_processes=2, process_id=i)
    mesh = make_mesh(dp=2, tp=8)   # global mesh over all hosts' devices

Env-var driven init (TPU pods set these automatically) also works by
calling init_distributed() with no arguments.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Initialise jax.distributed (idempotent)."""
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def process_info() -> tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def shard_batch_across_hosts(batch_np, mesh):
    """Place a host-local batch shard into a globally-sharded array
    (multi-host data parallelism over the dp axis)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp"))
    return jax.make_array_from_process_local_data(sharding, batch_np)
