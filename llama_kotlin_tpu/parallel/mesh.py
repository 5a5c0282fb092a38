"""Device mesh construction.

Axes:
  dp — data parallel (across hosts / DCN): batches of sequences
  tp — tensor parallel (within slice / ICI): attention heads + ffn columns

Multi-host initialisation (jax.distributed) composes with this: the mesh
spans all processes' devices; shardings are global.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(f"dp*tp = {dp}*{tp} != {len(devices)} devices")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- active TP mesh ----------------------------------------------------------
# The mesh used by shard_params/shard_cache, recorded so the op layer
# (ops/qmatmul.py, ops/attention.py) can wrap Pallas kernels in
# jax.shard_map with matching specs: XLA's SPMD partitioner cannot split a
# custom call, so without this the fast kernels would be unusable under a
# sharded mesh (the dequant fallback would silently serve instead).
# Process-global by design — serving runs one mesh per process.

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH
