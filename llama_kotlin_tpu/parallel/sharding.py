"""Sharding rules for llama-family params (Megatron-style TP).

Column-parallel (output dim over tp): wq, wk, wv, ffn_gate, ffn_up,
output head, token embedding.  Row-parallel (contraction dim over tp):
wo, ffn_down — XLA's SPMD partitioner inserts the psum on their outputs.
KV cache shards attention heads over tp.  Every QTensor side-array shares
its main axis layout ([n, k/x]), so one PartitionSpec per orientation
covers codes and all scale planes.

This is the TPU-native answer to LLAMA_SPLIT_MODE_ROW + tensor_split
(reference llama.h:195-200, llama.cpp:3216-3289): the same math, but the
"scheduler" is XLA SPMD and the transport is ICI collectives.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.quant.qtensor import QTensor

log = logging.getLogger(__name__)

COLUMN_PARALLEL = {"wq", "wk", "wv", "ffn_gate", "ffn_up", "output", "tok_embd",
                   "ffn_gate_shexp", "ffn_up_shexp"}
ROW_PARALLEL = {"wo", "ffn_down", "ffn_down_shexp"}
COLUMN_BIAS = {"bq", "bk", "bv"}
# MoE expert lists: every expert is TP-sharded like the dense FFN — the
# MoE memory/FLOPs split across the mesh without expert load imbalance
# (cf. §2.7: reference computes MoE on one device via mul_mat_id)
EXPERT_COLUMN = {"ffn_gate_exps", "ffn_up_exps"}
EXPERT_ROW = {"ffn_down_exps"}


def _divisible(w: Any, axis: int, tp: int) -> bool:
    if not isinstance(w, QTensor):
        return w.shape[axis] % tp == 0
    arrays = [w.codes, w.g_scale, w.g_min, w.sb_scale, w.sb_min]
    ok = all(a is None or a.shape[axis] % tp == 0 for a in arrays)
    if ok and w.aux:
        # rank-2 aux planes are TRANSPOSED ([G-ish, n]); _put gives them
        # the swapped spec, so their (1 - axis) dim must divide too.
        # Rank-3 compact planes are [section, G-ish, n] (split dim 2-axis).
        ok = all(a.shape[1 - axis] % tp == 0
                 for a in w.aux.values() if getattr(a, "ndim", 0) == 2)
        ok = ok and all(a.shape[2 - axis] % tp == 0
                        for a in w.aux.values()
                        if getattr(a, "ndim", 0) == 3)
    return ok


def _tp_axis_of(w: Any, spec: P) -> Any:
    """tp_axis marker for a 2-D QTensor placed with `spec` (see
    QTensor.tp_axis): lets qmatmul run the Pallas kernels per-shard via
    shard_map.  Stacked (3-D) tensors keep None — the MoE paths handle
    their own layout."""
    if not isinstance(w, QTensor) or w.is_stacked:
        return None
    axes = tuple(spec)
    if len(axes) >= 1 and axes[0] == "tp":
        return 0
    if len(axes) >= 2 and axes[1] == "tp":
        return 1
    return None


def _put(w: Any, mesh: Mesh, spec: P) -> Any:
    from dataclasses import replace as _dc_replace

    sh = NamedSharding(mesh, spec)
    if isinstance(w, QTensor):
        tp_axis = _tp_axis_of(w, spec)
        if tp_axis == 1 and w.aux is not None and "q6_t" in w.aux:
            # row splits whose per-shard kc plans only at bkc=512 must
            # leave the compact layout: that plan's q6_t tiling
            # miscomputes on hardware (fold.py layout guard) so the
            # kernel declines it — the legacy f32-plane layout plans down
            # to bkc=512 and keeps the fast path on every shard.  Shards
            # with kc % 512 != 0 are kernel-ineligible in both layouts
            # (the dequant fallback reads g_scale/g_min, retained).
            kc_local = w.codes.shape[-1] // mesh.shape["tp"]
            if kc_local % 1024 and kc_local % 512 == 0:
                import numpy as _np

                from llama_kotlin_tpu.quant.fold import decompact_w4

                w = decompact_w4(jax.tree.map(_np.asarray, w))
        if w.aux is None:
            out = jax.tree.map(lambda a: jax.device_put(a, sh), w)
            return _dc_replace(out, tp_axis=tp_axis)
        # fast-mode (W4/W8) tensors carry TRANSPOSED aux scale planes
        # ([G, n] vs the main arrays' [n, k/x]) plus rank-0 markers: the
        # main spec's axes swap for rank-2 aux; rank-3 compact planes
        # ([section, G, n]) keep the leading axis whole; scalars replicate
        axes = tuple(spec) + (None,) * (2 - len(tuple(spec)))
        aux_sh2 = NamedSharding(mesh, P(axes[1], axes[0]))
        aux_sh3 = NamedSharding(mesh, P(None, axes[1], axes[0]))
        rep = NamedSharding(mesh, P())

        def put_aux(name, a):
            nd = getattr(a, "ndim", 0)
            if name.startswith("q8_"):
                # Q8F shadow planes (fold.attach_q8) are MAIN-oriented
                # [n, k-ish]: under a column split they shard like the
                # codes; under a row split the 256-span scale grouping
                # would misalign, so drop them (the W4 kernel still runs)
                if tp_axis == 1:
                    return None
                return jax.device_put(a, sh)
            return jax.device_put(
                a, aux_sh3 if nd == 3 else (aux_sh2 if nd == 2 else rep))

        main = _dc_replace(w, aux=None)
        main = jax.tree.map(lambda a: jax.device_put(a, sh), main)
        aux_out = {k: put_aux(k, v) for k, v in w.aux.items()}
        return _dc_replace(main,
                           aux={k: v for k, v in aux_out.items()
                                if v is not None},
                           tp_axis=tp_axis)
    return jax.device_put(w, sh)


def shard_weight(key: str, w: Any, mesh: Mesh) -> Any:
    """Place one named weight with its TP sharding (replicate fallback)."""
    if w is None:
        return None
    tp = mesh.shape["tp"]
    if isinstance(w, list):  # per-expert quantized weights
        if tp > 1 and key in EXPERT_COLUMN and all(_divisible(e, 0, tp) for e in w):
            return [_put(e, mesh, P("tp", None)) for e in w]
        if tp > 1 and key in EXPERT_ROW and all(_divisible(e, 1, tp) for e in w):
            return [_put(e, mesh, P(None, "tp")) for e in w]
        return [_put(e, mesh, P()) for e in w]
    if isinstance(w, QTensor) and w.is_stacked and key in (EXPERT_COLUMN | EXPERT_ROW):
        # stacked quantized experts [E, n, *]: per-expert TP layout with the
        # E axis replicated (every QTensor side-array shares the [n, k/x]
        # trailing layout, so one 3-D spec covers them all)
        if tp > 1 and key in EXPERT_COLUMN and _divisible(w, 1, tp):
            return _put(w, mesh, P(None, "tp", None))
        if tp > 1 and key in EXPERT_ROW and _divisible(w, 2, tp):
            return _put(w, mesh, P(None, None, "tp"))
        return _put(w, mesh, P())
    if not isinstance(w, QTensor) and getattr(w, "ndim", 0) == 3 \
            and key in (EXPERT_COLUMN | EXPERT_ROW):
        # stacked dense experts [E, n, k]: shard like the dense FFN
        if tp > 1 and key in EXPERT_COLUMN and w.shape[1] % tp == 0:
            return _put(w, mesh, P(None, "tp", None))
        if tp > 1 and key in EXPERT_ROW and w.shape[2] % tp == 0:
            return _put(w, mesh, P(None, None, "tp"))
        return _put(w, mesh, P())
    if tp > 1 and key in COLUMN_PARALLEL and _divisible(w, 0, tp):
        return _put(w, mesh, P("tp", None))
    if tp > 1 and key in ROW_PARALLEL and _divisible(w, 1, tp):
        return _put(w, mesh, P(None, "tp"))
    if tp > 1 and key in COLUMN_BIAS and _divisible(w, 0, tp):
        return _put(w, mesh, P("tp"))
    if tp > 1 and key in (COLUMN_PARALLEL | ROW_PARALLEL):
        log.warning("replicating %s: dims not divisible by tp=%d", key, tp)
    return _put(w, mesh, P())


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Return a new params pytree with every weight device_put with its
    sharding (cf. llm_load_tensors' buffer-type selection per layer).

    Also records `mesh` as the process's active mesh so the op layer can
    shard_map the Pallas fast-path kernels with matching specs."""
    from llama_kotlin_tpu.parallel.mesh import set_active_mesh

    if mesh.shape.get("tp", 1) > 1 or mesh.shape.get("dp", 1) > 1:
        set_active_mesh(mesh)
    out: dict[str, Any] = {}
    for k, v in params.items():
        if k == "layers":
            out["layers"] = [
                {lk: shard_weight(lk, lv, mesh) for lk, lv in layer.items()}
                for layer in v
            ]
        else:
            out[k] = shard_weight(k, v, mesh) if v is not None else None
    return out


def cache_sharding(mesh: Mesh, n_kv_head: int) -> NamedSharding:
    """KV cache [n_layer, n_kv, cells, head_dim]: heads over tp."""
    tp = mesh.shape["tp"]
    if tp > 1 and n_kv_head % tp == 0:
        return NamedSharding(mesh, P(None, "tp", None, None))
    return NamedSharding(mesh, P())


def shard_cache(cache, mesh: Mesh) -> Any:
    from dataclasses import replace as _dc_replace

    n_kv = cache.k.shape[1]
    tp = mesh.shape["tp"]
    split = tp > 1 and n_kv % tp == 0

    def put(a):
        # codes are rank-4 [L, KV, cells, D], quantized-cache scales rank-3
        # [L, KV, cells]; both shard the KV-head axis over tp
        spec = P(*(["tp" if (i == 1 and split) else None
                    for i in range(a.ndim)]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    out = jax.tree.map(put, cache)
    # static marker so the attention op can shard_map the flash kernel
    # over the tp-split head axis (see KVCache.tp)
    return _dc_replace(out, tp=tp if split else 1)
