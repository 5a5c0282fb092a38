"""Context state serialization.

Parity target: the reference's llama_state_* API (llama.h:701-790, impl
src/llama.cpp:18423-19040): full-context state blobs, session files with
magic/version + prompt tokens, and per-sequence state extraction/injection
(used by server slot save/restore and prompt caching).

Format: a small struct header + npz payload (numpy arrays are already the
host representation of our cache).  Per-sequence blobs store cells sorted
by position so they can be injected into any context with free cells.
Quantized caches save their RAW code+scale planes (like the reference's raw
type_k/type_v bytes) so a same-type restore is bitwise-faithful; restoring
into a different cache type dequantizes the stored form (the only lossy
path, and the one the reference doesn't support at all).
"""

from __future__ import annotations

import io
import json
import struct
from typing import Optional

import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.runtime.context import LlamaContext
from dataclasses import replace

STATE_MAGIC = b"LKTS"
STATE_VERSION = 1
SESSION_MAGIC = b"LKTN"


def _pack(payload: dict, magic: bytes) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **payload)
    body = buf.getvalue()
    return magic + struct.pack("<I", STATE_VERSION) + body


def _unpack(data: bytes, magic: bytes) -> dict:
    if data[:4] != magic:
        raise ValueError("bad state magic")
    (version,) = struct.unpack("<I", data[4:8])
    if version != STATE_VERSION:
        raise ValueError(f"unsupported state version {version}")
    return dict(np.load(io.BytesIO(data[8:]), allow_pickle=False))


def _cache_payload(ctx: LlamaContext) -> dict:
    """Cache tensors for the blob.  Quantized caches store the RAW code +
    per-row-scale planes (like the reference's raw type_k/type_v bytes,
    src/llama.cpp:18423+) so a same-type restore is BITWISE-faithful —
    restore-then-decode matches never-saved decode exactly.  Float caches
    store f32.  Cross-type restores dequantize the stored form (the only
    case that re-quantizes)."""
    if ctx.cache.quantized:
        return {
            "kv_bits": np.int32(ctx.cache.kv_bits),
            "cache_k": np.asarray(ctx.cache.k),
            "cache_v": np.asarray(ctx.cache.v),
            "cache_k_scale": np.asarray(ctx.cache.k_scale),
            "cache_v_scale": np.asarray(ctx.cache.v_scale),
        }
    return {"cache_k": np.asarray(ctx.cache.k, np.float32),
            "cache_v": np.asarray(ctx.cache.v, np.float32)}


def _blob_kv_f32(p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Dequantize a blob's cache payload to f32 (cross-type restore path)."""
    if "kv_bits" in p:
        from llama_kotlin_tpu.runtime.kv_cache import dequantize_cache_layer

        bits = int(p["kv_bits"])
        k = np.asarray(dequantize_cache_layer(
            jnp.asarray(p["cache_k"]), jnp.asarray(p["cache_k_scale"]),
            bits=bits))
        v = np.asarray(dequantize_cache_layer(
            jnp.asarray(p["cache_v"]), jnp.asarray(p["cache_v_scale"]),
            bits=bits))
        return k, v
    return p["cache_k"], p["cache_v"]


def _restore_cache(ctx: LlamaContext, p: dict) -> None:
    from llama_kotlin_tpu.runtime.kv_cache import quantize_rows, quantize_rows_q4

    blob_bits = int(p["kv_bits"]) if "kv_bits" in p else 0
    ctx_bits = ctx.cache.kv_bits if ctx.cache.quantized else 0
    if blob_bits and blob_bits == ctx_bits:
        # same quantized type: bit-faithful raw-plane restore
        ctx.cache = replace(
            ctx.cache,
            k=jnp.asarray(p["cache_k"], ctx.cache.k.dtype),
            v=jnp.asarray(p["cache_v"], ctx.cache.v.dtype),
            k_scale=jnp.asarray(p["cache_k_scale"], ctx.cache.k_scale.dtype),
            v_scale=jnp.asarray(p["cache_v_scale"], ctx.cache.v_scale.dtype),
        )
        return
    k, v = _blob_kv_f32(p)
    if ctx.cache.quantized:
        qr = quantize_rows_q4 if ctx.cache.kv_bits == 4 else quantize_rows
        kc, ks = qr(jnp.asarray(k))
        vc, vs = qr(jnp.asarray(v))
        ctx.cache = replace(ctx.cache, k=kc, v=vc, k_scale=ks, v_scale=vs)
    else:
        ctx.cache = replace(
            ctx.cache,
            k=jnp.asarray(k, ctx.cache.k.dtype),
            v=jnp.asarray(v, ctx.cache.v.dtype),
        )


def _meta_dict(ctx: LlamaContext) -> dict:
    return {
        "cell_pos": ctx.meta.pos.copy(),
        "cell_seq": ctx.meta.seq.copy(),
        **_cache_payload(ctx),
    }


def get_state_data(ctx: LlamaContext) -> bytes:
    """Full context state (cf. llama_state_get_data)."""
    payload = _meta_dict(ctx)
    if ctx._logits is not None:
        payload["logits"] = np.asarray(ctx._logits, np.float32)
        payload["logits_rows"] = ctx._logits_rows
    return _pack(payload, STATE_MAGIC)


def set_state_data(ctx: LlamaContext, data: bytes) -> None:
    """Restore a full context state (cf. llama_state_set_data)."""
    p = _unpack(data, STATE_MAGIC)
    # compare LOGICAL element shapes (packed-int4 arrays are half-width)
    kshape = list(ctx.cache.k.shape)
    if ctx.cache.quantized and ctx.cache.kv_bits == 4:
        kshape[-1] *= 2
    bshape = list(p["cache_k"].shape)
    if "kv_bits" in p and int(p["kv_bits"]) == 4:
        bshape[-1] *= 2
    if bshape != kshape:
        raise ValueError(
            f"cache shape mismatch: state {tuple(bshape)} vs ctx {tuple(kshape)}"
        )
    ctx.meta.pos[:] = p["cell_pos"]
    ctx.meta.seq[:] = p["cell_seq"]
    # keep the allocator ring past the restored occupancy so new slots
    # extend the live span instead of fragmenting low indices (which would
    # inflate the used_span attention bucket)
    live = np.nonzero(ctx.meta.pos >= 0)[0]
    ctx.meta._next = (int(live[-1]) + 1) % ctx.meta.n_cells if live.size else 0
    _restore_cache(ctx, p)
    if "logits" in p:
        ctx._logits = jnp.asarray(p["logits"])
        ctx._logits_rows = p["logits_rows"]


def save_session_file(ctx: LlamaContext, path, tokens) -> None:
    """State + prompt tokens (cf. llama_state_save_file)."""
    payload = _meta_dict(ctx)
    payload["tokens"] = np.asarray(tokens, np.int32)
    with open(path, "wb") as f:
        f.write(_pack(payload, SESSION_MAGIC))


def load_session_file(ctx: LlamaContext, path) -> np.ndarray:
    """Restore state; returns the stored prompt tokens."""
    data = open(path, "rb").read()
    p = _unpack(data, SESSION_MAGIC)
    ctx.meta.pos[:] = p["cell_pos"]
    ctx.meta.seq[:] = p["cell_seq"]
    # keep the allocator ring past the restored occupancy so new slots
    # extend the live span instead of fragmenting low indices (which would
    # inflate the used_span attention bucket)
    live = np.nonzero(ctx.meta.pos >= 0)[0]
    ctx.meta._next = (int(live[-1]) + 1) % ctx.meta.n_cells if live.size else 0
    _restore_cache(ctx, p)
    return p["tokens"]


# -- per-sequence state (cf. llama_state_seq_get_data / set_data) ------------


def get_seq_data(ctx: LlamaContext, seq_id: int) -> bytes:
    has = ((ctx.meta.seq >> seq_id) & 1) == 1
    cells = np.nonzero(has)[0]
    order = np.argsort(ctx.meta.pos[cells], kind="stable")
    cells = cells[order].astype(np.int32)
    payload = {"pos": ctx.meta.pos[cells]}
    if ctx.cache.quantized:
        # raw code+scale planes for the saved cells: same-type injection is
        # bit-faithful (reference: per-cell raw type_k ranges,
        # src/llama.cpp llama_state_seq_get_data)
        payload.update(
            kv_bits=np.int32(ctx.cache.kv_bits),
            k=np.asarray(ctx.cache.k[:, :, cells]),
            v=np.asarray(ctx.cache.v[:, :, cells]),
            k_scale=np.asarray(ctx.cache.k_scale[:, :, cells]),
            v_scale=np.asarray(ctx.cache.v_scale[:, :, cells]),
        )
    else:
        payload["k"] = np.asarray(ctx.cache.k[:, :, cells], np.float32)  # [L, KV, n, D]
        payload["v"] = np.asarray(ctx.cache.v[:, :, cells], np.float32)
    return _pack(payload, STATE_MAGIC)


def set_seq_data(ctx: LlamaContext, data: bytes, dest_seq: int) -> int:
    """Inject a saved sequence; returns 0 ok, 1 if not enough free cells
    (same error contract as llama_state_seq_set_data)."""
    p = _unpack(data, STATE_MAGIC)
    n = int(p["pos"].shape[0])
    slots = ctx.meta.find_slots(n)
    if slots is None:
        return 1
    ctx.meta.commit(slots, p["pos"], np.full(n, dest_seq, np.int32))
    blob_bits = int(p["kv_bits"]) if "kv_bits" in p else 0
    ctx_bits = ctx.cache.kv_bits if ctx.cache.quantized else 0
    if blob_bits and blob_bits == ctx_bits:
        # same quantized type: bit-faithful raw-plane injection
        kc, vc = jnp.asarray(p["k"]), jnp.asarray(p["v"])
        ks, vs = jnp.asarray(p["k_scale"]), jnp.asarray(p["v_scale"])
        ctx.cache = replace(
            ctx.cache,
            k=ctx.cache.k.at[:, :, slots].set(kc.astype(ctx.cache.k.dtype)),
            v=ctx.cache.v.at[:, :, slots].set(vc.astype(ctx.cache.v.dtype)),
            k_scale=ctx.cache.k_scale.at[:, :, slots].set(
                ks.astype(ctx.cache.k_scale.dtype)),
            v_scale=ctx.cache.v_scale.at[:, :, slots].set(
                vs.astype(ctx.cache.v_scale.dtype)),
        )
        return 0
    if blob_bits:  # cross-type: dequantize the stored raw planes first
        from llama_kotlin_tpu.runtime.kv_cache import dequantize_cache_layer

        kf = np.asarray(dequantize_cache_layer(
            jnp.asarray(p["k"]), jnp.asarray(p["k_scale"]), bits=blob_bits))
        vf = np.asarray(dequantize_cache_layer(
            jnp.asarray(p["v"]), jnp.asarray(p["v_scale"]), bits=blob_bits))
    else:
        kf, vf = p["k"], p["v"]
    if ctx.cache.quantized:
        from llama_kotlin_tpu.runtime.kv_cache import quantize_rows, quantize_rows_q4

        qr = quantize_rows_q4 if ctx.cache.kv_bits == 4 else quantize_rows
        kc, ks = qr(jnp.asarray(kf))
        vc, vs = qr(jnp.asarray(vf))
        ctx.cache = replace(
            ctx.cache,
            k=ctx.cache.k.at[:, :, slots].set(kc),
            v=ctx.cache.v.at[:, :, slots].set(vc),
            k_scale=ctx.cache.k_scale.at[:, :, slots].set(ks),
            v_scale=ctx.cache.v_scale.at[:, :, slots].set(vs),
        )
    else:
        ctx.cache = replace(
            ctx.cache,
            k=ctx.cache.k.at[:, :, slots].set(jnp.asarray(kf, ctx.cache.k.dtype)),
            v=ctx.cache.v.at[:, :, slots].set(jnp.asarray(vf, ctx.cache.v.dtype)),
        )
    return 0
