"""QTensor: the TPU-resident quantized tensor representation.

Every ggml wire format is repacked at load time (see ``repack.py``) into a
single uniform structure-of-arrays layout so that ONE kernel family handles
all formats:

    value[n, k] = (codes[n, k] - code_offset) * eff_scale[n, g] - eff_min[n, g]
    eff_scale   = f32(sb_scale[n, s]) * f32(g_scale[n, g])   (two-level), or
                  f32(g_scale[n, g])                          (one-level)
    g = k // group_size,  s = k // 256

This preserves the wire formats' numerics bit-exactly (the same f32 product
order as the reference decoders) while being TPU-friendly:

- ``codes`` are packed bit-planes with a 256-element span: for 4-bit, byte
  column ``j`` of span ``s`` holds element ``256*s + j`` in its low nibble
  and element ``256*s + 128 + j`` in its high nibble (128-byte spans =
  exactly one TPU lane row).  2-bit uses 4 planes of 64 bytes.  5/6/8-bit
  codes are stored as int8 (one byte per element).
- group scales stay small ints (u8/i8) and superblock scales stay f16, so
  HBM bytes/weight match the wire format closely (the decode hot loop is
  weight-bandwidth-bound).
- the K axis is padded to a multiple of 256 with zero scales, so shard and
  tile boundaries always align with span boundaries.

Replaces (TPU-native redesign, not a translation): ggml's per-block struct
layout + per-arch repack in ggml-aarch64.c:339 (which solves the same
"repack wire blocks for the ISA's vector shape" problem for NEON).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.quant.formats import GGMLQuantType

SPAN = 256  # elements per packing span (= QK_K superblock)


@jax.tree_util.register_dataclass
@dataclass
class QTensor:
    """Quantized 2-D tensor [n, k] (row-major; k is the contraction axis)."""

    codes: jax.Array  # packed planes (uint8) or int8 codes; see `bits`
    g_scale: jax.Array  # [n, k_pad // group_size] u8/i8/f16/f32 per-group scale
    g_min: Optional[jax.Array]  # per-group min (same layout) or None
    sb_scale: Optional[jax.Array]  # [n, k_pad // 256] f16 superblock scale or None
    sb_min: Optional[jax.Array]  # [n, k_pad // 256] f16 superblock min-scale or None
    qtype: GGMLQuantType = field(metadata=dict(static=True))
    bits: int = field(metadata=dict(static=True))  # packed bit width: 2, 4, or 8
    group_size: int = field(metadata=dict(static=True))
    code_offset: int = field(metadata=dict(static=True))
    shape: tuple[int, int] = field(metadata=dict(static=True))  # logical (n, k)
    # W4A8 fast-mode layout (quant/fold.py): 4-bit planes where the low
    # nibble is the raw unsigned code and the high nibble is stored
    # pre-signed (value-8, two's complement), so `byte & 0xF0` bitcast to
    # int8 is exactly 16*(q-8) — both nibbles reach the MXU with one AND
    # each, no shifts (see ops/pallas/qmm_w4.py)
    hi_signed: bool = field(default=False, metadata=dict(static=True))
    # TP sharding marker set by parallel/sharding.py when the weight was
    # device_put with a tensor-parallel spec: 0 = output dim (column
    # parallel), 1 = contraction dim (row parallel), None = unsharded.
    # ops/qmatmul.py uses it to run the Pallas kernels per-shard under
    # jax.shard_map (XLA cannot partition custom calls itself).
    tp_axis: Optional[int] = field(default=None, metadata=dict(static=True))
    # auxiliary device arrays for fast kernels (e.g. transposed per-group
    # scale planes); None for standard layouts
    aux: Optional[dict] = None

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def k(self) -> int:
        return self.shape[1]

    # -- stacked expert axis (MoE): arrays carry a leading E dim, `shape`
    # stays the per-expert logical (n, k) --------------------------------

    @property
    def is_stacked(self) -> bool:
        return self.codes.ndim == 3

    def __len__(self) -> int:
        if not self.is_stacked:
            raise TypeError("len() on a non-stacked QTensor")
        return self.codes.shape[0]

    def __getitem__(self, e):
        """Per-expert view of a stacked QTensor (static or traced index)."""
        if not self.is_stacked:
            raise TypeError("indexing a non-stacked QTensor")
        return jax.tree.map(lambda a: a[e], self)

    @property
    def k_pad(self) -> int:
        if self.bits == 8:
            return self.codes.shape[-1]
        return self.codes.shape[-1] * (8 // self.bits)

    def nbytes(self) -> int:
        total = self.codes.size * self.codes.dtype.itemsize
        for a in (self.g_scale, self.g_min, self.sb_scale, self.sb_min):
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total


def stack_qtensors(qts: list) -> QTensor:
    """Per-expert QTensors (identical static metadata) -> one stacked
    QTensor with a leading E axis on every array.  Lets MoE decode gather
    only the routed experts' codes (the mul_mat_id access pattern) instead
    of sweeping every expert."""
    import numpy as np

    q0 = qts[0]
    for q in qts[1:]:
        if (q.qtype, q.bits, q.group_size, q.code_offset, q.shape,
                q.hi_signed) != (q0.qtype, q0.bits, q0.group_size,
                                 q0.code_offset, q0.shape, q0.hi_signed):
            raise ValueError("stack_qtensors: mismatched expert metadata")
    if any(q.aux is not None for q in qts):
        # W4 kernel aux planes are 2-D-kernel-specific; stacked experts go
        # through the gather/dequant path which doesn't use them
        raise ValueError("stack_qtensors: aux-carrying (W4) tensors not stackable")
    def st(get):
        vals = [get(q) for q in qts]
        return None if vals[0] is None else np.stack([np.asarray(v) for v in vals])
    return QTensor(
        codes=st(lambda q: q.codes), g_scale=st(lambda q: q.g_scale),
        g_min=st(lambda q: q.g_min), sb_scale=st(lambda q: q.sb_scale),
        sb_min=st(lambda q: q.sb_min), qtype=q0.qtype, bits=q0.bits,
        group_size=q0.group_size, code_offset=q0.code_offset, shape=q0.shape,
        hi_signed=q0.hi_signed,
    )


def concat_qtensors(qts: list) -> QTensor:
    """Concatenate QTensors along the OUTPUT (n) axis into one tensor.

    Serving fold for fused projections: wq|wk|wv -> wqkv, gate|up ->
    gateup.  One large matmul replaces 2-3 smaller kernel launches — on
    the decode path each Pallas invocation has ~10-15us of fixed pipeline
    ramp (round-3 device traces: [4096,4096] W4 runs at 383 GB/s vs 579
    at [16384,4096]), so fusing the per-layer projections is a direct
    tokens/s win.  The reference keeps QKV fused for several archs for the
    same reason (build_starcoder et al.); here it's a load-time layout
    choice independent of the wire format.

    Requires identical static metadata and k; aux scale planes ([G', n]
    layout) concatenate along axis 1.  Sharded (tp_axis set) tensors are
    rejected — TP row splits would cross segment boundaries."""
    q0 = qts[0]
    for q in qts[1:]:
        if (q.qtype, q.bits, q.group_size, q.code_offset, q.k,
                q.hi_signed, q.tp_axis) != (q0.qtype, q0.bits, q0.group_size,
                                            q0.code_offset, q0.k,
                                            q0.hi_signed, q0.tp_axis):
            raise ValueError("concat_qtensors: mismatched metadata")
        if (q.aux is None) != (q0.aux is None) or (
                q.aux is not None and set(q.aux) != set(q0.aux)):
            raise ValueError("concat_qtensors: mismatched aux")
    if q0.tp_axis is not None:
        raise ValueError("concat_qtensors: refusing to fuse sharded tensors")
    if any(q.is_stacked for q in qts):
        raise ValueError("concat_qtensors: stacked (MoE) tensors unsupported")

    def cat(get, axis=0):
        vals = [get(q) for q in qts]
        return None if vals[0] is None else jnp.concatenate(vals, axis=axis)

    aux = None
    if q0.aux is not None:
        aux = {}
        for key in q0.aux:
            if getattr(q0.aux[key], "ndim", 0) == 0:  # precise / sym flags
                aux[key] = q0.aux[key]
            else:
                # scw/scw_lo/scw_hi/madj_t: [G', n]; compact q6_t/dd_t:
                # [section, G', n] — n is always the LAST axis
                aux[key] = jnp.concatenate(
                    [q.aux[key] for q in qts],
                    axis=q0.aux[key].ndim - 1)
    n_total = sum(q.n for q in qts)
    return QTensor(
        codes=cat(lambda q: q.codes), g_scale=cat(lambda q: q.g_scale),
        g_min=cat(lambda q: q.g_min), sb_scale=cat(lambda q: q.sb_scale),
        sb_min=cat(lambda q: q.sb_min), qtype=q0.qtype, bits=q0.bits,
        group_size=q0.group_size, code_offset=q0.code_offset,
        shape=(n_total, q0.k), hi_signed=q0.hi_signed, aux=aux,
    )


def unpack_codes(qt: QTensor) -> jnp.ndarray:
    """Unpack `codes` to int32 [n, k_pad] (plane layout -> element order)."""
    c = qt.codes
    if qt.bits == 8:
        return c.astype(jnp.int32)
    n = c.shape[0]
    if qt.bits == 4:
        half = SPAN // 2  # 128 bytes per span
        spans = c.shape[-1] // half
        b = c.reshape(n, spans, half).astype(jnp.int32)
        lo = b & 0x0F
        if qt.hi_signed:
            # high nibble holds (q-8) in two's complement: arithmetic shift
            # on int8 sign-extends it to [-8, 7]
            hi = (b.astype(jnp.int8) >> 4).astype(jnp.int32)
        else:
            hi = (b >> 4) & 0x0F
        return jnp.concatenate([lo, hi], axis=-1).reshape(n, spans * SPAN)
    if qt.bits == 2:
        quarter = SPAN // 4  # 64 bytes per span
        spans = c.shape[-1] // quarter
        b = c.reshape(n, spans, quarter).astype(jnp.int32)
        planes = [(b >> (2 * p)) & 0x03 for p in range(4)]
        return jnp.concatenate(planes, axis=-1).reshape(n, spans * SPAN)
    raise ValueError(f"unsupported bit width {qt.bits}")


def effective_scales(qt: QTensor) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-group (eff_scale, eff_min) as f32 [n, k_pad // group_size]."""
    s = qt.g_scale.astype(jnp.float32)
    m = qt.g_min.astype(jnp.float32) if qt.g_min is not None else None
    if qt.sb_scale is not None:
        rep = SPAN // qt.group_size
        s = s * jnp.repeat(qt.sb_scale.astype(jnp.float32), rep, axis=-1)
        if m is not None and qt.sb_min is not None:
            m = m * jnp.repeat(qt.sb_min.astype(jnp.float32), rep, axis=-1)
    return s, m


def dequantize(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Full dequantization to [n, k] (reference path; kernels fuse this)."""
    codes = unpack_codes(qt)
    s, m = effective_scales(qt)
    g = qt.group_size
    w = (codes - qt.code_offset).astype(jnp.float32) * jnp.repeat(s, g, axis=-1)
    if m is not None:
        w = w - jnp.repeat(m, g, axis=-1)
    return w[:, : qt.k].astype(dtype)
