"""Unified multi-sequence KV cache.

TPU-first redesign of the reference's ring-buffer cell cache
(llama_kv_cache, src/llama.cpp:2559-2602 + find_slot :3418):

- Device side: dense K/V arrays [n_layer, cells, n_kv_head, head_dim]
  (optionally quantized later) written by scatter at per-token slot
  indices.  Slots need NOT be contiguous — attention uses the metadata
  mask (ops/attention.py), so the reference's defrag graph
  (build_defrag :9320) is unnecessary by construction.
- Host side: CellMetadata mirrors (pos, seq-bitmask) in numpy; the slot
  allocator and all sequence bookkeeping ops (rm/cp/keep/add/div, cf.
  llama_kv_cache_seq_* in llama.h) are host-side index manipulations.
  The metadata is shipped to the device each step as two small i32 arrays
  (cells,) — the analogue of llama_set_inputs filling inp_KQ_mask.
- Position shifts (seq_add / seq_div for self-extend group attention,
  main.cpp:468-580) additionally rotate the cached roped K by the
  position delta, the analogue of the K-shift graph (build_k_shift :9289),
  implemented as one jitted RoPE rotation over the cache.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.ops.rope import RopeParams, rope_cos_sin, ROPE_TYPE_NEOX, ROPE_TYPE_NONE


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    """Device-resident cache tensors.

    Layout is head-major [n_layer, n_kv_head, cells, head_dim]: per-head
    cell rows are contiguous, which is what the flash-attention kernel
    blocks over and what TP sharding splits on.

    Quantized mode (parity: type_k/type_v, reference include/llama.h:304-311
    + the quantized-V flash-attn requirement): k/v hold int8 codes and
    k_scale/v_scale hold one f32 scale per cached row [n_layer, n_kv_head,
    cells] — per-row rather than the reference's per-32-group q8_0, which
    on a 128-wide head is the natural TPU layout (scales stay a lane
    vector; the flash kernel folds them into the score/probability tiles
    instead of dequantizing K/V in HBM).
    """

    k: jax.Array  # [n_layer, n_kv_head, cells, head_dim] (or D/2 packed u8)
    v: jax.Array  # [n_layer, n_kv_head, cells, head_dim]
    k_scale: Optional[jax.Array] = None  # [n_layer, n_kv_head, cells] f32
    v_scale: Optional[jax.Array] = None
    # 8 = int8 codes (q8_0-class), 4 = packed nibbles (q4_0-class: byte j
    # holds dim j biased-unsigned in the low nibble and dim j + D/2
    # pre-signed in the high nibble, the same AND-only unpack scheme as
    # the W4 weight kernel); only meaningful when quantized
    kv_bits: int = field(default=8, metadata=dict(static=True))
    # tensor-parallel degree the KV-head axis was sharded over
    # (parallel/sharding.py shard_cache); 1 = unsharded.  Lets the
    # attention op shard_map the flash kernel over tp (XLA can't
    # partition the custom call itself).
    tp: int = field(default=1, metadata=dict(static=True))

    @property
    def n_cells(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(n_layer: int, cells: int, n_kv_head: int, head_dim: int,
               dtype=jnp.bfloat16, sharding=None,
               v_head_dim: int = 0, quantized=False) -> "KVCache":
        """v_head_dim != head_dim for MLA archs (deepseek2: k 192, v 128).
        quantized: False = dense; True/"q8_0" = int8 codes + per-row
        scales; "q4_0" = packed int4 codes (half the bytes — the type_k/
        type_v=q4_0 analogue, reference include/llama.h:304-311)."""
        v_head_dim = v_head_dim or head_dim
        bits = 4 if quantized == "q4_0" else 8
        kd, vd = head_dim, v_head_dim
        if quantized:
            dtype = jnp.uint8 if bits == 4 else jnp.int8
            if bits == 4:
                kd, vd = head_dim // 2, v_head_dim // 2
        kshape = (n_layer, n_kv_head, cells, kd)
        vshape = (n_layer, n_kv_head, cells, vd)
        sshape = (n_layer, n_kv_head, cells)
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else (lambda a: a)
        return KVCache(
            k=put(jnp.zeros(kshape, dtype)), v=put(jnp.zeros(vshape, dtype)),
            k_scale=put(jnp.zeros(sshape, jnp.float32)) if quantized else None,
            v_scale=put(jnp.zeros(sshape, jnp.float32)) if quantized else None,
            kv_bits=bits,
        )


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization over the last axis:
    returns (codes int8 [..., d], scale f32 [...])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                     -127, 127).astype(jnp.int8)
    return codes, scale


def quantize_rows_q4(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int4 quantization packed 2 codes/byte over the
    last axis (type_k/type_v=q4_0 analogue — half the cache bytes of int8):
    returns (packed uint8 [..., d/2], scale f32 [...]).

    Byte j of a row holds dim j as code+8 (biased unsigned, AND 0x0F) in
    the low nibble and dim j + d/2 as a two's-complement code in the high
    nibble (AND 0xF0 bitcast int8 = 16*code) — the same shift-free unpack
    scheme as the W4 weight kernel (quant/fold.py)."""
    d = x.shape[-1]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                     -7, 7).astype(jnp.int32)
    lo = (codes[..., : d // 2] + 8).astype(jnp.uint8)          # 1..15
    hi = (codes[..., d // 2 :] & 0xF).astype(jnp.uint8) << 4   # two's compl
    return lo | hi, scale


def unpack_q4_rows(packed: jnp.ndarray) -> jnp.ndarray:
    """packed uint8 [..., d/2] -> codes f32 [..., d] (inverse nibble map)."""
    lo = (packed & 0x0F).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def dequantize_cache_layer(codes: jnp.ndarray, scale: jnp.ndarray,
                           dtype=jnp.float32, bits: int = 8) -> jnp.ndarray:
    """codes [KV, cells, D] int8 (or [.., D/2] packed u8 when bits=4) +
    scale [KV, cells] -> float [KV, cells, D]."""
    cf = unpack_q4_rows(codes) if bits == 4 else codes.astype(jnp.float32)
    return (cf * scale[..., None]).astype(dtype)


class CellMetadata:
    """Host-side per-cell metadata + slot allocator.

    pos[c]  = token position stored in cell c (-1 = empty)
    seq[c]  = bitmask of sequence ids the cell belongs to (multi-seq cells
              arise from seq_cp, like the reference's seq_id sets)
    """

    def __init__(self, n_cells: int, max_seqs: int = 32):
        self.n_cells = n_cells
        self.max_seqs = max_seqs
        self.pos = np.full(n_cells, -1, np.int32)
        self.seq = np.zeros(n_cells, np.int32)
        self._next = 0  # ring scan pointer (keeps allocation mostly sequential)

    # -- allocation ---------------------------------------------------------

    @property
    def used(self) -> int:
        return int((self.pos >= 0).sum())

    def used_span(self) -> int:
        """1 + highest live cell index (attention window upper bound)."""
        live = np.nonzero(self.pos >= 0)[0]
        return int(live[-1]) + 1 if live.size else 0

    def device_view(self, n_vis: Optional[int] = None):
        """(cell_pos, cell_seq) device arrays for a decode step — always
        COPIES of the live metadata.

        CRITICAL: jnp.asarray on the CPU backend can zero-copy ALIAS a
        numpy buffer (especially slice views like pos[:n_vis]).  These
        arrays are mutated in place by commit/seq_rm/seq_add while a
        previously dispatched decode may still be running asynchronously —
        an aliased buffer lets that mutation corrupt the in-flight step's
        attention metadata.  This was the root cause of the rare
        test_kv_quant_k_shift / context-shift full-suite flakes (decode →
        seq_add mutates pos → the still-running decode read shifted
        positions under CPU load)."""
        import jax.numpy as jnp

        n = self.n_cells if n_vis is None else n_vis
        return jnp.asarray(self.pos[:n].copy()), jnp.asarray(self.seq[:n].copy())

    def find_slots(self, n: int) -> Optional[np.ndarray]:
        """Allocate n cells; returns indices or None if cache is full."""
        free = np.nonzero(self.pos < 0)[0]
        if free.size < n:
            return None
        # prefer the lowest free indices after the ring pointer, wrapping —
        # keeps the live span compact without requiring contiguity
        order = np.argsort((free - self._next) % self.n_cells)
        slots = free[order[:n]]
        self._next = int((slots[-1] + 1) % self.n_cells)
        return slots.astype(np.int32)

    def commit(self, slots: np.ndarray, pos: np.ndarray, seq_ids: np.ndarray,
               seq_mask: Optional[np.ndarray] = None) -> None:
        self.pos[slots] = pos
        if seq_mask is not None:  # multi-seq cells (lookahead branches etc.)
            self.seq[slots] = seq_mask.astype(np.int32)
        else:
            self.seq[slots] = (1 << seq_ids.astype(np.int64)).astype(np.int32)

    # -- sequence ops (parity: llama_kv_cache_seq_*, llama.h:602-673) -------

    @staticmethod
    def _bit(seq_id: int) -> np.int32:
        """Seq-id bit as int32 (bit 31 = seq 31 wraps through uint32 —
        np.int32(1 << 31) raises OverflowError on numpy 2)."""
        return np.uint32(1 << seq_id).astype(np.int32)

    def _range_mask(self, seq_id: int, p0: int, p1: int) -> np.ndarray:
        if p1 < 0:
            p1 = np.iinfo(np.int32).max
        has = (self.seq >> seq_id) & 1
        return (has == 1) & (self.pos >= p0) & (self.pos < p1)

    def seq_rm(self, seq_id: int, p0: int = 0, p1: int = -1) -> None:
        if seq_id < 0:  # all sequences (llama_kv_cache_seq_rm with seq_id=-1)
            if p1 < 0:
                p1 = np.iinfo(np.int32).max
            m = (self.pos >= p0) & (self.pos < p1)
            self.seq[m] = 0
            self.pos[m] = -1
            return
        m = self._range_mask(seq_id, p0, p1)
        self.seq[m] &= ~self._bit(seq_id)
        dead = m & (self.seq == 0)
        self.pos[dead] = -1

    def seq_cp(self, src: int, dst: int, p0: int = 0, p1: int = -1) -> None:
        m = self._range_mask(src, p0, p1)
        self.seq[m] |= self._bit(dst)

    def seq_keep(self, seq_id: int) -> None:
        keep_bit = self._bit(seq_id)
        self.seq &= keep_bit
        self.pos[self.seq == 0] = -1

    def seq_add(self, seq_id: int, p0: int, p1: int, delta: int) -> np.ndarray:
        """Shift positions; returns per-cell deltas for the K rotation."""
        m = self._range_mask(seq_id, p0, p1)
        deltas = np.zeros(self.n_cells, np.int32)
        deltas[m] = delta
        self.pos[m] += delta
        drop = m & (self.pos < 0)
        self.pos[drop] = -1
        self.seq[drop] = 0
        return deltas

    def seq_div(self, seq_id: int, p0: int, p1: int, d: int) -> np.ndarray:
        m = self._range_mask(seq_id, p0, p1)
        deltas = np.zeros(self.n_cells, np.int32)
        new_pos = self.pos[m] // d
        deltas[m] = new_pos - self.pos[m]
        self.pos[m] = new_pos
        return deltas

    def seq_pos_max(self, seq_id: int) -> int:
        has = ((self.seq >> seq_id) & 1) == 1
        return int(self.pos[has].max()) if has.any() else -1

    def clear(self) -> None:
        self.pos[:] = -1
        self.seq[:] = 0
        self._next = 0


@partial(jax.jit, static_argnames=("rope", "neox"))
def _rotate_k(k: jax.Array, deltas: jax.Array,
              rope: RopeParams, neox: bool,
              freq_factors: Optional[jax.Array] = None) -> jax.Array:
    """Rotate cached (already-roped) K by per-cell position deltas.

    k layout: [n_layer, n_kv_head, cells, head_dim]."""
    cos, sin = rope_cos_sin(deltas, rope, freq_factors)  # [cells, n_rot/2]
    cos = cos[None, None, :, :]
    sin = sin[None, None, :, :]
    dtype = k.dtype
    rot = k[..., : rope.n_rot].astype(jnp.float32)
    rest = k[..., rope.n_rot :]
    if neox:
        half = rope.n_rot // 2
        a, b = rot[..., :half], rot[..., half:]
        out = jnp.concatenate([a * cos - b * sin, a * sin + b * cos], axis=-1)
    else:
        a, b = rot[..., 0::2], rot[..., 1::2]
        out = jnp.stack([a * cos - b * sin, a * sin + b * cos], axis=-1).reshape(rot.shape)
    out = jnp.where((deltas != 0)[None, None, :, None], out, rot)
    res = jnp.concatenate([out.astype(dtype), rest], axis=-1) if rest.size else out.astype(dtype)
    return res


def apply_k_shift(cache: KVCache, meta: CellMetadata, deltas: np.ndarray,
                  rope: RopeParams, freq_factors=None) -> KVCache:
    """Device-side companion of seq_add/seq_div (the K-shift)."""
    if rope.rope_type == ROPE_TYPE_NONE or not np.any(deltas):
        return cache
    # always copy: the caller's buffer may be meta-owned and later mutated
    # while the rotation still runs (see CellMetadata.device_view)
    deltas = np.array(deltas, np.int32, copy=True)
    if deltas.shape[0] < cache.n_cells:  # pad to cover any scratch rows
        deltas = np.pad(deltas, (0, cache.n_cells - deltas.shape[0]))
    if cache.quantized:
        # dequant -> rotate -> requantize (rotation changes per-row amax)
        kf = dequantize_cache_layer(cache.k, cache.k_scale, jnp.float32,
                                    bits=cache.kv_bits)
        kf = _rotate_k(kf, jnp.asarray(deltas),
                       rope, rope.rope_type == ROPE_TYPE_NEOX, freq_factors)
        qr = quantize_rows_q4 if cache.kv_bits == 4 else quantize_rows
        codes, scale = qr(kf)
        return replace(cache, k=codes, k_scale=scale)
    k = _rotate_k(cache.k, jnp.asarray(deltas),
                  rope, rope.rope_type == ROPE_TYPE_NEOX, freq_factors)
    return replace(cache, k=k)
