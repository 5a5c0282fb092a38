"""LlamaContext: the decode driver.

Parity target: llama_new_context_with_model + llama_decode_internal
(reference src/llama.cpp:17515, 15530) redesigned for XLA: the per-ubatch
"build graph, allocate, compute" cycle becomes one jitted function per
(token-bucket) shape, with the KV cache donated in and out so it stays
device-resident without copies.

Decode flow per ubatch (cf. call stack SURVEY.md §3.3):
  1. host: find cache slots (CellMetadata.find_slots; rc=1 if full, like
     llama_decode returning 1 so callers can free sequences and retry)
  2. host: commit metadata, pad token arrays to the bucket size
  3. device: jitted forward (embed -> layers -> logits rows)
  4. logits fetched asynchronously (jax arrays returned; blocking happens
     when the caller reads them)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.models import llama as llama_model
from llama_kotlin_tpu.runtime.batch import Batch, bucket_size
from llama_kotlin_tpu.runtime.kv_cache import CellMetadata, KVCache, apply_k_shift

DEFAULT_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)


@dataclass
class Timings:
    """Parity: llama_timings (llama.h:396)."""

    t_start: float = field(default_factory=time.perf_counter)
    t_load_ms: float = 0.0
    t_p_eval_ms: float = 0.0  # prompt (multi-token ubatch) time
    t_eval_ms: float = 0.0  # single-token decode time
    n_p_eval: int = 0
    n_eval: int = 0

    def yaml(self) -> str:
        """YAML timing dump (parity: llama_dump_timing_info_yaml)."""
        d = self.summary()
        return "\n".join(f"{k}: {v}" for k, v in d.items()) + "\n"

    def summary(self) -> dict:
        return {
            "load_ms": round(self.t_load_ms, 2),
            "prompt_eval_ms": round(self.t_p_eval_ms, 2),
            "prompt_tokens": self.n_p_eval,
            "prompt_tps": round(self.n_p_eval / (self.t_p_eval_ms / 1e3), 2)
            if self.t_p_eval_ms
            else 0.0,
            "eval_ms": round(self.t_eval_ms, 2),
            "eval_tokens": self.n_eval,
            "eval_tps": round(self.n_eval / (self.t_eval_ms / 1e3), 2)
            if self.t_eval_ms
            else 0.0,
        }


class LlamaContext:
    """Holds the KV cache + jitted forward for one loaded model."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        *,
        n_cells: int = 4096,
        n_ubatch: int = 512,
        n_seq_max: int = 32,
        compute_dtype=jnp.bfloat16,
        kv_dtype=None,
        kv_quant=False,  # False | True/"q8_0" (int8) | "q4_0" (packed int4)
        buckets: tuple[int, ...] = DEFAULT_BUCKETS,
        forward_fn=None,
        prefer_unrolled: bool = False,
        vis_bucketing: bool = True,
    ):
        self.cfg = cfg
        self._raw_params = params  # unstacked view kept for LoRA re-application
        # unrolled = fastest decode (no scan slice copies, plain kernels)
        # at the price of an O(n_layer) one-time compile; stacked scan =
        # fast compile, used for tests/dev
        self.prefer_unrolled = prefer_unrolled
        self.params = self._prepare_params(params)
        self.n_cells = n_cells
        self.n_ubatch = n_ubatch
        self.n_seq_max = n_seq_max
        self.compute_dtype = compute_dtype
        # buckets above n_ubatch are unreachable (ubatches are capped);
        # guarantee one bucket covers a full ubatch so long prefills never
        # outgrow the grid
        bs = sorted({b for b in buckets if b <= n_ubatch} | {n_ubatch})
        self.buckets = tuple(bs)
        self.meta = CellMetadata(n_cells, max_seqs=n_seq_max)
        kv_dtype = kv_dtype or compute_dtype
        # padded tokens carry slot index == n_cells; the scatter drops them
        self.cache = KVCache.create(
            cfg.n_layer, n_cells, cfg.n_head_kv, cfg.head_dim, dtype=kv_dtype,
            v_head_dim=cfg.v_head_dim, quantized=kv_quant,
        )
        # used-prefix attention bucketing: attend over a bucketed prefix of
        # the cell array instead of every allocated cell (the analogue of
        # the reference's n_kv cache-prefix views).  Coarse doubling buckets
        # bound the number of compiled variants at log2(n_cells / 512).
        self._vis_buckets: tuple[int, ...] = (n_cells,)
        if vis_bucketing and n_cells % 128 == 0:
            vb = [b for b in (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
                  if b < n_cells and n_cells % b == 0]
            self._vis_buckets = tuple(vb) + (n_cells,)
        self.timings = Timings()
        self._logits: Optional[jax.Array] = None
        self._logits_rows: Optional[np.ndarray] = None
        self._topk_fns: dict = {}
        base_forward = forward_fn or llama_model.forward

        # cfg rides as a STATIC jit argument (identity-hashed) so
        # set_causal_attn can swap in a replaced config and retrace —
        # the gritlm pattern (llama_set_causal_attn, reference
        # examples/gritlm/gritlm.cpp:48,103)
        def _step(cfg_, params, tokens, pos, seq, slots, cache, cell_pos,
                  cell_seq, out_ids):
            logits, cache, embd = base_forward(
                params, cfg_, tokens, pos, seq, slots, cache, cell_pos, cell_seq,
                out_ids, compute_dtype=compute_dtype,
            )
            return logits, cache, embd

        from llama_kotlin_tpu.utils.profiling import compiler_opts

        _step_jit = jax.jit(_step, static_argnums=(0,), donate_argnums=(6,),
                            compiler_options=compiler_opts())
        self._step = lambda *a: _step_jit(self.cfg, *a)

        def _step_embd(cfg_, params, embd, pos, seq, slots, cache, cell_pos,
                       cell_seq, out_ids):
            nt = embd.shape[0]
            logits, cache, e = base_forward(
                params, cfg_, jnp.zeros(nt, jnp.int32), pos, seq, slots, cache,
                cell_pos, cell_seq, out_ids, compute_dtype=compute_dtype,
                inp_embd=embd,
            )
            return logits, cache, e

        _step_embd_jit = jax.jit(_step_embd, static_argnums=(0,), donate_argnums=(6,),
                                 compiler_options=compiler_opts())
        self._step_embd = lambda *a: _step_embd_jit(self.cfg, *a)
        self._embd: Optional[jax.Array] = None

    def _prepare_params(self, params: dict) -> dict:
        from llama_kotlin_tpu.models.llama import can_stack, stack_layers

        if self.prefer_unrolled:
            return params
        if "layers" in params and can_stack(params, self.cfg):
            try:
                return stack_layers(params)
            except (ValueError, TypeError):
                pass  # non-uniform layers: keep the unrolled path
        return params

    # -- adapters (parity: llama_lora_adapter_set/remove, control vectors) ---

    def apply_lora(self, adapter, scale: float = 1.0) -> None:
        from llama_kotlin_tpu.models.lora import apply_lora

        self._raw_params = apply_lora(self._raw_params, adapter, scale)
        cv = self.params.get("control_vectors")
        self.params = self._prepare_params(self._raw_params)
        if cv is not None:
            self.params["control_vectors"] = cv

    def remove_lora(self) -> None:
        from llama_kotlin_tpu.models.lora import remove_lora

        self._raw_params = remove_lora(self._raw_params)
        cv = self.params.get("control_vectors")
        self.params = self._prepare_params(self._raw_params)
        if cv is not None:
            self.params["control_vectors"] = cv

    def control_vector_apply(self, vectors) -> None:
        """vectors: [n_layer, n_embd] or None to clear."""
        if vectors is None:
            self.params.pop("control_vectors", None)
        else:
            self.params["control_vectors"] = jnp.asarray(vectors, jnp.float32)

    # -- decode --------------------------------------------------------------

    def decode(self, batch: Batch) -> int:
        """Process a batch; 0 on success, 1 if the KV cache is full
        (caller should free sequences and retry — same contract as
        llama_decode)."""
        all_logits = []
        all_rows = []
        all_embd = []
        for base, ub in zip(range(0, len(batch), self.n_ubatch),
                            batch.split(self.n_ubatch)):
            rc = self._decode_ubatch(ub, all_logits, all_rows, all_embd,
                                     row_base=base)
            if rc != 0:
                return rc
        if all_logits:
            self._logits = jnp.concatenate(all_logits, axis=0) if len(all_logits) > 1 else all_logits[0]
            self._logits_rows = np.concatenate(all_rows) if len(all_rows) > 1 else all_rows[0]
            # embeddings accumulate across ubatches too (a long input split
            # into several ubatches must expose every requested row, not just
            # the last ubatch's)
            self._embd = jnp.concatenate(all_embd, axis=0) if len(all_embd) > 1 else all_embd[0]
        return 0

    def _decode_ubatch(self, ub: Batch, all_logits: list, all_rows: list,
                       all_embd: list, row_base: int = 0) -> int:
        nt = len(ub)
        t0 = time.perf_counter()
        slots = self.meta.find_slots(nt)
        if slots is None:
            return 1
        self.meta.commit(slots, ub.pos, ub.seq_id, ub.seq_mask)

        nb = bucket_size(nt, self.buckets)
        tokens = np.zeros(nb, np.int32)
        pos = np.full(nb, -1, np.int32)
        seq = np.full(nb, self.n_seq_max - 1, np.int32)
        slot_arr = np.full(nb, self.n_cells, np.int32)  # scratch row
        tokens[:nt] = ub.tokens
        pos[:nt] = ub.pos
        seq[:nt] = ub.seq_id
        slot_arr[:nt] = slots

        out_rows = np.nonzero(ub.output)[0].astype(np.int32)
        n_out = max(1, len(out_rows))
        out_ids = np.zeros(n_out, np.int32)
        out_ids[: len(out_rows)] = out_rows

        # attention span: smallest bucket covering every live cell (includes
        # the freshly committed slots)
        span = self.meta.used_span()
        n_vis = next((b for b in self._vis_buckets if b >= span),
                     self.n_cells)

        logits, self.cache, embd = self._step(
            self.params,
            jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(seq),
            jnp.asarray(slot_arr), self.cache,
            *self.meta.device_view(n_vis),
            jnp.asarray(out_ids),
        )
        if len(out_rows):
            all_logits.append(logits[: len(out_rows)])
            # row indices are GLOBAL batch rows (a batch split into several
            # ubatches must not alias rows across ubatches)
            all_rows.append(out_rows + row_base)
            all_embd.append(embd[: len(out_rows)])
        dt = (time.perf_counter() - t0) * 1e3
        if nt == 1:
            self.timings.t_eval_ms += dt
            self.timings.n_eval += 1
        else:
            self.timings.t_p_eval_ms += dt
            self.timings.n_p_eval += nt
        return 0

    def decode_embd(self, embd: np.ndarray, pos0: int, seq_id: int = 0,
                    output_last: bool = False) -> int:
        """Decode a run of embedding inputs (llama_batch.embd analogue, used
        by llava image-embedding eval; reference llava.cpp:394).  Returns
        0 ok, 1 cache full."""
        n = embd.shape[0]
        for i in range(0, n, self.n_ubatch):
            chunk = embd[i : i + self.n_ubatch]
            nt = chunk.shape[0]
            slots = self.meta.find_slots(nt)
            if slots is None:
                return 1
            pos = np.arange(pos0 + i, pos0 + i + nt, dtype=np.int32)
            self.meta.commit(slots, pos, np.full(nt, seq_id, np.int32))

            nb = bucket_size(nt, self.buckets)
            e = np.zeros((nb, chunk.shape[1]), np.float32)
            e[:nt] = chunk
            pos_a = np.full(nb, -1, np.int32)
            pos_a[:nt] = pos
            seq_a = np.full(nb, self.n_seq_max - 1, np.int32)
            seq_a[:nt] = seq_id
            slot_a = np.full(nb, self.n_cells, np.int32)
            slot_a[:nt] = slots
            last = output_last and i + nt >= n
            out_ids = np.array([nt - 1 if last else 0], np.int32)

            span = self.meta.used_span()
            n_vis = next((b for b in self._vis_buckets if b >= span), self.n_cells)
            logits, self.cache, embd_out = self._step_embd(
                self.params, jnp.asarray(e), jnp.asarray(pos_a),
                jnp.asarray(seq_a), jnp.asarray(slot_a), self.cache,
                *self.meta.device_view(n_vis), jnp.asarray(out_ids),
            )
            if last:
                self._logits = logits[:1]
                self._logits_rows = np.array([nt - 1], np.int32)
                self._embd = embd_out[:1]
        return 0

    # -- results -------------------------------------------------------------

    def get_logits(self) -> np.ndarray:
        """All logits rows requested by the last decode, [n_out, vocab]."""
        if self._logits is None:
            raise RuntimeError("no logits: call decode with output flags first")
        return np.asarray(self._logits)

    def get_topk(self, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (values, token ids) of the last decode's logits rows,
        computed ON DEVICE: fetches [n_out, k] instead of [n_out, vocab].
        Greedy/speculative drafting only needs the argmax (or top-2 for
        p_split forking), and the full-vocab f32 download is the dominant
        per-call cost through the tunnel (cf. reference speculative.cpp's
        host-side sampling — structurally unnecessary here)."""
        if self._logits is None:
            raise RuntimeError("no logits: call decode with output flags first")
        fn = self._topk_fns.get(k)
        if fn is None:
            import jax

            fn = self._topk_fns[k] = jax.jit(
                lambda l: jax.lax.top_k(l, k))
        v, i = fn(self._logits)
        return np.asarray(v), np.asarray(i)

    def get_logits_ith(self, i: int = -1) -> np.ndarray:
        return self.get_logits()[i]

    def sample_rows_device(self, rows, sp, spv, pos, masks=None,
                           pen_window=None) -> np.ndarray:
        """Sample token ids from the last decode's logits rows ON DEVICE
        (constrained-decode fast path: the host grammar mask is packed to
        vocab/8 bytes and uploaded; only the [n] ids come back, instead of
        the [n, vocab] f32 logits download the host sampler needs — the
        dominant per-token cost through the axon tunnel).

        rows: logits-row indices.  masks: bool [n, vocab] (grammar-legal
        tokens) or None.  pen_window: [n, last_n] i32 recent tokens
        (-1 = empty) when sp enables penalties.  spv/pos: per-row sampling
        arrays and absolute positions (same reproducibility contract as
        generate_loop's per-slot path)."""
        from llama_kotlin_tpu.runtime.generate import sample_rows

        if self._logits is None:
            raise RuntimeError("no logits: call decode first")
        use_mask = masks is not None
        if use_mask:
            mask_bits = jnp.asarray(
                np.packbits(np.asarray(masks, bool), axis=-1,
                            bitorder="little"))
        else:
            mask_bits = jnp.zeros((len(rows), 1), jnp.uint8)
        use_pen = pen_window is not None
        pw = jnp.asarray(pen_window if use_pen
                         else np.zeros((len(rows), 1), np.int32))
        ids = sample_rows(
            self._logits, jnp.asarray(np.asarray(rows, np.int32)), mask_bits,
            pw, spv, jnp.asarray(np.asarray(pos, np.int32)), sp,
            use_mask, use_pen)
        return np.asarray(ids)

    def get_embeddings(self, pooling: str = "last") -> np.ndarray:
        """Final-norm hidden states of the last decode's output rows
        (parity: llama_get_embeddings + pooling types NONE/MEAN/LAST/CLS).

        pooling: "none" -> [n_out, n_embd]; "mean"/"last"/"cls" -> [n_embd].
        """
        if self._embd is None:
            raise RuntimeError("no embeddings: decode with output flags first")
        e = np.asarray(self._embd)
        if pooling == "none":
            return e
        if pooling == "mean":
            return e.mean(axis=0)
        if pooling == "cls":
            return e[0]
        return e[-1]

    # -- sequence management (parity: llama_kv_cache_seq_*) ------------------

    def set_causal_attn(self, causal: bool) -> None:
        """Toggle causal masking (parity: llama_set_causal_attn,
        llama.h; the gritlm embed/generate switch).  The two config
        variants are MEMOIZED — ModelConfig hashes by identity, so
        re-creating one per toggle would retrace every flip and leak a
        jit-cache entry each time; reusing the same two objects compiles
        each setting once."""
        causal = bool(causal)
        if self.cfg.causal_attn == causal:
            return
        if not hasattr(self, "_causal_variants"):
            self._causal_variants = {self.cfg.causal_attn: self.cfg}
        if causal not in self._causal_variants:
            from dataclasses import replace as _dc_replace

            self._causal_variants[causal] = _dc_replace(
                self.cfg, causal_attn=causal)
        self.cfg = self._causal_variants[causal]

    def seq_rm(self, seq_id: int, p0: int = 0, p1: int = -1) -> None:
        self.meta.seq_rm(seq_id, p0, p1)

    def seq_cp(self, src: int, dst: int, p0: int = 0, p1: int = -1) -> None:
        self.meta.seq_cp(src, dst, p0, p1)

    def seq_keep(self, seq_id: int) -> None:
        self.meta.seq_keep(seq_id)

    def seq_add(self, seq_id: int, p0: int, p1: int, delta: int) -> None:
        deltas = self.meta.seq_add(seq_id, p0, p1, delta)
        self._shift(deltas)

    def seq_div(self, seq_id: int, p0: int, p1: int, d: int) -> None:
        deltas = self.meta.seq_div(seq_id, p0, p1, d)
        self._shift(deltas)

    def seq_pos_max(self, seq_id: int) -> int:
        return self.meta.seq_pos_max(seq_id)

    def clear(self) -> None:
        self.meta.clear()

    def _shift(self, deltas: np.ndarray) -> None:
        if not np.any(deltas):
            return
        self.cache = apply_k_shift(
            self.cache, self.meta, deltas, self.cfg.rope_params(),
            self.params.get("rope_freqs"),
        )
