"""GGUF -> device params loading.

Parity target: llama_model_loader + llm_load_tensors (reference
src/llama.cpp:4119, 6464): tensor-name tables per arch, mmap'd wire data,
per-tensor repack into the TPU QTensor layout, then device placement
(optionally sharded — see parallel/sharding.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import os

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.gguf.reader import GGUFFile
from llama_kotlin_tpu.models.config import ModelConfig, config_from_metadata
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS
from llama_kotlin_tpu.quant import numpy_ref
from llama_kotlin_tpu.quant.repack import repack


# tensor-name suffix -> params key (cf. LLM_TN table, src/llama.cpp:1369)
_LAYER_TENSORS = {
    "attn_norm.weight": "attn_norm",
    "attn_norm.bias": "attn_norm_b",
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_b",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "attn_q.bias": "bq",
    "attn_k.bias": "bk",
    "attn_v.bias": "bv",
    "attn_output.bias": "bo",
    "attn_q_norm.weight": "attn_q_norm",
    "attn_q_norm.bias": "attn_q_norm_b",
    "attn_k_norm.bias": "attn_k_norm_b",
    "attn_k_norm.weight": "attn_k_norm",
    "ffn_norm.weight": "ffn_norm",
    "ffn_norm.bias": "ffn_norm_b",
    "ffn_gate.weight": "ffn_gate",
    "ffn_gate.bias": "ffn_gate_b",
    "ffn_up.weight": "ffn_up",
    "ffn_up.bias": "ffn_up_b",
    "ffn_down.weight": "ffn_down",
    "ffn_down.bias": "ffn_down_b",
    "post_attention_norm.weight": "post_attn_norm",
    "post_ffw_norm.weight": "post_ffn_norm",
    "ffn_gate_inp.weight": "ffn_gate_inp",
    "ffn_gate_exps.weight": "ffn_gate_exps",
    "ffn_up_exps.weight": "ffn_up_exps",
    "ffn_down_exps.weight": "ffn_down_exps",
    "ffn_gate_inp_shexp.weight": "ffn_gate_inp_shexp",
    "ffn_norm_exps.weight": "ffn_norm_exps",
    "attn_q_a.weight": "wq_a",
    "attn_q_b.weight": "wq_b",
    "attn_kv_a_mqa.weight": "wkv_a_mqa",
    "attn_kv_b.weight": "wkv_b",
    "attn_q_a_norm.weight": "attn_q_a_norm",
    "attn_kv_a_norm.weight": "attn_kv_a_norm",
    # mamba SSM block (cf. llm_build_mamba tensor table)
    "ssm_in.weight": "ssm_in",
    "ssm_conv1d.weight": "ssm_conv1d",
    "ssm_conv1d.bias": "ssm_conv1d_b",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_b",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out.weight": "ssm_out",
    # bert post-norm blocks (cf. build_bert)
    "attn_output_norm.weight": "attn_out_norm",
    "attn_output_norm.bias": "attn_out_norm_b",
    "layer_output_norm.weight": "layer_out_norm",
    "layer_output_norm.bias": "layer_out_norm_b",
    # bitnet per-projection scalar scales + sub-norms (cf. build_bitnet)
    "attn_sub_norm.weight": "attn_sub_norm",
    "ffn_sub_norm.weight": "ffn_sub_norm",
    "attn_q.scale": "wq_scale",
    "attn_k.scale": "wk_scale",
    "attn_v.scale": "wv_scale",
    "attn_output.scale": "wo_scale",
    "ffn_gate.scale": "ffn_gate_scale",
    "ffn_up.scale": "ffn_up_scale",
    "ffn_down.scale": "ffn_down_scale",
    "ffn_gate_shexp.weight": "ffn_gate_shexp",
    "ffn_up_shexp.weight": "ffn_up_shexp",
    "ffn_down_shexp.weight": "ffn_down_shexp",
}

_GLOBAL_TENSORS = {
    "token_embd.weight": "tok_embd",
    "token_types.weight": "token_types_embd",
    "token_embd_norm.weight": "tok_norm",
    "token_embd_norm.bias": "tok_norm_b",
    "position_embd.weight": "pos_embd",
    "output_norm.weight": "output_norm",
    "output_norm.bias": "output_norm_b",
    "output.weight": "output",
    "output.bias": "output_b",
    "rope_freqs.weight": "rope_freqs",
}

_ALWAYS_FLOAT = {"attn_norm", "ffn_norm", "output_norm", "attn_q_norm", "attn_k_norm",
                 "post_attn_norm", "post_ffn_norm", "rope_freqs",
                 "bq", "bk", "bv", "bo", "ffn_gate_inp", "ffn_gate_inp_shexp",
                 "ffn_norm_exps",
                 "attn_norm_b", "attn_norm_2", "attn_norm_2_b", "ffn_norm_b",
                 "attn_q_a_norm", "attn_kv_a_norm",
                 "ssm_conv1d", "ssm_conv1d_b", "ssm_dt_b", "ssm_a", "ssm_d",
                 "attn_out_norm", "attn_out_norm_b", "layer_out_norm",
                 "attn_q_norm_b", "attn_k_norm_b",
                 "layer_out_norm_b", "token_types_embd",
                 "attn_sub_norm", "ffn_sub_norm", "wq_scale", "wk_scale",
                 "wv_scale", "wo_scale", "ffn_gate_scale", "ffn_up_scale",
                 "ffn_down_scale",
                 "ffn_gate_b", "ffn_up_b", "ffn_down_b",
                 "output_norm_b", "output_b", "tok_norm", "tok_norm_b"}


def _repack_w4(data, qt, n: int, k: int, mode: str):
    """W4/W4X serving repack: fold 4-bit group-32 formats into the
    4-bit-resident block-diagonal kernel layout (ops/pallas/qmm_w4.py);
    everything else with group-16/32 scales folds into the exact
    int8-resident W8 layout (ops/pallas/qmm_w8.py — q6_K lm_head, q3/q5_K,
    q8_0, IQ repacks).  Remaining formats fall back to Q8F in "w4" (speed)
    mode and to the exact standard repack in "w4x" (fidelity) mode."""
    from llama_kotlin_tpu.quant.fold import GROUP, fold_to_w4, fold_to_w8
    from llama_kotlin_tpu.quant.repack import repack, repack_q8flat

    rp = repack(data, qt, n, k)
    if rp.bits == 4 and rp.group_size == GROUP:
        w4 = fold_to_w4(rp, precise=(mode == "w4x"))
        if mode == "w4" and os.environ.get("LKTPU_DUAL_FOLD") == "1":
            from llama_kotlin_tpu.quant.fold import attach_q8
            from llama_kotlin_tpu.quant import numpy_ref as _nr

            w4 = attach_q8(w4, _nr.dequantize(data, qt, shape=(n, k)))
        return w4
    if rp.group_size in (16, 32):
        return fold_to_w8(rp, precise=(mode == "w4x"))
    return rp if mode == "w4x" else repack_q8flat(data, qt, n, k)


def _load_tensor(f: GGUFFile, name: str, key: str, compute_dtype,
                 fast_mode: str | None = None) -> Any:
    """Load one tensor: QTensor for quantized matmul weights, dense array
    otherwise."""
    info = f.tensors[name]
    qt = info.ggml_type
    data = f.tensor_data(name)
    np_shape = tuple(reversed(info.shape))
    if key in _ALWAYS_FLOAT or not TYPE_TRAITS[qt].is_quantized:
        x = numpy_ref.dequantize(data, qt, shape=np_shape)
        dt = jnp.float32 if key in _ALWAYS_FLOAT else compute_dtype
        # dense MoE expert stacks stay one [n_expert, n, k] array: the
        # grouped ragged-matmul path (ops/moe.py) needs the stacked layout
        # and the dense sweep indexes it the same way a list would be
        return jnp.asarray(x, dtype=dt)
    if len(np_shape) == 2:
        n, k = np_shape
        if fast_mode == "int8":
            from llama_kotlin_tpu.quant.repack import repack_q8flat

            return jax.tree.map(jnp.asarray, repack_q8flat(data, qt, n, k))
        if fast_mode in ("w4", "w4x"):
            return jax.tree.map(jnp.asarray, _repack_w4(data, qt, n, k, fast_mode))
        try:
            return jax.tree.map(jnp.asarray, repack(data, qt, n, k))
        except NotImplementedError:
            # formats without a QTensor repack (none currently; IQ repacks
            # exactly via quant/repack.py repack_iq) — dense fallback
            x = numpy_ref.dequantize(data, qt, shape=np_shape)
            return jnp.asarray(x, dtype=compute_dtype)
    if len(np_shape) == 3:
        # MoE expert stacks [n_expert, n, k].  Two quantized layouts:
        # * small expert counts (mixtral class, E <= 16) in fast modes:
        #   per-expert W4/W8/Q8F folds as a LIST — the dense sweep then
        #   runs each expert through the block-diagonal int8 kernels
        #   (reads E*codes once, no dequant materialisation; for E/k ~ 4
        #   that beats gathering, which writes+reads bf16 copies)
        # * otherwise: one stacked standard QTensor (leading E axis) so
        #   decode gathers only the routed experts' codes (ops/moe.py
        #   moe_gathered_quant, the mul_mat_id access pattern)
        n_exp, n, k = np_shape
        from llama_kotlin_tpu.quant.formats import row_byte_size
        from llama_kotlin_tpu.quant.qtensor import stack_qtensors

        per = n * row_byte_size(k, qt)
        flat = np.ascontiguousarray(data, np.uint8).reshape(n_exp, per)
        if fast_mode and n_exp <= 16:
            if fast_mode == "int8":
                from llama_kotlin_tpu.quant.repack import repack_q8flat

                return [jax.tree.map(jnp.asarray, repack_q8flat(flat[e], qt, n, k))
                        for e in range(n_exp)]
            return [jax.tree.map(jnp.asarray, _repack_w4(flat[e], qt, n, k, fast_mode))
                    for e in range(n_exp)]
        stacked = stack_qtensors([repack(flat[e], qt, n, k) for e in range(n_exp)])
        return jax.tree.map(jnp.asarray, stacked)
    raise NotImplementedError(f"{name}: {len(np_shape)}-D quantized tensor")


def _load_fused_qkv(f: GGUFFile, name: str, cfg: ModelConfig, compute_dtype,
                    fast_mode: str | None) -> dict:
    """Split a fused attn_qkv tensor into wq/wk/wv (+ biases).

    GGUF conversions store fused QKV with contiguous q|k|v output rows
    (the HF converters de-interleave per-head layouts first), so a row
    split is exact — quantized rows are block-aligned and independent
    (cf. build_gpt2/build_falcon views into the wqkv result,
    reference src/llama.cpp).
    """
    info = f.tensors[name]
    qt = info.ggml_type
    data = f.tensor_data(name)
    np_shape = tuple(reversed(info.shape))
    # per-layer head counts (openelm): split sizes follow this block's layer
    li = int(name.split(".")[1]) if name.startswith("blk.") else -1
    qdim = cfg.layer_n_head(li) * cfg.head_dim if li >= 0 else cfg.n_head * cfg.head_dim
    kvdim = (cfg.layer_n_head_kv(li) if li >= 0 else cfg.n_head_kv) * cfg.head_dim
    if name.endswith(".bias"):
        b = numpy_ref.dequantize(data, qt, shape=np_shape)
        return {
            "bq": jnp.asarray(b[:qdim], jnp.float32),
            "bk": jnp.asarray(b[qdim : qdim + kvdim], jnp.float32),
            "bv": jnp.asarray(b[qdim + kvdim :], jnp.float32),
        }
    n, k = np_shape
    assert n == qdim + 2 * kvdim, f"{name}: rows {n} != q+2kv {qdim + 2 * kvdim}"
    bounds = [(0, qdim), (qdim, qdim + kvdim), (qdim + kvdim, n)]
    out = {}
    if TYPE_TRAITS[qt].is_quantized:
        from llama_kotlin_tpu.quant.formats import row_byte_size
        from llama_kotlin_tpu.quant.repack import repack, repack_q8flat

        row_b = row_byte_size(k, qt)
        flat = np.ascontiguousarray(data, np.uint8).reshape(n, row_b)
        for key, (r0, r1) in zip(("wq", "wk", "wv"), bounds):
            part = np.ascontiguousarray(flat[r0:r1]).reshape(-1)
            if fast_mode == "int8":
                rp = repack_q8flat(part, qt, r1 - r0, k)
            elif fast_mode in ("w4", "w4x"):
                rp = _repack_w4(part, qt, r1 - r0, k, fast_mode)
            else:
                rp = repack(part, qt, r1 - r0, k)
            out[key] = jax.tree.map(jnp.asarray, rp)
    else:
        x = numpy_ref.dequantize(data, qt, shape=np_shape)
        for key, (r0, r1) in zip(("wq", "wk", "wv"), bounds):
            out[key] = jnp.asarray(x[r0:r1], dtype=compute_dtype)
    return out


# per-arch reinterpretation of shared tensor names (grok's out-norms are
# pre-residual norms like gemma2's, not bert-style post-norms)
_ARCH_KEY_ALIASES = {
    "grok": {"attn_out_norm": "post_attn_norm", "layer_out_norm": "post_ffn_norm"},
}


def fuse_layer_projections(cfg: ModelConfig, params: dict) -> int:
    """Serving fold: concatenate wq|wk|wv -> wqkv_fused and ffn_gate|up ->
    ffn_gateup_fused per layer (models/llama.py slices the outputs).

    One kernel launch replaces 2-3 on the decode hot path; each Pallas
    invocation costs ~10-15us of fixed ramp (round-3 device traces), so at
    32 layers this is a direct tokens/s win.  Single-chip serving only —
    TP row splits would cross the fused segment boundaries, so callers
    must fuse only when the params stay unsharded (tp == 1).

    Layers are fused only when metadata matches and head counts are the
    config-uniform values (per-layer-head archs like openelm keep split
    projections).  Returns the number of layers fused."""
    from llama_kotlin_tpu.quant.qtensor import QTensor, concat_qtensors

    def fusable(ws):
        if any(w is None for w in ws):
            return False
        if all(isinstance(w, QTensor) for w in ws):
            return not any(w.is_stacked for w in ws)
        return all(isinstance(w, jnp.ndarray) and w.ndim == 2 for w in ws)

    def cat(ws):
        if isinstance(ws[0], QTensor):
            return concat_qtensors(ws)
        return jnp.concatenate(ws, axis=0)

    n_fused = 0
    for li, lp in enumerate(params["layers"]):
        uniform = (cfg.layer_n_head(li) == cfg.n_head
                   and cfg.layer_n_head_kv(li) == cfg.n_head_kv)
        did = False
        qkv = [lp.get(k) for k in ("wq", "wk", "wv")]
        if uniform and fusable(qkv):
            try:
                lp["wqkv_fused"] = cat(qkv)
                for k in ("wq", "wk", "wv"):
                    del lp[k]
                did = True
            except ValueError:
                pass  # mismatched quant metadata: keep split projections
        gu = [lp.get(k) for k in ("ffn_gate", "ffn_up")]
        # gate/up biases, bitnet scales, and sub-norms apply to the SPLIT
        # intermediates — the fused branch computes act(gate)*up directly,
        # so such layers must keep separate projections
        gu_plain = all(lp.get(k) is None for k in (
            "ffn_gate_b", "ffn_up_b", "ffn_gate_scale", "ffn_up_scale",
            "ffn_sub_norm"))
        if (cfg.ffn_gated and fusable(gu) and gu_plain
                and cfg.layer_n_ff(li) == cfg.n_ff):
            try:
                lp["ffn_gateup_fused"] = cat(gu)
                del lp["ffn_gate"], lp["ffn_up"]
                did = True
            except ValueError:
                pass
        n_fused += int(did)
    return n_fused


def load_gguf_model(
    path: str | Path,
    *,
    compute_dtype=jnp.bfloat16,
    progress_callback=None,
    metadata_overrides: Optional[dict] = None,
    fast_mode: Optional[str] = None,
    fuse: bool = False,
) -> tuple[ModelConfig, dict, GGUFFile]:
    """Load a GGUF model file into (config, params pytree, open gguf).

    The GGUFFile stays open (mmap) so callers can read the tokenizer
    metadata; close it when done.

    `metadata_overrides` patches metadata KVs before config mapping
    (parity: llama_model_kv_override, llama.h:245-263).
    `progress_callback(fraction)` returning False cancels the load
    (parity: llama_progress_callback cancellation, llama.h:281-285).
    """
    f = GGUFFile(path)
    if metadata_overrides:
        f.metadata.update(metadata_overrides)
    cfg = config_from_metadata(f.metadata)
    params: dict[str, Any] = {"layers": [dict() for _ in range(cfg.n_layer)]}
    total = len(f.tensors)
    for idx, name in enumerate(f.tensors):
        if progress_callback is not None:
            if progress_callback(idx / total) is False:
                raise InterruptedError("model load cancelled")  # cf. llama.h:281
        if name in _GLOBAL_TENSORS:
            key = _GLOBAL_TENSORS[name]
            params[key] = _load_tensor(f, name, key, compute_dtype, fast_mode)
            continue
        if name.startswith("blk."):
            _, i_str, suffix = name.split(".", 2)
            if suffix in ("attn_qkv.weight", "attn_qkv.bias"):
                params["layers"][int(i_str)].update(
                    _load_fused_qkv(f, name, cfg, compute_dtype, fast_mode)
                )
                continue
            key = _LAYER_TENSORS.get(suffix)
            key = _ARCH_KEY_ALIASES.get(cfg.arch, {}).get(key, key)
            if key is not None:
                params["layers"][int(i_str)][key] = _load_tensor(f, name, key, compute_dtype, fast_mode)
                continue
        # unknown tensors are tolerated (vision towers etc. until supported)
    if "rope_freqs" not in params:
        params["rope_freqs"] = None
    if fuse:
        # single-chip serving fold (see fuse_layer_projections); callers
        # that shard for TP must load with fuse=False
        fuse_layer_projections(cfg, params)
    if progress_callback is not None:
        progress_callback(1.0)
    return cfg, params, f
