"""T5 encoder-decoder.

Parity targets: build_t5_encoder / build_t5_decoder + llama_encode_internal
(reference src/llama.cpp:13883-14250, 15819) and the relative-position
bucketing of llama_relative_position_bucket (:15379): pre-norm RMS blocks,
unscaled attention (kq_scale = 1.0) with a learned per-head relative
position bias (shared from layer 0 when absent), relu FFN (gated gelu for
flan-t5), and decoder cross-attention over the encoder output.

The decode driver here recomputes the decoder prefix per step (correct and
simple; an incremental cell-cache decoder is a later optimisation) — the
encoder runs once, cross K/V are precomputed per layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.models.config import ModelConfig, config_from_metadata
from llama_kotlin_tpu.ops.norms import rms_norm
from llama_kotlin_tpu.ops.qmatmul import qmatmul, take_rows

NEG_INF = -1e30


def rel_pos_bucket(kpos, qpos, n_buckets: int, bidirectional: bool,
                   max_distance: int = 128):
    """Vectorized llama_relative_position_bucket (src/llama.cpp:15379):
    bucket id for each (query, key) pair; kpos/qpos broadcastable arrays."""
    rel = kpos - qpos
    bucket = jnp.zeros(jnp.broadcast_shapes(np.shape(rel)), jnp.int32)
    nb = n_buckets
    if bidirectional:
        nb //= 2
        bucket = jnp.where(rel > 0, nb, 0).astype(jnp.int32)
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        * (nb - max_exact) / np.log(max_distance / max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return bucket + jnp.where(rel < max_exact, rel, large)


def _attn(cfg, lp, prefix, x, kv_x, bias, mask, compute_dtype):
    """T5 attention (kq_scale=1.0): x queries, kv_x keys/values,
    bias [n_head, nq, nk] or None, mask [nq, nk] bool or None."""
    H, hd = cfg.n_head, cfg.head_dim
    nq, nk = x.shape[0], kv_x.shape[0]
    q = qmatmul(x, lp[prefix + "wq"], compute_dtype=compute_dtype)
    k = qmatmul(kv_x, lp[prefix + "wk"], compute_dtype=compute_dtype)
    v = qmatmul(kv_x, lp[prefix + "wv"], compute_dtype=compute_dtype)
    q = q.reshape(nq, H, hd).astype(jnp.float32)
    k = k.reshape(nk, H, hd).astype(jnp.float32)
    v = v.reshape(nk, H, hd).astype(jnp.float32)
    scores = jnp.einsum("qhd,khd->hqk", q, k)  # unscaled, cf. build_t5
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask[None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v).reshape(nq, H * hd)
    return qmatmul(out.astype(compute_dtype), lp[prefix + "wo"],
                   compute_dtype=compute_dtype)


def _ffn(cfg, lp, x, compute_dtype):
    from llama_kotlin_tpu.ops.activations import ACTIVATIONS

    up = qmatmul(x, lp["ffn_up"], compute_dtype=compute_dtype)
    if lp.get("ffn_gate") is not None:  # flan-t5: gated gelu
        gate = qmatmul(x, lp["ffn_gate"], compute_dtype=compute_dtype)
        ffn = ACTIVATIONS["gelu"](gate) * up
    else:
        ffn = ACTIVATIONS["relu"](up)
    return qmatmul(ffn.astype(compute_dtype), lp["ffn_down"],
                   compute_dtype=compute_dtype)


def _rel_bias(layers, idx, key, buckets):
    """bias [n_head, nq, nk] from the layer's (or layer 0's) table."""
    rb = layers[idx].get(key)
    if rb is None:
        rb = layers[0].get(key)
    if rb is None:
        return None
    return jnp.transpose(rb[buckets], (2, 0, 1))  # [nq, nk, H] -> [H, nq, nk]


def t5_encode(params, cfg: ModelConfig, tokens, *, compute_dtype=jnp.float32):
    """tokens [T] -> encoder hidden states [T, E] (llama_encode_internal)."""
    nb = cfg.extra.get("rel_buckets", 32)
    T = tokens.shape[0]
    pos = jnp.arange(T)
    buckets = rel_pos_bucket(pos[None, :], pos[:, None], nb, bidirectional=True)
    h = take_rows(params["tok_embd"], tokens, dtype=compute_dtype)
    enc = params["enc"]
    for i, lp in enumerate(enc["layers"]):
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        bias = _rel_bias(enc["layers"], i, "attn_rel_b", buckets)
        h = h + _attn(cfg, lp, "", x, x, bias, None, compute_dtype).astype(h.dtype)
        x = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        h = h + _ffn(cfg, lp, x, compute_dtype).astype(h.dtype)
    return rms_norm(h, enc["output_norm"], cfg.rms_eps)


def t5_decode(params, cfg: ModelConfig, dec_tokens, enc_hidden, *,
              compute_dtype=jnp.float32):
    """dec_tokens [Td] + enc_hidden [Te, E] -> logits [Td, vocab] f32."""
    nb = cfg.extra.get("rel_buckets", 32)
    Td = dec_tokens.shape[0]
    pos = jnp.arange(Td)
    buckets = rel_pos_bucket(pos[None, :], pos[:, None], nb, bidirectional=False)
    causal = pos[None, :] <= pos[:, None]
    h = take_rows(params["tok_embd"], dec_tokens, dtype=compute_dtype)
    dec = params["dec"]
    enc_h = enc_hidden.astype(compute_dtype)
    for i, lp in enumerate(dec["layers"]):
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        bias = _rel_bias(dec["layers"], i, "attn_rel_b", buckets)
        h = h + _attn(cfg, lp, "", x, x, bias, causal, compute_dtype).astype(h.dtype)
        x = rms_norm(h, lp["cross_attn_norm"], cfg.rms_eps)
        h = h + _attn(cfg, lp, "cross_", x, enc_h, None, None,
                      compute_dtype).astype(h.dtype)
        x = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        h = h + _ffn(cfg, lp, x, compute_dtype).astype(h.dtype)
    h = rms_norm(h, dec["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["tok_embd"]
    return qmatmul(h, out_w, compute_dtype=compute_dtype).astype(jnp.float32)


# -- GGUF loading (enc./dec. tensor namespaces) ------------------------------

_T5_SUFFIX = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_o.weight": "wo",
    "attn_rel_b.weight": "attn_rel_b",
    "cross_attn_norm.weight": "cross_attn_norm",
    "cross_attn_q.weight": "cross_wq",
    "cross_attn_k.weight": "cross_wk",
    "cross_attn_v.weight": "cross_wv",
    "cross_attn_o.weight": "cross_wo",
    "cross_attn_rel_b.weight": "cross_attn_rel_b",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
}
_T5_FLOAT = {"attn_norm", "ffn_norm", "cross_attn_norm", "attn_rel_b",
             "cross_attn_rel_b"}


def load_t5(path, *, compute_dtype=jnp.float32):
    """Load a t5 / t5encoder GGUF -> (cfg, params, open GGUFFile)."""
    from llama_kotlin_tpu.gguf.reader import GGUFFile
    from llama_kotlin_tpu.models.loader import _load_tensor

    f = GGUFFile(path)
    cfg = config_from_metadata(f.metadata)
    arch = cfg.arch
    cfg.extra["rel_buckets"] = int(np.asarray(
        f.metadata.get(f"{arch}.attention.relative_buckets_count", 32)))
    cfg.extra["decoder_start_token_id"] = int(np.asarray(
        f.metadata.get(f"{arch}.decoder_start_token_id", 0)))
    n_layer = cfg.n_layer
    params = {
        "enc": {"layers": [dict() for _ in range(n_layer)]},
        "dec": {"layers": [dict() for _ in range(n_layer)]},
    }
    for name in f.tensors:
        if name == "token_embd.weight":
            params["tok_embd"] = _load_tensor(f, name, "tok_embd", compute_dtype)
        elif name == "output.weight":
            params["output"] = _load_tensor(f, name, "output", compute_dtype)
        elif name in ("enc.output_norm.weight", "dec.output_norm.weight"):
            side = name.split(".", 1)[0]
            params[side]["output_norm"] = _load_tensor(f, name, "output_norm",
                                                       compute_dtype)
        elif name.startswith(("enc.blk.", "dec.blk.")):
            side, _, rest = name.partition(".blk.")
            i_str, _, suffix = rest.partition(".")
            key = _T5_SUFFIX.get(suffix)
            if key is None:
                continue
            params[side]["layers"][int(i_str)][key] = _load_tensor(
                f, name, "attn_norm" if key in _T5_FLOAT else key, compute_dtype)
    return cfg, params, f


class T5Context:
    """Enc-dec driver: encode once, greedy/step decode with prefix
    recomputation (cf. llama_encode + llama_decode for T5)."""

    def __init__(self, cfg: ModelConfig, params: dict, compute_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self.enc_hidden: Optional[jnp.ndarray] = None
        self._enc = jax.jit(
            lambda p, t: t5_encode(p, cfg, t, compute_dtype=compute_dtype))
        self._dec = jax.jit(
            lambda p, t, e: t5_decode(p, cfg, t, e, compute_dtype=compute_dtype))

    def encode(self, tokens) -> np.ndarray:
        self.enc_hidden = self._enc(self.params, jnp.asarray(tokens, jnp.int32))
        return np.asarray(self.enc_hidden)

    def decode_logits(self, dec_tokens) -> np.ndarray:
        assert self.enc_hidden is not None, "call encode() first"
        return np.asarray(self._dec(self.params,
                                    jnp.asarray(dec_tokens, jnp.int32),
                                    self.enc_hidden))

    def generate(self, enc_tokens, n_steps: int, eos_id: int = 1) -> list[int]:
        self.encode(enc_tokens)
        dec = [self.cfg.extra.get("decoder_start_token_id", 0)]
        out: list[int] = []
        for _ in range(n_steps):
            logits = self.decode_logits(np.asarray(dec, np.int32))
            t = int(logits[-1].argmax())
            if t == eos_id:
                break
            out.append(t)
            dec.append(t)
        return out
