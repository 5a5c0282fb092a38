"""OpenELM: per-layer head/kv/ff arrays (reference build_openelm,
src/llama.cpp:13126, dispatch :14881; hparams arrays :2213-2215).

transformers has no in-library OpenELM class (apple's repo uses remote
code), so the oracle is an independent numpy implementation of the
reference graph: fused qkv -> per-head q/k RMS norm -> NEOX rope ->
GQA attention -> gated-silu FFN, per-layer dims throughout.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext

from tests.arch_fixtures import _W, write_arch_gguf

HD = 16  # head_dim
HEADS = (2, 4)
KVS = (1, 2)
FFS = (96, 128)
E = 64
V = 96
EPS = 1e-6


def _build_openelm_weights(rng):
    w = _W(rng, scale=0.08)
    ws = {"token_embd.weight": w.mat(V, E), "output_norm.weight": 1.0 + w.vec(E)}
    for i, (nh, nkv, nf) in enumerate(zip(HEADS, KVS, FFS)):
        p = f"blk.{i}."
        ws[p + "attn_norm.weight"] = 1.0 + w.vec(E)
        ws[p + "attn_qkv.weight"] = w.mat((nh + 2 * nkv) * HD, E)
        ws[p + "attn_q_norm.weight"] = 1.0 + w.vec(HD)
        ws[p + "attn_k_norm.weight"] = 1.0 + w.vec(HD)
        ws[p + "attn_output.weight"] = w.mat(E, nh * HD)
        ws[p + "ffn_norm.weight"] = 1.0 + w.vec(E)
        ws[p + "ffn_gate.weight"] = w.mat(nf, E)
        ws[p + "ffn_up.weight"] = w.mat(nf, E)
        ws[p + "ffn_down.weight"] = w.mat(E, nf)
    return ws


def _md():
    return {
        "openelm.block_count": len(HEADS),
        "openelm.embedding_length": E,
        "openelm.context_length": 256,
        "openelm.attention.head_count": list(HEADS),
        "openelm.attention.head_count_kv": list(KVS),
        "openelm.feed_forward_length": list(FFS),
        "openelm.attention.key_length": HD,
        "openelm.attention.value_length": HD,
        "openelm.rope.dimension_count": HD,
        "openelm.rope.freq_base": np.float32(10000.0),
        "openelm.attention.layer_norm_rms_epsilon": np.float32(EPS),
        "openelm.vocab_size": V,
    }


def _rms(x, w, eps=EPS):
    return x / np.sqrt(np.mean(x.astype(np.float64) ** 2, -1, keepdims=True) + eps) * w


def _rope_neox(x, pos, base=10000.0):
    """x [T, H, D] rotated NEOX-style over the full D."""
    T, H, D = x.shape
    half = D // 2
    inv = base ** (-np.arange(half, dtype=np.float64) * 2 / D)
    ang = pos[:, None].astype(np.float64) * inv[None]  # [T, half]
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    a, b = x[..., :half], x[..., half:]
    return np.concatenate([a * cos - b * sin, a * sin + b * cos], -1)


def _oracle_logits(ws, tokens):
    T = len(tokens)
    pos = np.arange(T)
    h = ws["token_embd.weight"][tokens].astype(np.float64)
    for i, (nh, nkv, nf) in enumerate(zip(HEADS, KVS, FFS)):
        p = f"blk.{i}."
        x = _rms(h, ws[p + "attn_norm.weight"])
        qkv = x @ ws[p + "attn_qkv.weight"].T.astype(np.float64)
        qkv = qkv.reshape(T, nh + 2 * nkv, HD)
        q, k, v = qkv[:, :nh], qkv[:, nh:nh + nkv], qkv[:, nh + nkv:]
        q = _rms(q, ws[p + "attn_q_norm.weight"])
        k = _rms(k, ws[p + "attn_k_norm.weight"])
        q = _rope_neox(q, pos)
        k = _rope_neox(k, pos)
        rep = nh // nkv
        out = np.zeros((T, nh, HD))
        causal = pos[None, :] <= pos[:, None]
        for hh in range(nh):
            g = hh // rep
            s = (q[:, hh] @ k[:, g].T) / np.sqrt(HD)
            s = np.where(causal, s, -1e30)
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[:, hh] = pr @ v[:, g]
        h = h + out.reshape(T, nh * HD) @ ws[p + "attn_output.weight"].T.astype(np.float64)
        x = _rms(h, ws[p + "ffn_norm.weight"])
        gate = x @ ws[p + "ffn_gate.weight"].T.astype(np.float64)
        up = x @ ws[p + "ffn_up.weight"].T.astype(np.float64)
        silu = gate / (1.0 + np.exp(-gate))
        h = h + (silu * up) @ ws[p + "ffn_down.weight"].T.astype(np.float64)
    h = _rms(h, ws["output_norm.weight"])
    return h @ ws["token_embd.weight"].T.astype(np.float64)  # tied output


@pytest.fixture(scope="module")
def openelm_model(tmp_path_factory):
    rng = np.random.default_rng(41)
    ws = _build_openelm_weights(rng)
    path = tmp_path_factory.mktemp("m") / "openelm.gguf"
    write_arch_gguf(path, "openelm", _md(), ws)
    return path, ws


def test_openelm_config(openelm_model):
    path, _ = openelm_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert cfg.n_head_arr == HEADS and cfg.n_head_kv_arr == KVS
    assert cfg.n_ff_arr == FFS
    assert cfg.n_head == max(HEADS) and cfg.n_head_kv == max(KVS)
    assert cfg.head_dim == HD and cfg.tie_word_embeddings
    # fused qkv split per layer
    assert params["layers"][0]["wq"].shape == (HEADS[0] * HD, E)
    assert params["layers"][1]["wk"].shape == (KVS[1] * HD, E)


def test_openelm_logits_vs_oracle(openelm_model):
    path, ws = openelm_model
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    toks = np.array([3, 17, 42, 8, 29], np.int32)
    batch = Batch.single(toks)
    batch.output[:] = True
    assert ctx.decode(batch) == 0
    got = ctx.get_logits()
    ref = _oracle_logits(ws, toks)
    assert np.abs(got - ref).max() < 2e-3, np.abs(got - ref).max()

    # greedy continuation stays consistent across several decode steps
    for step in range(4):
        nxt = int(np.argmax(got[-1]))
        toks = np.append(toks, nxt).astype(np.int32)
        ref = _oracle_logits(ws, toks)
        ctx.decode(Batch.single(np.array([nxt], np.int32), pos0=len(toks) - 1))
        got = ctx.get_logits()
        assert np.abs(got[-1] - ref[-1]).max() < 2e-3
        assert int(np.argmax(got[-1])) == int(np.argmax(ref[-1]))
