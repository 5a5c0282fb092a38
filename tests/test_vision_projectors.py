"""minicpmv resampler + MobileVLM LDP/LDPv2 projector tests.

Each projector is cross-checked against an independent torch
implementation of the reference graph (clip.cpp:810-1011), and the
position helpers against direct loop mirrors of the C code
(clip.cpp:2198-2280, 2365-2379).
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.vision.clip import (
    ClipVisionConfig,
    apply_projector,
    sincos_pos_embed_2d,
    _bucket_positions,
)

EPS = 1e-5


def test_sincos_pos_embed_matches_reference_loops():
    """Mirror get_2d_sincos_pos_embed(embed_dim, (pos_w, pos_h)) with direct
    loops, including the swapped-axis flatten pos_embed_2d[w*H+h]."""
    D, pos_w, pos_h = 16, 3, 5
    got = sincos_pos_embed_2d(D, pos_w, pos_h)
    assert got.shape == (pos_w * pos_h, D)

    H, W = pos_w, pos_h  # the C call passes (pos_w, pos_h) as (H, W)
    ref = np.zeros((H * W, D), np.float32)
    half = D // 2
    for h in range(H):
        for w in range(W):
            emb = np.zeros(D)
            for d in range(half // 2):
                om = 1.0 / (10000.0 ** (d / (half / 2)))
                emb[d] = np.sin(h * om)
                emb[d + half // 2] = np.cos(h * om)
            for d in range(half // 2):
                om = 1.0 / (10000.0 ** (d / (half / 2)))
                emb[half + d] = np.sin(w * om)
                emb[half + d + half // 2] = np.cos(w * om)
            ref[w * H + h] = emb
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_bucket_positions_matches_reference_loops():
    pos_w, pos_h = 7, 4
    got = _bucket_positions(pos_w, pos_h)
    ref = []
    for i in range(pos_h):
        for j in range(pos_w):
            ref.append(int(np.floor(70.0 * i / pos_h)) * 70
                       + int(np.floor(70.0 * j / pos_w)))
    np.testing.assert_array_equal(got, np.asarray(ref, np.int32))


def _rand(rng, *shape, s=0.1):
    return (rng.standard_normal(shape) * s).astype(np.float32)


def _ldp_params(rng, vh: int, C: int) -> dict:
    p = {
        "mlp.1.weight": _rand(rng, C, vh), "mlp.1.bias": _rand(rng, C),
        "mlp.3.weight": _rand(rng, C, C), "mlp.3.bias": _rand(rng, C),
    }
    for b in (1, 2):
        pre = f"mb_block.{b}"
        p[f"{pre}.block.0.0.weight"] = _rand(rng, C, 3, 3)
        p[f"{pre}.block.0.1.weight"] = 1.0 + _rand(rng, C, s=0.02)
        p[f"{pre}.block.0.1.bias"] = _rand(rng, C, s=0.02)
        p[f"{pre}.block.1.fc1.weight"] = _rand(rng, C // 4, C)
        p[f"{pre}.block.1.fc1.bias"] = _rand(rng, C // 4)
        p[f"{pre}.block.1.fc2.weight"] = _rand(rng, C, C // 4)
        p[f"{pre}.block.1.fc2.bias"] = _rand(rng, C)
        p[f"{pre}.block.2.0.weight"] = _rand(rng, C, C)
        p[f"{pre}.block.2.1.weight"] = 1.0 + _rand(rng, C, s=0.02)
        p[f"{pre}.block.2.1.bias"] = _rand(rng, C, s=0.02)
    return p


def _torch_ldp_block(x, p, pre, stride, residual):
    """Independent torch mirror of the LDP mobile-bottleneck block."""
    import torch
    import torch.nn.functional as F

    C = x.shape[1]
    w = torch.from_numpy(p[f"{pre}.block.0.0.weight"]).reshape(C, 1, 3, 3)
    b = F.conv2d(x, w, stride=stride, padding=1, groups=C)
    b = b.permute(0, 2, 3, 1)
    b = F.layer_norm(b, (C,), torch.from_numpy(p[f"{pre}.block.0.1.weight"]),
                     torch.from_numpy(p[f"{pre}.block.0.1.bias"]), eps=EPS)
    b = b.permute(0, 3, 1, 2)
    hw = F.hardswish(b)
    g = hw.mean(dim=(2, 3))
    g = F.relu(F.linear(g, torch.from_numpy(p[f"{pre}.block.1.fc1.weight"]),
                        torch.from_numpy(p[f"{pre}.block.1.fc1.bias"])))
    g = F.linear(g, torch.from_numpy(p[f"{pre}.block.1.fc2.weight"]),
                 torch.from_numpy(p[f"{pre}.block.1.fc2.bias"]))
    g = F.hardsigmoid(g)
    b = hw * g[:, :, None, None]
    n, _, h, ww = b.shape
    y = F.linear(b.reshape(n, C, h * ww).transpose(1, 2),
                 torch.from_numpy(p[f"{pre}.block.2.0.weight"]))
    y = F.layer_norm(y, (C,), torch.from_numpy(p[f"{pre}.block.2.1.weight"]),
                     torch.from_numpy(p[f"{pre}.block.2.1.bias"]), eps=EPS)
    y = y.transpose(1, 2).reshape(n, C, h, ww)
    return x + y if residual else y


@pytest.mark.parametrize("side", [4, 6])
def test_ldp_projector_vs_torch(side):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(31)
    vh, C = 32, 16
    p = _ldp_params(rng, vh, C)
    feats = _rand(rng, side * side, vh, s=0.5)
    cfg = ClipVisionConfig(hidden_size=vh, projector_type="ldp", eps=EPS)

    got = np.asarray(apply_projector(
        {"mm_model": {k: jnp.asarray(v) for k, v in p.items()}},
        cfg, jnp.asarray(feats), side, side))
    assert got.shape == ((side // 2) ** 2, C)

    with torch.no_grad():
        e = F.gelu(F.linear(torch.from_numpy(feats),
                            torch.from_numpy(p["mlp.1.weight"]),
                            torch.from_numpy(p["mlp.1.bias"])))
        e = F.linear(e, torch.from_numpy(p["mlp.3.weight"]),
                     torch.from_numpy(p["mlp.3.bias"]))
        x = e.T.reshape(1, C, side, side)
        x = _torch_ldp_block(x, p, "mb_block.1", 1, residual=True)
        x = _torch_ldp_block(x, p, "mb_block.2", 2, residual=False)
        ref = x.reshape(C, -1).T.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_ldpv2_projector_vs_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(37)
    vh, C, side = 32, 16, 6
    p = {
        "mlp.0.weight": _rand(rng, C, vh), "mlp.0.bias": _rand(rng, C),
        "mlp.2.weight": _rand(rng, C, C), "mlp.2.bias": _rand(rng, C),
        "peg.0.weight": _rand(rng, C, 3, 3), "peg.0.bias": _rand(rng, C),
    }
    feats = _rand(rng, side * side, vh, s=0.5)
    cfg = ClipVisionConfig(hidden_size=vh, projector_type="ldpv2", eps=EPS)
    got = np.asarray(apply_projector(
        {"mm_model": {k: jnp.asarray(v) for k, v in p.items()}},
        cfg, jnp.asarray(feats), side, side))
    assert got.shape == ((side // 2) ** 2, C)

    with torch.no_grad():
        e = F.gelu(F.linear(torch.from_numpy(feats),
                            torch.from_numpy(p["mlp.0.weight"]),
                            torch.from_numpy(p["mlp.0.bias"])))
        e = F.linear(e, torch.from_numpy(p["mlp.2.weight"]),
                     torch.from_numpy(p["mlp.2.bias"]))
        x = e.T.reshape(1, C, side, side)
        x = F.avg_pool2d(x, 2, 2)
        w = torch.from_numpy(p["peg.0.weight"]).reshape(C, 1, 3, 3)
        peg = F.conv2d(x, w, stride=1, padding=1, groups=C)
        peg = peg + torch.from_numpy(p["peg.0.bias"])[None, :, None, None]
        ref = (peg + x).reshape(C, -1).T.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_resampler_projector_vs_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(41)
    vh, E, e_llm, nq = 32, 128, 64, 4  # E = one 128-wide head
    side_w, side_h = 3, 5
    p = {
        "query": _rand(rng, nq, E),
        "kv.weight": _rand(rng, E, vh),
        "proj.weight": _rand(rng, e_llm, E),
        "ln_q.weight": 1.0 + _rand(rng, E, s=0.02), "ln_q.bias": _rand(rng, E, s=0.02),
        "ln_kv.weight": 1.0 + _rand(rng, E, s=0.02), "ln_kv.bias": _rand(rng, E, s=0.02),
        "ln_post.weight": 1.0 + _rand(rng, E, s=0.02), "ln_post.bias": _rand(rng, E, s=0.02),
        "attn.q.weight": _rand(rng, E, E), "attn.q.bias": _rand(rng, E),
        "attn.k.weight": _rand(rng, E, E), "attn.k.bias": _rand(rng, E),
        "attn.v.weight": _rand(rng, E, E), "attn.v.bias": _rand(rng, E),
        "attn.out.weight": _rand(rng, E, E), "attn.out.bias": _rand(rng, E),
    }
    feats = _rand(rng, side_w * side_h, vh, s=0.5)
    cfg = ClipVisionConfig(hidden_size=vh, projector_type="resampler",
                           minicpmv_version=2, eps=EPS)
    got = np.asarray(apply_projector(
        {"resampler": {k: jnp.asarray(v) for k, v in p.items()}},
        cfg, jnp.asarray(feats), side_w, side_h))
    assert got.shape == (nq, e_llm)

    t = {k: torch.from_numpy(v) for k, v in p.items()}
    with torch.no_grad():
        q = F.layer_norm(t["query"], (E,), t["ln_q.weight"], t["ln_q.bias"], eps=EPS)
        v = F.layer_norm(F.linear(torch.from_numpy(feats), t["kv.weight"]),
                         (E,), t["ln_kv.weight"], t["ln_kv.bias"], eps=EPS)
        pos = torch.from_numpy(sincos_pos_embed_2d(E, side_w, side_h))
        k = v + pos
        Q = F.linear(q, t["attn.q.weight"], t["attn.q.bias"]) / np.sqrt(128.0)
        K = F.linear(k, t["attn.k.weight"], t["attn.k.bias"])
        V = F.linear(v, t["attn.v.weight"], t["attn.v.bias"])
        attn = torch.softmax(Q @ K.T, dim=-1) @ V  # single 128-wide head
        o = F.linear(attn, t["attn.out.weight"], t["attn.out.bias"])
        o = F.layer_norm(o, (E,), t["ln_post.weight"], t["ln_post.bias"], eps=EPS)
        ref = F.linear(o, t["proj.weight"]).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_minicpmv_end_to_end_smoke(tmp_path):
    """Full minicpmv mmproj (no CLS, 70x70 pos table, resampler) encodes a
    rectangular image through UHD slicing into (1 + n_slices) * nq embeds."""
    from llama_kotlin_tpu.gguf import GGUFWriter
    from llama_kotlin_tpu.quant.formats import GGMLQuantType
    from llama_kotlin_tpu.vision.clip import ClipModel
    from llama_kotlin_tpu.vision.image import uhd_slice_image
    from llama_kotlin_tpu.vision.llava import image_embed_from_array

    rng = np.random.default_rng(43)
    vh, vff, vlayers, vheads, patch = 32, 64, 2, 2, 14
    E, e_llm, nq = 128, 64, 4

    w = GGUFWriter()
    for k, v in {
        "general.architecture": "clip",
        "clip.has_vision_encoder": True,
        "clip.has_minicpmv_projector": True,
        "clip.minicpmv_version": 2,
        "clip.projector_type": "resampler",
        "clip.use_gelu": False,
        "clip.vision.image_size": 448,
        "clip.vision.patch_size": patch,
        "clip.vision.embedding_length": vh,
        "clip.vision.feed_forward_length": vff,
        "clip.vision.block_count": vlayers,
        "clip.vision.attention.head_count": vheads,
        "clip.vision.attention.layer_norm_epsilon": np.float32(EPS),
        "clip.vision.image_mean": [np.float32(x) for x in (0.5, 0.5, 0.5)],
        "clip.vision.image_std": [np.float32(x) for x in (0.5, 0.5, 0.5)],
    }.items():
        w.add_kv(k, v)

    def emb(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLQuantType.F32)

    emb("v.patch_embd.weight", _rand(rng, vh, 3, patch, patch))
    emb("v.position_embd.weight", _rand(rng, 70 * 70, vh))  # bucketed table
    for i in range(vlayers):
        o = f"v.blk.{i}."
        for nm, shape in [("ln1", (vh,)), ("ln2", (vh,))]:
            emb(o + nm + ".weight", 1.0 + _rand(rng, *shape, s=0.02))
            emb(o + nm + ".bias", _rand(rng, *shape, s=0.02))
        for nm, shape in [("attn_q", (vh, vh)), ("attn_k", (vh, vh)),
                          ("attn_v", (vh, vh)), ("attn_out", (vh, vh)),
                          ("ffn_up", (vff, vh)), ("ffn_down", (vh, vff))]:
            emb(o + nm + ".weight", _rand(rng, *shape))
            emb(o + nm + ".bias", _rand(rng, shape[0]))
    emb("resampler.query", _rand(rng, nq, E))
    emb("resampler.kv.weight", _rand(rng, E, vh))
    emb("resampler.proj.weight", _rand(rng, e_llm, E))
    for nm in ("q", "kv", "post"):
        emb(f"resampler.ln_{nm}.weight", 1.0 + _rand(rng, E, s=0.02))
        emb(f"resampler.ln_{nm}.bias", _rand(rng, E, s=0.02))
    for nm in ("q", "k", "v", "out"):
        emb(f"resampler.attn.{nm}.weight", _rand(rng, E, E))
        emb(f"resampler.attn.{nm}.bias", _rand(rng, E))
    path = tmp_path / "minicpmv.gguf"
    w.write(path)

    clip = ClipModel(path)
    assert clip.cfg.minicpmv_version == 2
    assert clip.cfg.projector_type == "resampler"
    assert not clip.cfg.has_class_embd

    img = (rng.random((700, 1000, 3)) * 255).astype(np.uint8)
    source, rows, grid = uhd_slice_image(img, clip.cfg)
    n_slices = sum(len(r) for r in rows)
    assert grid[0] * grid[1] == n_slices and n_slices > 1

    embeds = image_embed_from_array(clip, img)
    assert embeds.shape == ((1 + n_slices) * nq, e_llm)
    assert np.isfinite(embeds).all()
