"""Vision subsystem tests: CLIP ViT encoder + llava projector + image-
embedding decode, cross-checked against transformers CLIPVisionModel and
LlavaForConditionalGeneration oracles.

Parity targets: clip_image_build_graph (reference examples/llava/clip.cpp
:569), llava_eval_image_embed (llava.cpp:394).
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.gguf import GGUFWriter
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.vision.clip import ClipModel

# tiny CLIP dims
IMG, PATCH, VH, VHEADS, VFF, VLAYERS = 16, 8, 32, 2, 64, 3
E_TXT = 64  # text model n_embd


def _hf_clip_config():
    from transformers import CLIPVisionConfig

    return CLIPVisionConfig(
        hidden_size=VH, intermediate_size=VFF, num_hidden_layers=VLAYERS,
        num_attention_heads=VHEADS, image_size=IMG, patch_size=PATCH,
        hidden_act="quick_gelu",
    )


def _write_mmproj(path, vision_sd, mm_w, mm_b, mm2_w, mm2_b):
    """vision_sd: HF CLIPVisionModel state dict (numpy)."""
    w = GGUFWriter()
    kv = {
        "general.architecture": "clip",
        "clip.has_text_encoder": False,
        "clip.has_vision_encoder": True,
        "clip.has_llava_projector": True,
        "clip.projector_type": "mlp",
        "clip.use_gelu": False,  # quick_gelu encoder
        "clip.vision.image_size": IMG,
        "clip.vision.patch_size": PATCH,
        "clip.vision.embedding_length": VH,
        "clip.vision.feed_forward_length": VFF,
        "clip.vision.block_count": VLAYERS,
        "clip.vision.attention.head_count": VHEADS,
        "clip.vision.attention.layer_norm_epsilon": np.float32(1e-5),
        "clip.vision.image_mean": [np.float32(x) for x in (0.5, 0.5, 0.5)],
        "clip.vision.image_std": [np.float32(x) for x in (0.5, 0.5, 0.5)],
    }
    for k, v in kv.items():
        w.add_kv(k, v)

    def emb(name, arr):
        w.add_tensor(name, np.asarray(arr, np.float32), GGMLQuantType.F32)

    p = "vision_model."
    emb("v.patch_embd.weight", vision_sd[p + "embeddings.patch_embedding.weight"])
    emb("v.class_embd", vision_sd[p + "embeddings.class_embedding"])
    emb("v.position_embd.weight", vision_sd[p + "embeddings.position_embedding.weight"])
    emb("v.pre_ln.weight", vision_sd[p + "pre_layrnorm.weight"])
    emb("v.pre_ln.bias", vision_sd[p + "pre_layrnorm.bias"])
    for i in range(VLAYERS):
        q = p + f"encoder.layers.{i}."
        o = f"v.blk.{i}."
        pairs = [
            ("ln1", "layer_norm1"), ("ln2", "layer_norm2"),
            ("attn_q", "self_attn.q_proj"), ("attn_k", "self_attn.k_proj"),
            ("attn_v", "self_attn.v_proj"), ("attn_out", "self_attn.out_proj"),
            ("ffn_up", "mlp.fc1"), ("ffn_down", "mlp.fc2"),
        ]
        for ours, hf in pairs:
            emb(o + ours + ".weight", vision_sd[q + hf + ".weight"])
            emb(o + ours + ".bias", vision_sd[q + hf + ".bias"])
    emb("mm.0.weight", mm_w)
    emb("mm.0.bias", mm_b)
    emb("mm.2.weight", mm2_w)
    emb("mm.2.bias", mm2_b)
    w.write(path)


@pytest.fixture(scope="module")
def clip_pair(tmp_path_factory):
    """(mmproj path, HF CLIPVisionModel, projector mats)."""
    import torch
    from transformers import CLIPVisionModel

    torch.manual_seed(3)
    hf = CLIPVisionModel(_hf_clip_config()).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(9)
    mm_w = (rng.standard_normal((E_TXT, VH)) * 0.1).astype(np.float32)
    mm_b = (rng.standard_normal(E_TXT) * 0.01).astype(np.float32)
    mm2_w = (rng.standard_normal((E_TXT, E_TXT)) * 0.1).astype(np.float32)
    mm2_b = (rng.standard_normal(E_TXT) * 0.01).astype(np.float32)
    path = tmp_path_factory.mktemp("v") / "mmproj.gguf"
    _write_mmproj(path, sd, mm_w, mm_b, mm2_w, mm2_b)
    return path, hf, (mm_w, mm_b, mm2_w, mm2_b)


def test_clip_encoder_vs_transformers(clip_pair, rng):
    import torch

    path, hf, (mm_w, mm_b, mm2_w, mm2_b) = clip_pair
    clip = ClipModel(path)
    assert clip.cfg.n_layer == VLAYERS and clip.n_patches() == (IMG // PATCH) ** 2

    pixels = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    got = clip.embed_pixels(pixels)  # [4, E_TXT]

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels)[None], output_hidden_states=True)
        feats = out.hidden_states[-2][0, 1:].numpy()  # penultimate, drop CLS
    from scipy.special import erf as _erf

    ref = feats @ mm_w.T + mm_b
    ref = ref * 0.5 * (1.0 + _erf(ref / np.sqrt(2.0)))
    ref = ref @ mm2_w.T + mm2_b
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_llava_end_to_end_vs_transformers(clip_pair, tmp_path):
    """Text-before + image embeds + text-after logits match transformers
    LlavaForConditionalGeneration built from the same weights."""
    import torch
    from transformers import LlavaConfig, LlavaForConditionalGeneration
    from transformers import LlamaConfig

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.vision.llava import eval_image_embed
    from tests.fixtures import (
        build_hf_llama, random_llama_weights, tiny_llama_dims, write_llama_gguf,
    )

    path_mm, hf_clip, (mm_w, mm_b, mm2_w, mm2_b) = clip_pair
    rng = np.random.default_rng(17)
    dims = tiny_llama_dims(vocab=160)
    assert dims["n_embd"] == E_TXT
    weights = random_llama_weights(dims, rng)
    tpath = tmp_path / "txt.gguf"
    write_llama_gguf(tpath, weights, dims)

    # HF llava: same text model + vision tower + projector
    image_token_id = 159  # arbitrary id inside the tiny vocab
    lcfg = LlavaConfig(
        vision_config=_hf_clip_config(),
        text_config=build_hf_llama(weights, dims).config,
        image_token_index=image_token_id,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    hf = LlavaForConditionalGeneration(lcfg).eval()
    hf.language_model.load_state_dict(build_hf_llama(weights, dims).model.state_dict())
    hf.lm_head.load_state_dict(build_hf_llama(weights, dims).lm_head.state_dict())
    hf.vision_tower.load_state_dict(hf_clip.state_dict())
    with torch.no_grad():
        hf.multi_modal_projector.linear_1.weight.copy_(torch.from_numpy(mm_w))
        hf.multi_modal_projector.linear_1.bias.copy_(torch.from_numpy(mm_b))
        hf.multi_modal_projector.linear_2.weight.copy_(torch.from_numpy(mm2_w))
        hf.multi_modal_projector.linear_2.bias.copy_(torch.from_numpy(mm2_b))

    pixels = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    before = [1, 7, 23]
    after = [9, 41, 5]
    n_img = (IMG // PATCH) ** 2
    ids = before + [image_token_id] * n_img + after
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.from_numpy(pixels)[None])
        ref = out.logits[0].numpy()

    cfg, params, f = load_gguf_model(tpath, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    clip = ClipModel(path_mm)

    assert ctx.decode(Batch.single(np.asarray(before, np.int32))) == 0
    embed = clip.embed_pixels(pixels)
    n_past = eval_image_embed(ctx, embed, len(before))
    b = Batch.single(np.asarray(after, np.int32), pos0=n_past)
    b.output[:] = True
    assert ctx.decode(b) == 0
    got = ctx.get_logits()  # logits for the `after` rows
    np.testing.assert_allclose(got, ref[-len(after):], rtol=5e-3, atol=5e-3)


def test_llava_cli(clip_pair, tmp_path, capsys):
    """Drive the llava CLI end-to-end (reference llava-cli.cpp flow)."""
    from llama_kotlin_tpu.tools.llava_cli import main as llava_main
    from tests.fixtures import (
        random_llama_weights, spm_vocab_kvs, tiny_llama_dims, write_llama_gguf,
    )

    path_mm, _, _ = clip_pair
    rng = np.random.default_rng(29)
    dims = tiny_llama_dims(vocab=160)
    weights = random_llama_weights(dims, rng)
    tpath = tmp_path / "t.gguf"
    write_llama_gguf(tpath, weights, dims, extra_kv=spm_vocab_kvs(dims["vocab"]))

    img = (rng.random((24, 20, 3)) * 255).astype(np.uint8)  # non-square: resize path
    ipath = tmp_path / "img.npy"
    np.save(ipath, img)

    llava_main(["-m", str(tpath), "--mmproj", str(path_mm),
                "--image", str(ipath), "-p", "a <image> b", "-n", "6",
                "-c", "128"])
    out = capsys.readouterr().out
    assert len(out.strip()) > 0


def test_spatial_merge_ordering():
    """spatial_merge re-rasters tiles so output row r of the merged grid is
    [tile(ty, 0) patch-row py | tile(ty, 1) patch-row py | ...] with
    r = ty*nps + py — the reference clip_llava_handle_patches permute."""
    from llama_kotlin_tpu.vision.llava import spatial_merge

    gx, gy, nps, D = 3, 2, 4, 5
    P = nps * nps
    tiles = []
    for t in range(gx * gy):
        a = np.zeros((P, D), np.float32)
        a[:, 0] = t
        a[:, 1] = np.arange(P)  # patch index within tile
        tiles.append(a)
    out = spatial_merge(tiles, gx, gy)
    assert out.shape == (gx * gy * P, D)
    for ty in range(gy):
        for py in range(nps):
            for tx in range(gx):
                for px in range(nps):
                    row = ((ty * nps + py) * gx + tx) * nps + px
                    assert out[row, 0] == ty * gx + tx
                    assert out[row, 1] == py * nps + px


def test_anyres_resize_preserves_aspect_with_centered_pad():
    """anyres tiles come from an aspect-preserving resize + centered black
    pad (clip.cpp:1694 resize_and_pad_image), never a stretch."""
    from llama_kotlin_tpu.vision.image import resize_and_pad

    img = np.ones((100, 400, 3), np.float32)  # 4:1 wide, all-ones
    out = resize_and_pad(img, 336, 672)  # target 2:1
    # scale = min(672/400, 336/100) = 1.68 -> new (w=672, h=168), pad_y=84
    assert out.shape == (336, 672, 3)
    assert np.all(out[84:252] > 0.99)  # content band, centered
    assert np.all(out[:84] == 0.0) and np.all(out[252:] == 0.0)  # black pads
    # tall image pads left/right
    out2 = resize_and_pad(np.ones((400, 100, 3), np.float32), 672, 336)
    assert np.all(out2[:, :84] == 0.0) and np.all(out2[:, 252:] == 0.0)
    assert np.all(out2[:, 84:252] > 0.99)


def test_llava16_anyres_end_to_end(clip_pair, rng):
    """llava-1.6 anyres: a 2x1-grid image produces base + re-rastered tile
    embeddings, matching a manual per-tile embed + permute."""
    from llama_kotlin_tpu.gguf.reader import GGUFFile
    from llama_kotlin_tpu.vision.image import anyres_slices
    from llama_kotlin_tpu.vision.llava import image_embed_from_array, spatial_merge

    path, _hf, _mats = clip_pair
    clip = ClipModel(path)
    # force anyres config: pinpoints (w, h) pairs incl. a 2x1 tile grid
    clip.cfg.mm_patch_merge_type = "spatial_unpad"
    clip.cfg.image_grid_pinpoints = (IMG, IMG, 2 * IMG, IMG, IMG, 2 * IMG)

    img = (rng.random((IMG, 2 * IMG, 3)) * 255).astype(np.uint8)  # wide
    got = image_embed_from_array(clip, img)

    slices, (gx, gy) = anyres_slices(img, clip.cfg)
    assert (gx, gy) == (2, 1) and len(slices) == 3  # base + 2 tiles
    embeds = [clip.embed_pixels(s) for s in slices]
    ref = np.concatenate([embeds[0], spatial_merge(embeds[1:], gx, gy)], axis=0)
    np.testing.assert_array_equal(got, ref)
    npatch = clip.n_patches()
    assert got.shape[0] == (1 + gx * gy) * npatch
    # base embeddings are the flat-resize path, unchanged by the merge
    np.testing.assert_array_equal(got[:npatch], embeds[0])
