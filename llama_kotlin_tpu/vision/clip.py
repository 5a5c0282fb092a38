"""CLIP ViT vision encoder + llava projectors (TPU-native).

Parity target: clip_image_build_graph (reference examples/llava/clip.cpp:569)
and the mmproj GGUF schema (clip.cpp:84-134).  Redesign notes:

- The patch "convolution" is an unfold + one [N, 3*P*P] x [3*P*P, H] matmul
  (stride == kernel size makes conv2d exactly a blocked reshape) — the MXU
  path, no conv lowering needed.
- One jitted function runs embed -> pre-LN -> encoder blocks -> feature
  select -> projector; positions are static so XLA sees fixed shapes.
- Like the reference llava path, only the first n_layer-1 encoder blocks
  run (clip.cpp:680 `il < n_layer - 1`, the penultimate-layer features
  that llava trains against), and the CLS row is dropped before the
  projector (clip.cpp:776 get_rows over patches).

Supported projectors: mlp (llava-1.5: mm.0 gelu mm.2), mlp_norm
(mm.0 ln(mm.1) gelu mm.3 ln(mm.4)), ldp/ldpv2 (MobileVLM conv-pool
projectors, clip.cpp:810/920), resampler (minicpmv v2/v3 perceiver
cross-attention with runtime 2D-sincos positional K, clip.cpp:951).

minicpmv encoder differences (clip.cpp:581-675): variable image size per
slice, 70x70 bucketed position ids (clip.cpp:2370), ALL encoder blocks run
(n_layer+1 loop bound), no CLS token.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(eq=False)
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    n_head: int = 16
    n_ff: int = 4096
    n_layer: int = 24
    eps: float = 1e-5
    projector_type: str = "mlp"
    use_gelu_quick: bool = True  # clip.use_gelu False -> gelu_quick
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    has_class_embd: bool = True
    has_pre_norm: bool = True
    has_post_norm: bool = False
    has_patch_bias: bool = False
    mm_patch_merge_type: str = "flat"
    image_grid_pinpoints: tuple = ()
    minicpmv_version: int = 0  # 0 = not minicpmv; 2/3 per clip.minicpmv_version

    @property
    def n_patches_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.n_patches_side ** 2


def config_from_mmproj(md: dict) -> ClipVisionConfig:
    def g(key, default=None):
        v = md.get(key, default)
        return v.item() if hasattr(v, "item") else v

    cfg = ClipVisionConfig(
        image_size=int(g("clip.vision.image_size", 336)),
        patch_size=int(g("clip.vision.patch_size", 14)),
        hidden_size=int(g("clip.vision.embedding_length", 1024)),
        n_head=int(g("clip.vision.attention.head_count", 16)),
        n_ff=int(g("clip.vision.feed_forward_length", 4096)),
        n_layer=int(g("clip.vision.block_count", 24)),
        eps=float(g("clip.vision.attention.layer_norm_epsilon", 1e-5)),
        projector_type=str(g("clip.projector_type", "mlp")),
        use_gelu_quick=not bool(g("clip.use_gelu", False)),
        mm_patch_merge_type=str(g("clip.vision.mm_patch_merge_type", "flat")),
    )
    mean = md.get("clip.vision.image_mean")
    std = md.get("clip.vision.image_std")
    if mean is not None:
        cfg.image_mean = tuple(float(x) for x in mean)
    if std is not None:
        cfg.image_std = tuple(float(x) for x in std)
    grid = md.get("clip.vision.image_grid_pinpoints")
    if grid is not None:
        cfg.image_grid_pinpoints = tuple(int(x) for x in grid)
    if bool(g("clip.has_minicpmv_projector", False)):
        cfg.minicpmv_version = int(g("clip.minicpmv_version", 2))
        cfg.projector_type = "resampler"
    return cfg


def load_clip_params(f, compute_dtype=jnp.float32) -> dict:
    """Load the vision tower + projector from an mmproj GGUF (tensor names
    clip.cpp:113-134).  All dense (mmproj files ship f16/f32)."""
    from llama_kotlin_tpu.quant import numpy_ref

    names = set(f.tensors)

    def t(name, required=False):
        if name not in names:
            if required:
                raise KeyError(f"mmproj missing tensor {name}")
            return None
        info = f.tensors[name]
        x = numpy_ref.dequantize(f.tensor_data(name), info.ggml_type,
                                 shape=tuple(reversed(info.shape)))
        return jnp.asarray(x, compute_dtype)

    p: dict[str, Any] = {
        "patch_embd": t("v.patch_embd.weight", required=True),  # [H, 3, P, P]
        "patch_bias": t("v.patch_embd.bias"),
        "class_embd": t("v.class_embd"),
        "pos_embd": t("v.position_embd.weight", required=True),  # [pos, H]
        "pre_ln_w": t("v.pre_ln.weight"),
        "pre_ln_b": t("v.pre_ln.bias"),
        "post_ln_w": t("v.post_ln.weight"),
        "post_ln_b": t("v.post_ln.bias"),
    }
    p["layers"] = []
    i = 0
    while f"v.blk.{i}.attn_q.weight" in names:
        p["layers"].append({
            k: t(f"v.blk.{i}.{n}.{s}")
            for k, n, s in [
                ("ln1_w", "ln1", "weight"), ("ln1_b", "ln1", "bias"),
                ("wq", "attn_q", "weight"), ("bq", "attn_q", "bias"),
                ("wk", "attn_k", "weight"), ("bk", "attn_k", "bias"),
                ("wv", "attn_v", "weight"), ("bv", "attn_v", "bias"),
                ("wo", "attn_out", "weight"), ("bo", "attn_out", "bias"),
                ("ln2_w", "ln2", "weight"), ("ln2_b", "ln2", "bias"),
                ("ffn_up", "ffn_up", "weight"), ("ffn_up_b", "ffn_up", "bias"),
                ("ffn_down", "ffn_down", "weight"), ("ffn_down_b", "ffn_down", "bias"),
            ]
        })
        i += 1
    # llava projector (mm.N.weight/bias)
    p["mm"] = {}
    for n in (0, 1, 2, 3, 4):
        for s in ("weight", "bias"):
            name = f"mm.{n}.{s}"
            if name in names:
                p["mm"][f"{n}.{s}"] = t(name)
    # MobileVLM ldp/ldpv2 projector (mm.model.*, clip.cpp:1405-1441)
    mdl = {}
    for name in names:
        if name.startswith("mm.model."):
            mdl[name[len("mm.model."):]] = t(name)
    if mdl:
        p["mm_model"] = mdl
    # minicpmv resampler (resampler.*, clip.cpp:1442-1464)
    rs = {}
    for name in names:
        if name.startswith("resampler."):
            rs[name[len("resampler."):]] = t(name)
    if rs:
        p["resampler"] = rs
    p["image_newline"] = t("model.image_newline")
    return p


def _ln(x, w, b, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    y = (x - m) / jnp.sqrt(v + eps)
    return y * w + b


def _gelu_quick(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _dw_conv3x3(x, w, stride: int):
    """Depthwise 3x3 conv, padding 1: x [C, H, W], w [C, 3, 3] -> [C, H', W']
    (ggml_conv_depthwise_2d with s=stride, p=1, d=1)."""
    C = x.shape[0]
    return jax.lax.conv_general_dilated(
        x[None], w[:, None], window_strides=(stride, stride),
        padding=((1, 1), (1, 1)), feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]


def sincos_pos_embed_2d(embed_dim: int, pos_w: int, pos_h: int) -> np.ndarray:
    """2D sincos positional embedding for the minicpmv resampler K — mirrors
    get_2d_sincos_pos_embed(embed_dim, (pos_w, pos_h)) (clip.cpp:2242)
    including its swapped-axis flatten: row-major patch (r, c) gets
    [sincos(c), sincos(r)] halves."""
    def emb1d(pos, dim):
        omega = 1.0 / (10000.0 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2)))
        out = np.outer(pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    r = np.repeat(np.arange(pos_h), pos_w)
    c = np.tile(np.arange(pos_w), pos_h)
    half = embed_dim // 2
    return np.concatenate([emb1d(c, half), emb1d(r, half)], axis=-1).astype(np.float32)


def _bucket_positions(pos_w: int, pos_h: int) -> np.ndarray:
    """minicpmv vision-tower position ids over the trained 70x70 grid
    (clip.cpp:2365-2379): id(r, c) = floor(70r/pos_h)*70 + floor(70c/pos_w)."""
    bh = np.floor(70.0 * np.arange(pos_h) / pos_h).astype(np.int32)
    bw = np.floor(70.0 * np.arange(pos_w) / pos_w).astype(np.int32)
    return (bh[:, None] * 70 + bw[None, :]).reshape(-1)


def _ldp_mb_block(x, blk: dict, prefix: str, eps: float, stride: int,
                  residual: bool):
    """One MobileVLM LDP mobile-bottleneck block (clip.cpp:820-916):
    depthwise conv -> LN -> hardswish -> SE gate (global avgpool, fc1 relu
    fc2 hardsigmoid) -> pointwise conv -> LN (+ residual).  x [C, H, W]."""
    C = x.shape[0]
    dw = blk[f"{prefix}.block.0.0.weight"].reshape(C, 3, 3)
    b = _dw_conv3x3(x, dw, stride)
    # LN over channels: [C, H, W] -> [H, W, C]
    b = jnp.transpose(b, (1, 2, 0))
    b = _ln(b, blk[f"{prefix}.block.0.1.weight"], blk[f"{prefix}.block.0.1.bias"], eps)
    b = jnp.transpose(b, (2, 0, 1))
    hw = _hardswish(b)
    g = hw.mean(axis=(1, 2))  # global average pool -> [C]
    g = jax.nn.relu(jnp.dot(g, blk[f"{prefix}.block.1.fc1.weight"].T)
                    + blk[f"{prefix}.block.1.fc1.bias"])
    g = (jnp.dot(g, blk[f"{prefix}.block.1.fc2.weight"].T)
         + blk[f"{prefix}.block.1.fc2.bias"])
    g = _hardsigmoid(g)
    b = hw * g[:, None, None]
    h, w = b.shape[1], b.shape[2]
    # pointwise conv as a [HW, C] matmul, then LN over channels
    y = jnp.dot(b.reshape(C, h * w).T, blk[f"{prefix}.block.2.0.weight"].T)
    y = _ln(y, blk[f"{prefix}.block.2.1.weight"], blk[f"{prefix}.block.2.1.bias"], eps)
    y = y.T.reshape(C, h, w)
    if residual:
        y = x + y
    return y


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: dict, cfg: ClipVisionConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [3, H, W] f32 (preprocessed) -> projected image embeddings
    [n_image_pos, n_embd_llm] f32.  H/W may differ from cfg.image_size for
    minicpmv slices (shapes are static per trace)."""
    P = cfg.patch_size
    side_h, side_w = pixels.shape[1] // P, pixels.shape[2] // P
    H = cfg.hidden_size
    minicpmv = cfg.minicpmv_version > 0

    # unfold to [n_patches, 3*P*P] and matmul with the flattened conv
    # kernel — stride==kernel conv2d is exactly this blocked reshape
    x = pixels.reshape(3, side_h, P, side_w, P)
    x = x.transpose(1, 3, 0, 2, 4).reshape(side_h * side_w, 3 * P * P)
    w = params["patch_embd"].reshape(H, 3 * P * P)  # [H, 3, P, P] flattened
    h = jnp.dot(x, w.T, preferred_element_type=jnp.float32)  # [N, H]
    if params.get("patch_bias") is not None:
        h = h + params["patch_bias"]
    if cfg.has_class_embd and params.get("class_embd") is not None:
        h = jnp.concatenate([params["class_embd"][None, :], h], axis=0)
    n_pos = h.shape[0]
    if minicpmv:
        # bucketed 70x70 position ids (variable slice sizes share the table)
        h = h + params["pos_embd"][_bucket_positions(side_w, side_h)]
    else:
        h = h + params["pos_embd"][:n_pos]

    if params.get("pre_ln_w") is not None:
        h = _ln(h, params["pre_ln_w"], params["pre_ln_b"], cfg.eps)

    act = _gelu_quick if cfg.use_gelu_quick else jax.nn.gelu
    d_head = H // cfg.n_head
    scale = 1.0 / np.sqrt(d_head)

    # llava feature layer: penultimate (clip.cpp runs il < n_layer - 1);
    # minicpmv runs every block (clip.cpp:675 n_layer += 1)
    n_run = cfg.n_layer if minicpmv else cfg.n_layer - 1
    for lp in params["layers"][:n_run]:
        x = _ln(h, lp["ln1_w"], lp["ln1_b"], cfg.eps)
        q = (jnp.dot(x, lp["wq"].T) + lp["bq"]) * scale
        k = jnp.dot(x, lp["wk"].T) + lp["bk"]
        v = jnp.dot(x, lp["wv"].T) + lp["bv"]
        q = q.reshape(n_pos, cfg.n_head, d_head)
        k = k.reshape(n_pos, cfg.n_head, d_head)
        v = v.reshape(n_pos, cfg.n_head, d_head)
        s = jnp.einsum("qhd,khd->hqk", q, k)
        pr = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", pr, v).reshape(n_pos, H)
        h = h + (jnp.dot(o, lp["wo"].T) + lp["bo"])
        x = _ln(h, lp["ln2_w"], lp["ln2_b"], cfg.eps)
        f = act(jnp.dot(x, lp["ffn_up"].T) + lp["ffn_up_b"])
        h = h + (jnp.dot(f, lp["ffn_down"].T) + lp["ffn_down_b"])

    if cfg.has_post_norm and params.get("post_ln_w") is not None:
        h = _ln(h, params["post_ln_w"], params["post_ln_b"], cfg.eps)

    # drop CLS (clip.cpp get_rows over patch indices 1..n)
    feats = h[1:] if cfg.has_class_embd else h

    return apply_projector(params, cfg, feats, side_w, side_h).astype(jnp.float32)


def apply_projector(params: dict, cfg: ClipVisionConfig, feats: jnp.ndarray,
                    side_w: int, side_h: int) -> jnp.ndarray:
    """Project encoder features [N, hidden] to LLM embeddings (the
    per-projector-type tail of clip_image_build_graph, clip.cpp:780-1011)."""
    mm = params.get("mm", {})
    if cfg.projector_type == "mlp":
        e = jnp.dot(feats, mm["0.weight"].T) + mm["0.bias"]
        e = jax.nn.gelu(e, approximate=False)
        e = jnp.dot(e, mm["2.weight"].T) + mm["2.bias"]
    elif cfg.projector_type == "mlp_norm":
        e = jnp.dot(feats, mm["0.weight"].T) + mm["0.bias"]
        e = _ln(e, mm["1.weight"], mm["1.bias"], cfg.eps)
        e = jax.nn.gelu(e, approximate=False)
        e = jnp.dot(e, mm["3.weight"].T) + mm["3.bias"]
        e = _ln(e, mm["4.weight"], mm["4.bias"], cfg.eps)
    elif cfg.projector_type == "ldp":
        # MobileVLM projector (clip.cpp:810-917): mlp to C=2048, two
        # mobile-bottleneck blocks, second with stride-2 downsampling
        mdl = params["mm_model"]
        e = jax.nn.gelu(jnp.dot(feats, mdl["mlp.1.weight"].T) + mdl["mlp.1.bias"],
                        approximate=False)
        e = jnp.dot(e, mdl["mlp.3.weight"].T) + mdl["mlp.3.bias"]  # [N, C]
        C = e.shape[-1]
        xc = e.T.reshape(C, side_h, side_w)
        xc = _ldp_mb_block(xc, mdl, "mb_block.1", cfg.eps, stride=1, residual=True)
        xc = _ldp_mb_block(xc, mdl, "mb_block.2", cfg.eps, stride=2, residual=False)
        e = xc.reshape(C, -1).T  # [H/2 * W/2, C]
    elif cfg.projector_type == "ldpv2":
        # MobileVLM-v2 (clip.cpp:920-947): mlp -> 2x2 avg pool -> depthwise
        # PEG conv with residual
        mdl = params["mm_model"]
        e = jax.nn.gelu(jnp.dot(feats, mdl["mlp.0.weight"].T) + mdl["mlp.0.bias"],
                        approximate=False)
        e = jnp.dot(e, mdl["mlp.2.weight"].T) + mdl["mlp.2.bias"]
        C = e.shape[-1]
        xc = e.T.reshape(C, side_h, side_w)
        xc = xc.reshape(C, side_h // 2, 2, side_w // 2, 2).mean(axis=(2, 4))
        peg_w = mdl["peg.0.weight"].reshape(C, 3, 3)
        peg = _dw_conv3x3(xc, peg_w, stride=1) + mdl["peg.0.bias"][:, None, None]
        xc = peg + xc
        e = xc.reshape(C, -1).T
    elif cfg.projector_type == "resampler":
        # minicpmv perceiver resampler (clip.cpp:951-1011): learned queries
        # cross-attend to kv-projected features; K adds a runtime 2D-sincos
        # positional embedding over the slice's patch grid
        rs = params["resampler"]
        E = rs["query"].shape[-1]
        q = _ln(rs["query"], rs["ln_q.weight"], rs["ln_q.bias"], cfg.eps)
        v = jnp.dot(feats, rs["kv.weight"].T)
        v = _ln(v, rs["ln_kv.weight"], rs["ln_kv.bias"], cfg.eps)
        k = v + jnp.asarray(sincos_pos_embed_2d(E, side_w, side_h))
        d_head_r = 128
        n_head_r = E // d_head_r
        nq = q.shape[0]
        Q = (jnp.dot(q, rs["attn.q.weight"].T) + rs["attn.q.bias"]) / np.sqrt(d_head_r)
        K = jnp.dot(k, rs["attn.k.weight"].T) + rs["attn.k.bias"]
        V = jnp.dot(v, rs["attn.v.weight"].T) + rs["attn.v.bias"]
        Qh = Q.reshape(nq, n_head_r, d_head_r)
        Kh = K.reshape(-1, n_head_r, d_head_r)
        Vh = V.reshape(-1, n_head_r, d_head_r)
        s = jnp.einsum("qhd,khd->hqk", Qh, Kh)
        pr = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", pr, Vh).reshape(nq, E)
        o = jnp.dot(o, rs["attn.out.weight"].T) + rs["attn.out.bias"]
        o = _ln(o, rs["ln_post.weight"], rs["ln_post.bias"], cfg.eps)
        e = jnp.dot(o, rs["proj.weight"].T)
    else:
        raise NotImplementedError(f"projector {cfg.projector_type!r}")
    return e


class ClipModel:
    """Loaded mmproj: config + params + preprocessing + encode."""

    def __init__(self, path, compute_dtype=jnp.float32):
        from llama_kotlin_tpu.gguf.reader import GGUFFile

        f = GGUFFile(path)
        self.cfg = config_from_mmproj(f.metadata)
        self.params = load_clip_params(f, compute_dtype)
        f.close()
        # flags follow tensor presence, like clip_model_load (clip.cpp:1342-1367)
        p = self.params
        self.cfg.has_class_embd = p.get("class_embd") is not None
        self.cfg.has_pre_norm = p.get("pre_ln_w") is not None
        self.cfg.has_post_norm = p.get("post_ln_w") is not None
        self.cfg.has_patch_bias = p.get("patch_bias") is not None

    def n_patches(self) -> int:
        return self.cfg.n_patches

    def embed_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """Preprocessed pixels [3, S, S] -> [n_patches, n_embd_llm]."""
        return np.asarray(encode_image(self.params, self.cfg,
                                       jnp.asarray(pixels, jnp.float32)))

    def embed_image(self, image: np.ndarray) -> np.ndarray:
        """Raw uint8 HWC image -> projected embeddings (resize+normalize,
        cf. clip_image_preprocess)."""
        from llama_kotlin_tpu.vision.image import preprocess

        return self.embed_pixels(preprocess(image, self.cfg))
