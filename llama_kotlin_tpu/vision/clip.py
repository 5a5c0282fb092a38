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
(mm.0 ln(mm.1) gelu mm.3 ln(mm.4)).  ldp/ldpv2/minicpmv resampler are
loaded-but-unsupported errors for now.
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
    p["image_newline"] = t("model.image_newline")
    return p


def _ln(x, w, b, eps):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    y = (x - m) / jnp.sqrt(v + eps)
    return y * w + b


def _gelu_quick(x):
    return x * jax.nn.sigmoid(1.702 * x)


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: dict, cfg: ClipVisionConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [3, H, W] f32 (preprocessed) -> projected image embeddings
    [n_patches, n_embd_llm] f32."""
    P = cfg.patch_size
    side = cfg.n_patches_side
    H = cfg.hidden_size

    # unfold to [n_patches, 3*P*P] and matmul with the flattened conv
    # kernel — stride==kernel conv2d is exactly this blocked reshape
    x = pixels.reshape(3, side, P, side, P)
    x = x.transpose(1, 3, 0, 2, 4).reshape(side * side, 3 * P * P)
    w = params["patch_embd"].reshape(H, 3 * P * P)  # [H, 3, P, P] flattened
    h = jnp.dot(x, w.T, preferred_element_type=jnp.float32)  # [N, H]
    if params.get("patch_bias") is not None:
        h = h + params["patch_bias"]
    if cfg.has_class_embd and params.get("class_embd") is not None:
        h = jnp.concatenate([params["class_embd"][None, :], h], axis=0)
    n_pos = h.shape[0]
    h = h + params["pos_embd"][:n_pos]

    if params.get("pre_ln_w") is not None:
        h = _ln(h, params["pre_ln_w"], params["pre_ln_b"], cfg.eps)

    act = _gelu_quick if cfg.use_gelu_quick else jax.nn.gelu
    d_head = H // cfg.n_head
    scale = 1.0 / np.sqrt(d_head)

    # llava feature layer: penultimate (clip.cpp runs il < n_layer - 1)
    for lp in params["layers"][: cfg.n_layer - 1]:
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

    mm = params["mm"]
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
    else:
        raise NotImplementedError(
            f"projector {cfg.projector_type!r} (ldp/resampler: round 3)")
    return e.astype(jnp.float32)


class ClipModel:
    """Loaded mmproj: config + params + preprocessing + encode."""

    def __init__(self, path, compute_dtype=jnp.float32):
        from llama_kotlin_tpu.gguf.reader import GGUFFile

        f = GGUFFile(path)
        self.cfg = config_from_mmproj(f.metadata)
        self.params = load_clip_params(f, compute_dtype)
        f.close()

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
