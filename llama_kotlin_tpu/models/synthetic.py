"""Synthetic model construction: random weights in any quant format.

Used by the benchmark harness (no network access on bench hosts), the
graft entry points, and tests.  Shapes mirror real checkpoints so the
performance profile matches real serving.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS
from llama_kotlin_tpu.quant.repack import repack_float


PRESETS = {
    # name: (n_embd, n_layer, n_head, n_head_kv, n_ff, vocab)
    "tinyllama-1.1b": (2048, 22, 32, 4, 5632, 32000),
    "llama2-7b": (4096, 32, 32, 32, 11008, 32000),
    "llama3-8b": (4096, 32, 32, 8, 14336, 128256),
    "llama3-70b": (8192, 80, 64, 8, 28672, 128256),
    "test-tiny": (256, 4, 8, 4, 512, 512),
}


def preset_config(name: str, **overrides) -> ModelConfig:
    e, l, h, kv, f, v = PRESETS[name]
    kw = dict(arch="llama", name=name, n_embd=e, n_layer=l, n_head=h,
              n_head_kv=kv, n_ff=f, vocab_size=v, n_ctx_train=4096)
    kw.update(overrides)
    return ModelConfig(**kw)


def synthetic_q8flat(rng, n: int, k: int, scale: float = 0.02):
    """Random Q8F (W8A8 fast-mode) weight: int8 codes + f32/256 scales."""
    from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN

    k_pad = (k + SPAN - 1) // SPAN * SPAN
    codes = rng.integers(-127, 128, (n, k_pad), dtype=np.int8)
    scales = (rng.random((n, k_pad // SPAN), np.float32) * scale / 127.0).astype(np.float32)
    return QTensor(codes=codes, g_scale=scales, g_min=None, sb_scale=None,
                   sb_min=None, qtype=GGMLQuantType.Q8_0, bits=8,
                   group_size=SPAN, code_offset=0, shape=(n, k))


def synthetic_w4(rng, n: int, k: int, scale: float = 0.02, precise: bool = False):
    """Random W4 (W4A8 fast-mode, quant/fold.py layout) weight: plane-packed
    4-bit codes + per-32-group bf16 scales/mins + transposed scale planes.
    precise=True builds the W4X f32-scale layout (dual-plane activations)."""
    from llama_kotlin_tpu.quant.fold import GROUP, w4_from_parts
    from llama_kotlin_tpu.quant.qtensor import SPAN

    k_pad = (k + SPAN - 1) // SPAN * SPAN
    G = k_pad // GROUP
    packed = rng.integers(0, 256, (n, k_pad // 2), dtype=np.uint8)
    s_eff = (rng.random((n, G), np.float32) * scale / 8.0).astype(np.float32)
    m_adj = (rng.random((n, G), np.float32) * scale * 0.5).astype(np.float32)
    return w4_from_parts(packed, s_eff, m_adj, (n, k), precise=precise)


def synthetic_qtensor(rng, n: int, k: int, qtype: GGMLQuantType, scale: float = 0.02):
    """Build a QTensor with random codes/scales directly (no float
    quantization pass) — fast enough for billion-parameter synthetic
    models, with the same decode cost profile as real weights."""
    from llama_kotlin_tpu.quant import repack as R
    from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN

    # probe the format's repacked geometry with a tiny instance
    probe = R.repack_float(np.zeros((1, SPAN), np.float32), qtype)
    k_pad = (k + SPAN - 1) // SPAN * SPAN
    g = probe.group_size

    cols = k_pad // SPAN * probe.codes.shape[1]  # probe has exactly one span
    codes = rng.integers(0, 256, (n, cols), dtype=np.uint8)
    if probe.codes.dtype == np.int8:
        codes = (codes.view(np.int8) // 4).astype(np.int8)  # keep magnitudes sane
    elif probe.bits == 8:
        codes &= 0x1F  # unsigned byte-stored formats (q5_*) top out at 31
    if np.issubdtype(probe.g_scale.dtype, np.floating):
        g_scale = (rng.random((n, k_pad // g), np.float32) * scale).astype(probe.g_scale.dtype)
    else:
        g_scale = rng.integers(0, 64, (n, k_pad // g)).astype(probe.g_scale.dtype)
    g_min = None
    if probe.g_min is not None:
        if np.issubdtype(probe.g_min.dtype, np.floating):
            g_min = (rng.random((n, k_pad // g), np.float32) * scale * 0.1).astype(probe.g_min.dtype)
        else:
            g_min = rng.integers(0, 16, (n, k_pad // g)).astype(probe.g_min.dtype)
    sb_scale = sb_min = None
    if probe.sb_scale is not None:
        sb_scale = (rng.random((n, k_pad // SPAN), np.float32) * scale / 32).astype(probe.sb_scale.dtype)
    if probe.sb_min is not None:
        sb_min = (rng.random((n, k_pad // SPAN), np.float32) * scale / 32).astype(probe.sb_min.dtype)
    return QTensor(codes=codes, g_scale=g_scale, g_min=g_min, sb_scale=sb_scale,
                   sb_min=sb_min, qtype=qtype, bits=probe.bits, group_size=g,
                   code_offset=probe.code_offset, shape=(n, k))


def _rand_weight(rng, n, k, qtype: Optional[GGMLQuantType], dtype, fast_int8=False,
                 fast_w4a8=False):
    import jax

    if qtype is None or not TYPE_TRAITS[qtype].is_quantized:
        x = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        return jax.device_put(jnp.asarray(x, dtype=dtype))
    if fast_w4a8:
        return jax.tree.map(jnp.asarray,
                            synthetic_w4(rng, n, k, precise=(fast_w4a8 == "w4x")))
    if fast_int8:
        return jax.tree.map(jnp.asarray, synthetic_q8flat(rng, n, k))
    return jax.tree.map(jnp.asarray, synthetic_qtensor(rng, n, k, qtype))


def synthetic_params(cfg: ModelConfig, qtype: Optional[GGMLQuantType] = None,
                     seed: int = 0, compute_dtype=jnp.bfloat16,
                     tie_output: bool = False, fast_int8: bool = False,
                     fast_w4a8: bool = False) -> dict:
    """Random params pytree for `cfg`, with matmul weights in `qtype`."""
    rng = np.random.default_rng(seed)
    E, F, V = cfg.n_embd, cfg.n_ff, cfg.vocab_size
    qdim = cfg.n_head * cfg.head_dim
    kvdim = cfg.n_head_kv * cfg.head_dim

    def norm_w():
        return jnp.asarray(1.0 + 0.01 * rng.standard_normal(E), jnp.float32)

    params: dict = {
        "tok_embd": _rand_weight(rng, V, E, qtype, compute_dtype, fast_int8, fast_w4a8),
        "output_norm": norm_w(),
        "rope_freqs": None,
    }
    if not tie_output:
        params["output"] = _rand_weight(rng, V, E, qtype, compute_dtype, fast_int8, fast_w4a8)
    params["layers"] = []
    for _ in range(cfg.n_layer):
        params["layers"].append(
            {
                "attn_norm": norm_w(),
                "wq": _rand_weight(rng, qdim, E, qtype, compute_dtype, fast_int8, fast_w4a8),
                "wk": _rand_weight(rng, kvdim, E, qtype, compute_dtype, fast_int8, fast_w4a8),
                "wv": _rand_weight(rng, kvdim, E, qtype, compute_dtype, fast_int8, fast_w4a8),
                "wo": _rand_weight(rng, E, qdim, qtype, compute_dtype, fast_int8, fast_w4a8),
                "ffn_norm": norm_w(),
            }
        )
        lp = params["layers"][-1]
        if cfg.n_expert > 0:
            import jax

            from llama_kotlin_tpu.quant.qtensor import QTensor, stack_qtensors

            lp["ffn_gate_inp"] = jnp.asarray(
                rng.standard_normal((cfg.n_expert, E)) * 0.02, jnp.float32)
            for key, (nn, kk) in (("ffn_gate_exps", (F, E)),
                                  ("ffn_up_exps", (F, E)),
                                  ("ffn_down_exps", (E, F))):
                # mirror the loader policy: beyond E=16 fast modes fall
                # back to standard stacked repack + routed-expert gather,
                # so synthetic benches measure the real serving path
                big_e = cfg.n_expert > 16
                ws = [_rand_weight(rng, nn, kk, qtype, compute_dtype,
                                   fast_int8 and not big_e,
                                   False if big_e else fast_w4a8)
                      for _ in range(cfg.n_expert)]
                if isinstance(ws[0], QTensor):
                    fast_eligible = (ws[0].aux is not None  # W4/W8 folds
                                     or (ws[0].bits == 8
                                         and ws[0].group_size == 256
                                         and ws[0].g_min is None))  # Q8F
                    if (fast_eligible and cfg.n_expert <= 16) \
                            or ws[0].aux is not None:
                        # per-expert list: sweep runs each expert through
                        # the block-diagonal/int8 kernels (loader policy);
                        # aux-carrying folds are never stackable
                        lp[key] = ws
                    else:
                        lp[key] = jax.tree.map(jnp.asarray, stack_qtensors(ws))
                else:
                    lp[key] = jnp.stack(ws)
        else:
            lp["ffn_gate"] = _rand_weight(rng, F, E, qtype, compute_dtype, fast_int8, fast_w4a8)
            lp["ffn_up"] = _rand_weight(rng, F, E, qtype, compute_dtype, fast_int8, fast_w4a8)
            lp["ffn_down"] = _rand_weight(rng, E, F, qtype, compute_dtype, fast_int8, fast_w4a8)
    return params
