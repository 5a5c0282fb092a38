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
    # BASELINE.json configs[3]: Mistral-7B long-context (32k) GQA
    "mistral-7b": (4096, 32, 32, 8, 14336, 32000),
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


def synthetic_w4(rng, n: int, k: int, scale: float = 0.02, precise: bool = False,
                 sym: bool = False, compact: Optional[bool] = None):
    """Random W4 (W4A8 fast-mode, quant/fold.py layout) weight: plane-packed
    4-bit codes + per-32-group scales/mins + transposed scale planes.
    precise=True builds the W4X f32-scale layout (dual-plane activations);
    sym=True mirrors a symmetric source (Q4_0 profile: m_adj = 8*s on lo
    groups, no madj_t plane — 4.5 bits/weight serving reads).
    compact (default: fold.py's env default for asym non-precise) mirrors a
    Q4_K source's wire factorization: int8 6-bit scale/min codes +
    per-superblock f32 d/dmin aux planes (4.625 bits/weight)."""
    import os as _os

    from llama_kotlin_tpu.quant.fold import (ALIGN_W4, GROUP, compact_planes,
                                             w4_from_parts)
    from llama_kotlin_tpu.quant.qtensor import SPAN

    k_pad = (k + ALIGN_W4 - 1) // ALIGN_W4 * ALIGN_W4  # kernel chunk align
    G = k_pad // GROUP
    packed = rng.integers(0, 256, (n, k_pad // 2), dtype=np.uint8)
    if compact is None:
        compact = (not precise and not sym
                   and _os.environ.get("LKTPU_W4_COMPACT", "1") == "1")
    # fold.py layout guard: compact needs a >=1024 plane-col chunk plan
    compact = compact and (k_pad // 2) % 1024 == 0
    if compact and not sym and not precise:
        S = k_pad // SPAN
        sc6 = rng.integers(0, 64, (n, G), dtype=np.int8)
        m6 = rng.integers(0, 64, (n, G), dtype=np.int8)
        # d/dmin round through f16 like the wire values (dd_t stores f16)
        d_sb = (rng.random((n, S), np.float32) * scale / 500.0).astype(
            np.float16).astype(np.float32)
        dmin_sb = (rng.random((n, S), np.float32) * scale / 500.0).astype(
            np.float16).astype(np.float32)
        rep = SPAN // GROUP
        s_eff = sc6.astype(np.float32) * np.repeat(d_sb, rep, axis=1)
        m_eff = m6.astype(np.float32) * np.repeat(dmin_sb, rep, axis=1)
        is_lo = (np.arange(G) % 8) < 4
        m_adj = np.where(is_lo, m_eff, m_eff - 8.0 * s_eff).astype(np.float32)
        return w4_from_parts(packed, s_eff, m_adj, (n, k),
                             compact_parts=compact_planes(sc6, m6, d_sb,
                                                          dmin_sb))
    s_eff = (rng.random((n, G), np.float32) * scale / 8.0).astype(np.float32)
    if sym:
        is_lo = (np.arange(G) % 8) < 4
        m_adj = np.where(is_lo, 8.0 * s_eff, 0.0).astype(np.float32)
    else:
        m_adj = (rng.random((n, G), np.float32) * scale * 0.5).astype(np.float32)
    return w4_from_parts(packed, s_eff, m_adj, (n, k), precise=precise, sym=sym)


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


from functools import lru_cache


@lru_cache(maxsize=None)
def _w4_gen(n: int, k: int, scale: float, precise: bool, sym: bool = False,
            compact: bool = False):
    import jax

    from llama_kotlin_tpu.quant.fold import (ALIGN_W4, GROUP, compact_planes,
                                             _plane_group_perm)
    from llama_kotlin_tpu.quant.qtensor import SPAN

    k_pad = (k + ALIGN_W4 - 1) // ALIGN_W4 * ALIGN_W4  # kernel chunk align
    G = k_pad // GROUP
    perm_lo = _plane_group_perm(G, hi=False)
    perm_hi = _plane_group_perm(G, hi=True)
    sdt = jnp.float32 if (precise or compact) else jnp.bfloat16

    @jax.jit
    def gen(key):
        kp, ks, km, kd, ke = jax.random.split(key, 5)
        packed = jax.random.bits(kp, (n, k_pad // 2), jnp.uint8)
        if compact:
            # wire-factorized aux (quant/fold.py compact layout): 6-bit
            # scale/min codes under per-superblock f32 d/dmin
            S = k_pad // SPAN
            rep = SPAN // GROUP
            sc6 = jax.random.randint(ks, (n, G), 0, 64, jnp.int8)
            m6 = jax.random.randint(km, (n, G), 0, 64, jnp.int8)
            d_sb = (jax.random.uniform(kd, (n, S), jnp.float32)
                    * (scale / 500.0)).astype(jnp.float16).astype(jnp.float32)
            dmin_sb = (jax.random.uniform(ke, (n, S), jnp.float32)
                       * (scale / 500.0)).astype(jnp.float16).astype(jnp.float32)
            s_eff = sc6.astype(jnp.float32) * jnp.repeat(d_sb, rep, axis=1)
            m_eff = m6.astype(jnp.float32) * jnp.repeat(dmin_sb, rep, axis=1)
            is_lo = (jnp.arange(G) % 8) < 4
            m_adj = jnp.where(is_lo, m_eff, m_eff - 8.0 * s_eff)
            parts = compact_planes(sc6, m6, d_sb, dmin_sb, xp=jnp)
            return packed, s_eff, m_adj, parts["q6_t"], parts["dd_t"]
        s_eff = jax.random.uniform(ks, (n, G), jnp.float32) * (scale / 8.0)
        if sym:  # Q4_0 profile: lo-nibble bias only, derivable from scw_lo
            is_lo = (jnp.arange(G) % 8) < 4
            m_adj = jnp.where(is_lo, 8.0 * s_eff, 0.0)
        else:
            m_adj = jax.random.uniform(km, (n, G), jnp.float32) * (scale * 0.5)
        s_st = s_eff.astype(sdt)
        sT = s_st.astype(jnp.float32).T  # [G, n]
        scw_lo = sT[perm_lo].astype(sdt)
        scw_hi = (sT[perm_hi] / 16.0).astype(sdt)
        m_st = m_adj.astype(sdt)
        madj_t = m_st.astype(jnp.float32).T.astype(sdt)  # [G, n] in-kernel min plane
        return packed, s_st, m_st, scw_lo, scw_hi, madj_t

    return gen


def synthetic_w4_device(key, n: int, k: int, scale: float = 0.02,
                        precise: bool = False, sym: bool = False):
    """Device-side synthetic_w4: identical layout, but the codes/scales are
    generated ON the accelerator (jax.random under jit) instead of being
    built in numpy and pushed through the host link.  Through the axon
    tunnel (~6 MB/s h2d, measured round 3) a host-built 8B model costs
    ~13 min of transfer; device-side it's seconds."""
    import os as _os

    from llama_kotlin_tpu.quant.fold import GROUP
    from llama_kotlin_tpu.quant.formats import GGMLQuantType as _QT
    from llama_kotlin_tpu.quant.qtensor import QTensor

    from llama_kotlin_tpu.quant.fold import ALIGN_W4 as _AL

    compact = (not precise and not sym
               and _os.environ.get("LKTPU_W4_COMPACT", "1") == "1"
               # fold.py layout guard: compact needs a >=1024-col chunk plan
               and (((k + _AL - 1) // _AL * _AL) // 2) % 1024 == 0)
    if compact:
        packed, s_eff, m_adj, q6_t, dd_t = _w4_gen(
            n, k, scale, precise, sym, True)(key)
        qt = QTensor(
            codes=packed, g_scale=s_eff, g_min=m_adj,
            sb_scale=None, sb_min=None,
            qtype=_QT.Q4_K, bits=4, group_size=GROUP, code_offset=0,
            shape=(n, k), hi_signed=True,
            aux={"q6_t": q6_t, "dd_t": dd_t},
        )
    else:
        packed, s_st, m_adj, scw_lo, scw_hi, madj_t = _w4_gen(
            n, k, scale, precise, sym)(key)
        qt = QTensor(
            codes=packed, g_scale=s_st, g_min=m_adj, sb_scale=None,
            sb_min=None,
            qtype=_QT.Q4_K, bits=4, group_size=GROUP, code_offset=0,
            shape=(n, k), hi_signed=True,
            aux={"scw_lo": scw_lo, "scw_hi": scw_hi,
                 **({"sym": jnp.ones((), jnp.bool_)} if sym
                    else {"madj_t": madj_t}),
                 **({"precise": jnp.ones((), jnp.bool_)} if precise else {})},
        )
    if not precise and _os.environ.get("LKTPU_DUAL_FOLD") == "1":
        from llama_kotlin_tpu.quant.fold import attach_q8_device

        qt = attach_q8_device(qt)  # high-batch Q8F shadow (ops/qmatmul)
    return qt


@lru_cache(maxsize=None)
def _q8flat_gen(n: int, k_pad: int, scale: float):
    import jax

    from llama_kotlin_tpu.quant.qtensor import SPAN

    @jax.jit
    def gen(key):
        kc, ks = jax.random.split(key)
        codes = jax.random.randint(kc, (n, k_pad), -127, 128, jnp.int8)
        scales = (jax.random.uniform(ks, (n, k_pad // SPAN), jnp.float32)
                  * (scale / 127.0))
        return codes, scales

    return gen


def synthetic_q8flat_device(key, n: int, k: int, scale: float = 0.02):
    """Device-side synthetic_q8flat (W8A8 Q8F layout)."""
    from llama_kotlin_tpu.quant.formats import GGMLQuantType as _QT
    from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN

    k_pad = (k + SPAN - 1) // SPAN * SPAN
    codes, scales = _q8flat_gen(n, k_pad, scale)(key)
    return QTensor(codes=codes, g_scale=scales, g_min=None, sb_scale=None,
                   sb_min=None, qtype=_QT.Q8_0, bits=8,
                   group_size=SPAN, code_offset=0, shape=(n, k))


@lru_cache(maxsize=None)
def _qtensor_gen(n: int, k: int, qtype: GGMLQuantType, scale: float):
    import jax

    from llama_kotlin_tpu.quant import repack as R
    from llama_kotlin_tpu.quant.qtensor import SPAN

    probe = R.repack_float(np.zeros((1, SPAN), np.float32), qtype)
    k_pad = (k + SPAN - 1) // SPAN * SPAN
    g = probe.group_size
    cols = k_pad // SPAN * probe.codes.shape[1]

    def rint(key, shp, lo, hi, dtype):
        return jax.random.randint(key, shp, lo, hi, jnp.int32).astype(dtype)

    @jax.jit
    def gen(key):
        ks = list(jax.random.split(key, 6))
        if probe.codes.dtype == np.int8:
            codes = rint(ks[0], (n, cols), -32, 32, jnp.int8)
        elif probe.bits == 8:
            codes = rint(ks[0], (n, cols), 0, 32, jnp.uint8)
        else:
            codes = jax.random.bits(ks[0], (n, cols), jnp.uint8)
        if np.issubdtype(probe.g_scale.dtype, np.floating):
            g_scale = (jax.random.uniform(ks[1], (n, k_pad // g), jnp.float32)
                       * scale).astype(probe.g_scale.dtype)
        else:
            g_scale = rint(ks[1], (n, k_pad // g), 0, 64,
                           jnp.dtype(probe.g_scale.dtype))
        g_min = None
        if probe.g_min is not None:
            if np.issubdtype(probe.g_min.dtype, np.floating):
                g_min = (jax.random.uniform(ks[2], (n, k_pad // g), jnp.float32)
                         * scale * 0.1).astype(probe.g_min.dtype)
            else:
                g_min = rint(ks[2], (n, k_pad // g), 0, 16,
                             jnp.dtype(probe.g_min.dtype))
        sb_scale = sb_min = None
        if probe.sb_scale is not None:
            sb_scale = (jax.random.uniform(ks[3], (n, k_pad // SPAN), jnp.float32)
                        * scale / 32).astype(probe.sb_scale.dtype)
        if probe.sb_min is not None:
            sb_min = (jax.random.uniform(ks[4], (n, k_pad // SPAN), jnp.float32)
                      * scale / 32).astype(probe.sb_min.dtype)
        return codes, g_scale, g_min, sb_scale, sb_min

    return gen, probe, g


def synthetic_qtensor_device(key, n: int, k: int, qtype: GGMLQuantType,
                             scale: float = 0.02):
    """Device-side synthetic_qtensor: same geometry probing on the host,
    random codes/scales generated on the accelerator."""
    from llama_kotlin_tpu.quant.qtensor import QTensor

    gen, probe, g = _qtensor_gen(n, k, qtype, scale)
    codes, g_scale, g_min, sb_scale, sb_min = gen(key)
    return QTensor(codes=codes, g_scale=g_scale, g_min=g_min, sb_scale=sb_scale,
                   sb_min=sb_min, qtype=qtype, bits=probe.bits, group_size=g,
                   code_offset=probe.code_offset, shape=(n, k))


def _rand_weight_device(key, n, k, qtype: Optional[GGMLQuantType], dtype,
                        fast_int8=False, fast_w4a8=False):
    import jax

    if qtype is None or not TYPE_TRAITS[qtype].is_quantized:
        return (jax.random.normal(key, (n, k), jnp.float32) * 0.02).astype(dtype)
    if fast_w4a8:
        return synthetic_w4_device(key, n, k, precise=(fast_w4a8 == "w4x"),
                                   sym=(qtype == GGMLQuantType.Q4_0))
    if fast_int8:
        return synthetic_q8flat_device(key, n, k)
    return synthetic_qtensor_device(key, n, k, qtype)


def synthetic_params_device(cfg: ModelConfig, qtype: Optional[GGMLQuantType] = None,
                            seed: int = 0, compute_dtype=jnp.bfloat16,
                            tie_output: bool = False, fast_int8: bool = False,
                            fast_w4a8: bool = False, fuse: bool = False) -> dict:
    """synthetic_params, but every large matmul weight is generated on the
    accelerator — no multi-GB host->device transfer.  Used by bench.py and
    the graft entry; the numpy builder stays for tests that need
    reproducible host-side weights."""
    import jax

    rng = np.random.default_rng(seed)  # small host arrays (norms) only
    root = jax.random.PRNGKey(seed)
    counter = [0]

    def next_key():
        counter[0] += 1
        return jax.random.fold_in(root, counter[0])

    E, F, V = cfg.n_embd, cfg.n_ff, cfg.vocab_size
    qdim = cfg.n_head * cfg.head_dim
    kvdim = cfg.n_head_kv * cfg.head_dim

    def norm_w():
        return jnp.asarray(1.0 + 0.01 * rng.standard_normal(E), jnp.float32)

    def w(n_, k_):
        return _rand_weight_device(next_key(), n_, k_, qtype, compute_dtype,
                                   fast_int8, fast_w4a8)

    params: dict = {
        "tok_embd": w(V, E),
        "output_norm": norm_w(),
        "rope_freqs": None,
    }
    if not tie_output:
        params["output"] = w(V, E)
    params["layers"] = []
    for _ in range(cfg.n_layer):
        lp = {"attn_norm": norm_w(), "ffn_norm": norm_w()}
        if fuse:
            # serving fold: q|k|v and gate|up as single fused projections
            # (models/llama.py slices the outputs; see concat_qtensors)
            lp["wqkv_fused"] = w(qdim + 2 * kvdim, E)
        else:
            lp["wq"] = w(qdim, E)
            lp["wk"] = w(kvdim, E)
            lp["wv"] = w(kvdim, E)
        lp["wo"] = w(E, qdim)
        params["layers"].append(lp)
        if cfg.n_expert > 0:
            # MoE presets go through the host builder (expert stacking
            # policy lives there); bench presets are dense
            raise NotImplementedError(
                "synthetic_params_device: use synthetic_params for MoE cfgs")
        if fuse:
            lp["ffn_gateup_fused"] = w(2 * F, E)
        else:
            lp["ffn_gate"] = w(F, E)
            lp["ffn_up"] = w(F, E)
        lp["ffn_down"] = w(E, F)
    return params


def _rand_weight(rng, n, k, qtype: Optional[GGMLQuantType], dtype, fast_int8=False,
                 fast_w4a8=False):
    import jax

    if qtype is None or not TYPE_TRAITS[qtype].is_quantized:
        x = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        return jax.device_put(jnp.asarray(x, dtype=dtype))
    if fast_w4a8:
        return jax.tree.map(jnp.asarray,
                            synthetic_w4(rng, n, k, precise=(fast_w4a8 == "w4x"),
                                         sym=(qtype == GGMLQuantType.Q4_0)))
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
