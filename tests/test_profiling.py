"""Tracing/profiling aux subsystem (SURVEY §5): device_trace captures
xplane protobufs, annotate() names model stages in the HLO."""

import glob

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.utils.profiling import annotate, device_trace, maybe_trace


def test_device_trace_writes_xplanes(tmp_path):
    d = str(tmp_path / "trace")
    with device_trace(d):
        x = jax.jit(lambda a: a @ a.T)(jnp.ones((64, 64), jnp.float32))
        jax.block_until_ready(x)
    pbs = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    assert pbs, f"no xplane files under {d}"


def test_maybe_trace_noop():
    with maybe_trace(None):
        pass  # no trace session started


def test_annotate_names_reach_hlo():
    """named_scope names must survive into the lowered HLO text so device
    traces attribute kernels to model stages (attn/ffn/lm_head)."""

    def fn(x):
        with annotate("mystage"):
            return x * 2 + 1

    txt = jax.jit(fn).lower(jnp.ones((8, 8))).as_text(debug_info=True)
    assert "mystage" in txt


def test_forward_carries_stage_scopes():
    """The model forward's jaxpr names include the stage scopes."""
    from llama_kotlin_tpu.models.config import ModelConfig
    from llama_kotlin_tpu.models.synthetic import synthetic_params
    from llama_kotlin_tpu.models import llama as llama_model
    from llama_kotlin_tpu.runtime.kv_cache import KVCache

    cfg = ModelConfig(arch="llama", vocab_size=64, n_embd=32, n_layer=1,
                      n_head=2, n_head_kv=2, n_ff=64, n_ctx_train=32)
    params = synthetic_params(cfg, None, compute_dtype=jnp.float32)
    cache = KVCache.create(1, 16, 2, 16, dtype=jnp.float32)
    nt = 4
    args = (params, cfg, jnp.zeros(nt, jnp.int32),
            jnp.arange(nt, dtype=jnp.int32), jnp.zeros(nt, jnp.int32),
            jnp.arange(nt, dtype=jnp.int32), cache,
            jnp.concatenate([jnp.arange(nt, dtype=jnp.int32),
                             jnp.full(12, -1, jnp.int32)]),
            jnp.concatenate([jnp.ones(nt, jnp.int32), jnp.zeros(12, jnp.int32)]),
            jnp.array([nt - 1], jnp.int32))

    def fn(*a):
        return llama_model.forward(*a, compute_dtype=jnp.float32)[0]

    txt = jax.jit(fn, static_argnums=(1,)).lower(*args).as_text(debug_info=True)
    for scope in ("qkv", "attn", "ffn", "lm_head", "embed"):
        assert scope in txt, f"missing named scope {scope}"
