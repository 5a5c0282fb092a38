"""Fused W4 FFN megakernel parity (ops/pallas/qmm_w4_ffn.py).

The fused gate|up|down kernel must reproduce the two-launch path
(qmm_w4_matmul on gate|up, bf16 round, qmm_w4_matmul on down) bit-for-bit:
same in-kernel Q8 quantization formula, same scale/min algebra, same f32
accumulation order per chunk.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_kotlin_tpu.models.synthetic import synthetic_w4
from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_matmul
from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import qmm_w4_ffn_matmul
from llama_kotlin_tpu.ops.activations import ACTIVATIONS

E, F = 2048, 4096


def _fold_pair(rng, sym):
    gu = jax.tree.map(jnp.asarray, synthetic_w4(rng, 2 * F, E, sym=sym))
    dn = jax.tree.map(jnp.asarray, synthetic_w4(rng, E, F, sym=sym))
    return gu, dn


def _ref_two_launch(x, gu, dn, act="silu"):
    y = qmm_w4_matmul(x, gu, interpret=True)
    gate, up = y[:, :F], y[:, F:]
    h = (ACTIVATIONS[act](gate) * up).astype(jnp.bfloat16)
    return qmm_w4_matmul(h, dn, interpret=True)


@pytest.mark.parametrize("sym", [False, True])
@pytest.mark.parametrize("b", [1, 3])
def test_ffn_fused_matches_two_launch(sym, b):
    rng = np.random.default_rng(0 if sym else 1)
    gu, dn = _fold_pair(rng, sym)
    x = jnp.asarray(rng.standard_normal((b, E)), jnp.float32)
    ref = _ref_two_launch(x, gu, dn)
    out = qmm_w4_ffn_matmul(x, gu, dn, act="silu", interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ffn_fused_gelu():
    rng = np.random.default_rng(2)
    gu, dn = _fold_pair(rng, False)
    x = jnp.asarray(rng.standard_normal((2, E)), jnp.float32)
    ref = _ref_two_launch(x, gu, dn, act="gelu")
    out = qmm_w4_ffn_matmul(x, gu, dn, act="gelu", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def _split_gu(gu):
    """Slice a fused [gate; up] W4 QTensor into separate gate/up tensors
    (the layout TP row-shards deliver; see qmm_w4_ffn_matmul up=)."""
    from dataclasses import replace

    def half(lo):
        sl = slice(0, F) if lo else slice(F, 2 * F)
        aux = {}
        for k, v in gu.aux.items():
            nd = getattr(v, "ndim", 0)
            if nd == 3:
                aux[k] = v[:, :, sl]
            elif nd == 2:
                aux[k] = v[:, sl]
            else:
                aux[k] = v
        return replace(
            gu, codes=gu.codes[sl], g_scale=gu.g_scale[sl],
            g_min=None if gu.g_min is None else gu.g_min[sl],
            shape=(F, E), aux=aux)

    return half(True), half(False)


@pytest.mark.parametrize("sym", [False, True])
def test_ffn_separate_gate_up_matches_fused(sym):
    """The separate-tensor layout (gate, up as two [F, E] QTensors — what
    TP shards look like) is bit-identical to the fused [2F, E] call."""
    rng = np.random.default_rng(4)
    gu, dn = _fold_pair(rng, sym)
    gate, up = _split_gu(gu)
    x = jnp.asarray(rng.standard_normal((2, E)), jnp.float32)
    ref = qmm_w4_ffn_matmul(x, gu, dn, act="silu", interpret=True)
    out = qmm_w4_ffn_matmul(x, gate, dn, up=up, act="silu", interpret=True)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ffn_fused_ineligible_shapes():
    rng = np.random.default_rng(3)
    # F=2816 pads to 3072 != gate/up rows -> megakernel declines
    gu = jax.tree.map(jnp.asarray, synthetic_w4(rng, 2 * 2816, E))
    dn = jax.tree.map(jnp.asarray, synthetic_w4(rng, E, 2816))
    x = jnp.asarray(rng.standard_normal((2, E)), jnp.float32)
    assert qmm_w4_ffn_matmul(x, gu, dn, interpret=True) is None


def test_fx2_matches_standard(monkeypatch):
    """qmm_w4_fx2 (all-prep-in-kernel, scratch-cached) matches the
    standard prep-outside path to f32 reduce-association tolerance (the
    NG-fold sum runs over a different axis), sym and asym."""
    from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_matmul

    rng = np.random.default_rng(5)
    for sym in (False, True):
        for n, k in ((1024, 2048), (512, 4096)):
            # compact=False: the standard kernel needs the bf16 scw planes
            # (compact parity is covered by tests/test_w4.py::test_w4_compact_*)
            w = jax.tree.map(jnp.asarray,
                             synthetic_w4(rng, n, k, sym=sym, compact=False))
            for b in (1, 2, 5):
                x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
                monkeypatch.delenv("LKTPU_W4_FX", raising=False)
                ref = qmm_w4_matmul(x, w, interpret=True)
                monkeypatch.setenv("LKTPU_W4_FX", "2")
                out = qmm_w4_matmul(x, w, interpret=True)
                monkeypatch.delenv("LKTPU_W4_FX", raising=False)
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                           rtol=2e-6, atol=2e-6)
