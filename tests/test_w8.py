"""W8 fast-mode tests: exact int8-resident fold + block-diagonal group-dot
kernel (ops/pallas/qmm_w8.py) against the dequantization reference.

Covers the formats the W4 fold can't take — q6_K (the reference Q4_K_M
lm_head, ggml_vec_dot_q6_K_q8_K), q3_K, q5_K (mins), q8_0, IQ4_NL — plus
q2_K via code unpacking.  Mirrors the reference's vec-dot test strategy
(test-quantize-fns.cpp) like tests/test_w4.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama_kotlin_tpu.ops.pallas.qmm_int8 import quantize_activations
from llama_kotlin_tpu.ops.pallas.qmm_w8 import (
    build_sxv_w8,
    build_xbd_w8,
    qmm_w8_matmul,
)
from llama_kotlin_tpu.quant.fold import fold_to_w8
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.quant.qtensor import dequantize
from llama_kotlin_tpu.quant.repack import repack, repack_float
from llama_kotlin_tpu.quant import numpy_ref

W8_FORMATS = [GGMLQuantType.Q6_K, GGMLQuantType.Q3_K, GGMLQuantType.Q5_K,
              GGMLQuantType.Q8_0, GGMLQuantType.Q5_0, GGMLQuantType.IQ4_NL,
              GGMLQuantType.Q2_K]


def _quantized_qtensor(rng, n, k, qtype):
    x = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    data = numpy_ref.quantize(x, qtype)
    return repack(np.frombuffer(data, np.uint8), qtype, n, k)


@pytest.mark.parametrize("qtype", W8_FORMATS)
def test_fold_to_w8_dequant_bitexact(rng, qtype):
    """The W8 fold is EXACT: f32 effective scales hold the folded f16*int
    products without rounding, so dequantization matches the standard
    repack bit-for-bit."""
    qt = _quantized_qtensor(rng, 8, 512, qtype)
    w8 = fold_to_w8(qt)
    assert w8.bits == 8 and w8.aux is not None and "scw" in w8.aux
    assert w8.code_offset == 0 and w8.codes.dtype == np.int8
    ref = np.asarray(dequantize(qt, jnp.float32))
    got = np.asarray(dequantize(w8, jnp.float32))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("gs", [16, 32])
def test_xbd_w8_layout(rng, gs):
    """Row r*b+i of the block-diagonal array carries x8[i] on exactly the
    element columns whose group ((c//gs) mod NG) == r."""
    b, k_pad = 4, 1024
    ng = 512 // gs
    x8 = rng.integers(-127, 128, (b, k_pad), dtype=np.int8)
    xbd = np.asarray(build_xbd_w8(jnp.asarray(x8), gs))
    assert xbd.shape == (ng * b, k_pad)
    for c in range(0, k_pad, gs):
        r = (c // gs) % ng
        for i in range(b):
            np.testing.assert_array_equal(xbd[r * b + i, c:c + gs],
                                          x8[i, c:c + gs])
        dead = [rr for rr in range(ng) if rr != r]
        assert all(not xbd[rr * b:(rr + 1) * b, c:c + gs].any() for rr in dead)


@pytest.mark.parametrize("gs", [16, 32])
def test_sxv_w8_layout(rng, gs):
    """sxv[t, r*b+i] must be the superblock scale of the group that row
    block r covers in chunk t."""
    b, k_pad = 4, 2048
    ng = 512 // gs
    sx = rng.standard_normal((b, k_pad // 256)).astype(np.float32)
    sxv = np.asarray(build_sxv_w8(jnp.asarray(sx), k_pad, gs))
    assert sxv.shape == (k_pad // 512, ng * b)
    for t in range(k_pad // 512):
        for r in range(ng):
            g = ng * t + r           # global group covered by this row block
            sb = (g * gs) // 256
            for i in range(b):
                assert sxv[t, r * b + i] == sx[i, sb]


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q6_K, GGMLQuantType.Q5_K,
                                   GGMLQuantType.Q8_0])
@pytest.mark.parametrize("shape", [(128, 1024), (256, 2048),
                                   # chunk-UNALIGNED k: fold pads to
                                   # ALIGN_W8 with zero scales
                                   (128, 2816)])
def test_qmm_w8_kernel_matches_reference(rng, qtype, shape):
    """Kernel (interpret mode) vs dequantized matmul on the SAME quantized
    activations — agreement to f32 accumulation order.  Q5_K exercises the
    external min term, q6_K the gs=16 path, q8_0 the min-free gs=32 path."""
    n, k = shape
    b = 3
    w8 = fold_to_w8(_quantized_qtensor(rng, n, k, qtype))
    x = (rng.standard_normal((b, k)) * 0.7).astype(np.float32)

    got = qmm_w8_matmul(jnp.asarray(x), jax.tree.map(jnp.asarray, w8),
                        interpret=True)
    assert got is not None and got.shape == (b, n)

    bp = 8
    x2 = np.pad(x, ((0, bp - b), (0, 0)))
    x8, sx = (np.asarray(a) for a in quantize_activations(jnp.asarray(x2)))
    x_hat = (x8.astype(np.float32).reshape(bp, -1, 256)
             * np.asarray(sx)[..., None]).reshape(bp, k)
    ref = x_hat @ np.asarray(dequantize(w8, jnp.float32)).T
    np.testing.assert_allclose(np.asarray(got), ref[:b], rtol=2e-4, atol=2e-4)


def test_w8_precise_tighter_than_bf16(rng):
    """W8 precise mode (dual-plane activations on exact int8 weights) must
    beat the bf16 dequant path end-to-end — the basis for serving q6_K
    through it in w4x fidelity mode."""
    n, k = 256, 2048
    qt = _quantized_qtensor(rng, n, k, GGMLQuantType.Q6_K)
    w8x = fold_to_w8(qt, precise=True)
    assert "precise" in w8x.aux
    x = rng.standard_normal((3, k)).astype(np.float32)

    wdq = np.asarray(dequantize(qt, jnp.float32))
    ref = x @ wdq.T
    got = np.asarray(qmm_w8_matmul(jnp.asarray(x),
                                   jax.tree.map(jnp.asarray, w8x),
                                   interpret=True))
    bf = np.asarray(jnp.dot(jnp.asarray(x, jnp.bfloat16),
                            jnp.asarray(wdq, jnp.bfloat16).T,
                            preferred_element_type=jnp.float32))
    e_w8x = np.abs(got - ref).mean()
    e_bf16 = np.abs(bf - ref).mean()
    assert e_w8x < e_bf16 * 0.25, (e_w8x, e_bf16)


def test_loader_w4_mode_routes_q6k_to_w8(rng, tmp_path):
    """A q6_K tensor loaded in w4/w4x serving mode must come back as a W8
    QTensor (exact), not the lossy Q8F flattening."""
    from llama_kotlin_tpu.models.loader import _repack_w4

    n, k = 16, 512
    x = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    data = np.frombuffer(numpy_ref.quantize(x, GGMLQuantType.Q6_K), np.uint8)
    for mode in ("w4", "w4x"):
        rp = _repack_w4(data, GGMLQuantType.Q6_K, n, k, mode)
        assert rp.aux is not None and "scw" in rp.aux, mode
        assert ("precise" in rp.aux) == (mode == "w4x")
        ref = np.asarray(dequantize(
            repack(data, GGMLQuantType.Q6_K, n, k), jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(dequantize(rp, jnp.float32)), ref)
