"""Quantization core tests.

Three layers of validation (mirroring the reference's test strategy:
test-quantize-fns.cpp RMSE gates + GGMLQuantizationAccuracyTest MSE gates):

1. wire-format decode parity — our numpy decoder must be bit-exact vs the
   compiled reference oracle for buffers the oracle encoded;
2. our encoder's output must decode identically under our decoder and the
   oracle decoder (layout round-trip through foreign decoder);
3. round-trip accuracy gates per type (MSE / max-abs-diff budgets).
"""

from __future__ import annotations

import numpy as np
import pytest

from llama_kotlin_tpu.quant import formats
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS
from llama_kotlin_tpu.quant import numpy_ref as Q

from tests.ggml_oracle import get_oracle, oracle_dequantize, oracle_quantize

# types with both encode+decode in numpy_ref
CODEC_TYPES = [
    "q4_0", "q4_1", "q5_0", "q5_1", "q8_0",
    "q2_K", "q3_K", "q4_K", "q5_K", "q6_K", "q8_K",
]

# round-trip error budgets: (mse_limit, mad_limit) on N(0,1) data.
# Gates follow the reference's accuracy tests (Q8_0 MSE<0.05 at
# GGMLQuantizationAccuracyTest.kt:248, Q2_K MSE<0.1 at
# GGMLKQuantAccuracyTest.kt:153); tighter where our encoder easily allows.
RT_BUDGET = {
    "q4_0": (0.02, 0.4),
    "q4_1": (0.02, 0.4),
    "q5_0": (0.005, 0.2),
    "q5_1": (0.005, 0.2),
    "q8_0": (5e-5, 0.05),
    "q2_K": (0.1, 1.5),
    "q3_K": (0.03, 0.8),
    "q4_K": (0.01, 0.4),
    "q5_K": (0.003, 0.2),
    "q6_K": (0.001, 0.1),
    "q8_K": (5e-5, 0.05),
}


def _data(rng, n=4096):
    return rng.standard_normal(n).astype(np.float32)


@pytest.mark.parametrize("tname", CODEC_TYPES)
def test_roundtrip_accuracy(rng, tname):
    qt = formats.NAME_TO_TYPE[tname]
    x = _data(rng)
    y = Q.roundtrip(x, qt)
    mse = float(np.mean((x - y) ** 2))
    mad = float(np.max(np.abs(x - y)))
    mse_lim, mad_lim = RT_BUDGET[tname]
    assert mse < mse_lim, f"{tname}: MSE {mse} >= {mse_lim}"
    assert mad < mad_lim, f"{tname}: MAD {mad} >= {mad_lim}"


@pytest.mark.parametrize("tname", CODEC_TYPES)
def test_decode_parity_vs_reference(rng, tname):
    """Our decoder must match the reference decoder bit-for-bit on
    reference-encoded data."""
    if get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    qt = formats.NAME_TO_TYPE[tname]
    x = _data(rng)
    wire = oracle_quantize(x, tname)
    assert wire.size == formats.row_byte_size(x.size, qt)
    ours = Q.dequantize(wire, qt)
    theirs = oracle_dequantize(wire, tname, x.size)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("tname", CODEC_TYPES)
def test_encode_layout_valid(rng, tname):
    """Data we encode must decode identically under the reference decoder
    (proves our wire layout is exactly the ggml layout)."""
    if get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    qt = formats.NAME_TO_TYPE[tname]
    x = _data(rng)
    wire = Q.quantize(x, qt)
    ours = Q.dequantize(wire, qt)
    theirs = oracle_dequantize(wire, tname, x.size)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("tname", ["q4_0", "q8_0", "q8_K"])
def test_encode_parity_simple_formats(rng, tname):
    """For the closed-form encoders our bytes should match the reference
    encoder exactly."""
    if get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    x = _data(rng)
    ours = Q.quantize(x, formats.NAME_TO_TYPE[tname])
    theirs = oracle_quantize(x, tname)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("tname", CODEC_TYPES)
def test_kquant_quality_not_worse_than_reference(rng, tname):
    """Our encoders may differ from ggml's search, but round-trip error must
    be within 1.3x of the reference encoder's error on the same data."""
    if get_oracle() is None:
        pytest.skip("reference oracle unavailable")
    qt = formats.NAME_TO_TYPE[tname]
    x = _data(rng, 16384)
    ref_rt = oracle_dequantize(oracle_quantize(x, tname), tname, x.size)
    our_rt = Q.roundtrip(x, qt)
    ref_mse = float(np.mean((x - ref_rt) ** 2)) + 1e-12
    our_mse = float(np.mean((x - our_rt) ** 2)) + 1e-12
    assert our_mse <= ref_mse * 1.3, f"{tname}: ours {our_mse} vs ref {ref_mse}"


def test_f16_bf16_roundtrip(rng):
    x = _data(rng, 1024)
    np.testing.assert_allclose(Q.roundtrip(x, GGMLQuantType.F16), x, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(Q.roundtrip(x, GGMLQuantType.BF16), x, atol=2e-2, rtol=8e-3)
    np.testing.assert_array_equal(Q.roundtrip(x, GGMLQuantType.F32), x)


def test_block_sizes_match_reference_struct_sizes():
    expect = {
        "q4_0": 18, "q4_1": 20, "q5_0": 22, "q5_1": 24, "q8_0": 34, "q8_1": 36,
        "q2_K": 84, "q3_K": 110, "q4_K": 144, "q5_K": 176, "q6_K": 210, "q8_K": 292,
    }
    for name, size in expect.items():
        assert TYPE_TRAITS[formats.NAME_TO_TYPE[name]].type_size == size


def test_scale_min_k4_pack_unpack_roundtrip(rng):
    sc = rng.integers(0, 64, (7, 8))
    mn = rng.integers(0, 64, (7, 8))
    packed = Q.pack_scale_min_k4(sc, mn)
    sc2, mn2 = Q.unpack_scale_min_k4(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


def test_q3k_scales_pack_unpack_roundtrip(rng):
    sc = rng.integers(-32, 32, (5, 16))
    np.testing.assert_array_equal(Q.unpack_q3k_scales(Q.pack_q3k_scales(sc)), sc)
