"""IQ2/IQ3 ENCODER tests (quant/iq_encode.py).

The encoders are original vectorized grid-search implementations; the
wire bytes they emit must (a) decode identically under our bit-exact
decoder and the compiled reference oracle (wire validity), (b) land in
the reference's quality class per bitrate, (c) improve on the weighted
metric when an imatrix is supplied.  Reference encoder entry points:
ggml/src/ggml-quants.c quantize_iq2_xxs/iq2_xs/iq3_xxs/iq3_s.
"""

from __future__ import annotations

import numpy as np
import pytest

from llama_kotlin_tpu.quant import numpy_ref
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS
from llama_kotlin_tpu.quant.iq_encode import IQ_ENCODERS

from tests.ggml_oracle import get_oracle, oracle_dequantize

IQ_TYPES = [GGMLQuantType.IQ2_XXS, GGMLQuantType.IQ2_XS,
            GGMLQuantType.IQ3_XXS, GGMLQuantType.IQ3_S]

# expected weighted-rms quality class per type (information-theoretic
# scale for ~2.06/2.31/3.06/3.44 bits/weight on gaussian data)
REL_ERR_CEIL = {
    GGMLQuantType.IQ2_XXS: 0.42,
    GGMLQuantType.IQ2_XS: 0.38,
    GGMLQuantType.IQ3_XXS: 0.22,
    GGMLQuantType.IQ3_S: 0.20,
}


def _rand_rows(rng, n=8, k=512):
    # heavy-tailed-ish mix resembling real weight rows
    x = rng.standard_normal((n, k)).astype(np.float32)
    x *= (0.5 + rng.random((n, 1), dtype=np.float32))
    x[:, ::37] *= 3.0  # outliers
    return x


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("qtype", IQ_TYPES)
def test_iq_encode_wire_valid_and_quality(rng, qtype):
    """Encoded wire decodes identically via our decoder and the oracle,
    and weighted relative error is in the reference class for the rate."""
    x = _rand_rows(rng)
    wire = IQ_ENCODERS[qtype](x)
    assert wire.dtype == np.uint8
    assert wire.shape == (x.shape[0],
                          x.shape[1] // 256 * TYPE_TRAITS[qtype].type_size)
    flat = np.ascontiguousarray(wire).reshape(-1)
    ours = numpy_ref.dequantize(flat, qtype, shape=x.shape)
    if get_oracle() is not None:
        theirs = oracle_dequantize(flat, TYPE_TRAITS[qtype].name,
                                   x.size).reshape(x.shape)
        np.testing.assert_array_equal(ours, theirs)
    rel = np.sqrt(np.mean((ours - x) ** 2) / np.mean(x * x))
    assert rel < REL_ERR_CEIL[qtype], f"{qtype}: rel err {rel:.3f}"


def test_iq_encode_quality_ordering(rng):
    """More bits -> lower error on the same data (the ladder's premise)."""
    x = _rand_rows(rng, n=16)
    errs = {}
    for qtype in IQ_TYPES:
        wire = IQ_ENCODERS[qtype](x).reshape(-1)
        ours = numpy_ref.dequantize(wire, qtype, shape=x.shape)
        errs[qtype] = float(np.mean((ours - x) ** 2))
    assert errs[GGMLQuantType.IQ3_XXS] < errs[GGMLQuantType.IQ2_XS]
    assert errs[GGMLQuantType.IQ3_S] < errs[GGMLQuantType.IQ3_XXS]
    assert errs[GGMLQuantType.IQ2_XS] <= errs[GGMLQuantType.IQ2_XXS] * 1.05


@pytest.mark.parametrize("qtype", [GGMLQuantType.IQ2_XXS,
                                   GGMLQuantType.IQ3_XXS])
def test_iq_encode_imatrix_improves_weighted_error(rng, qtype):
    """With a strongly non-uniform importance row, the imatrix-weighted
    encode must beat the unweighted encode ON THE WEIGHTED METRIC (the
    whole point of imatrix quantization, cf. reference
    examples/imatrix/README.md)."""
    x = _rand_rows(rng, n=8, k=1024)
    # importance must vary WITHIN units/scale-groups to steer the fit
    # (uniform-per-group weights cancel in every weighted argmin)
    qw = np.ones(x.shape[1], np.float32)
    qw[np.arange(x.shape[1]) % 3 == 0] = 100.0
    w_plain = IQ_ENCODERS[qtype](x).reshape(-1)
    w_mat = IQ_ENCODERS[qtype](x, qw=np.broadcast_to(qw, x.shape)).reshape(-1)
    d_plain = numpy_ref.dequantize(w_plain, qtype, shape=x.shape)
    d_mat = numpy_ref.dequantize(w_mat, qtype, shape=x.shape)
    werr_plain = float(np.mean(qw * (d_plain - x) ** 2))
    werr_mat = float(np.mean(qw * (d_mat - x) ** 2))
    assert werr_mat < werr_plain


def test_iq_encode_via_quantize_entry(rng):
    """numpy_ref.quantize dispatches to the IQ encoders (tools/quantize.py
    path) and roundtrips through the public dequantize."""
    x = _rand_rows(rng, n=2)
    wire = numpy_ref.quantize(x, GGMLQuantType.IQ3_S)
    out = numpy_ref.dequantize(wire, GGMLQuantType.IQ3_S, shape=x.shape)
    rel = np.sqrt(np.mean((out - x) ** 2) / np.mean(x * x))
    assert rel < 0.25
