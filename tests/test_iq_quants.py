"""IQ-quant decode parity vs the compiled reference oracle.

Strategy: generate structurally-valid random wire blocks (random index/
sign/scale bits, sane f16 super-scales), then both decoders must agree
bit-for-bit — covers every grid lookup path without needing the
imatrix-dependent encoders."""

from __future__ import annotations

import numpy as np
import pytest

from llama_kotlin_tpu.quant import numpy_ref
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS

from tests.ggml_oracle import get_oracle, oracle_dequantize

IQ_TYPES = [
    GGMLQuantType.IQ2_XXS,
    GGMLQuantType.IQ2_XS,
    GGMLQuantType.IQ2_S,
    GGMLQuantType.IQ3_XXS,
    GGMLQuantType.IQ3_S,
    GGMLQuantType.IQ1_S,
    GGMLQuantType.IQ1_M,
    GGMLQuantType.IQ4_NL,
    GGMLQuantType.IQ4_XS,
]

ONE_F16 = np.frombuffer(np.float16(1.5).tobytes(), np.uint8)


def _random_blocks(qtype: GGMLQuantType, n_blocks: int, rng) -> np.ndarray:
    ts = TYPE_TRAITS[qtype].type_size
    b = rng.integers(0, 256, (n_blocks, ts)).astype(np.uint8)
    if qtype == GGMLQuantType.IQ1_M:
        # super-scale f16 is assembled from the top nibbles of the 4 scale
        # words — pin them to 0x3E00 (1.5) to avoid inf/nan
        sc = b[:, 48:56].copy().view("<u2").reshape(-1, 4)
        sc[:, 0] = (sc[:, 0] & 0x0FFF)  # bits 0-3  of d = 0x0
        sc[:, 1] = (sc[:, 1] & 0x0FFF)  # bits 4-7  = 0x0
        sc[:, 2] = (sc[:, 2] & 0x0FFF) | 0xE000  # bits 8-11 = 0xE
        sc[:, 3] = (sc[:, 3] & 0x0FFF) | 0x3000  # bits 12-15 = 0x3
        b[:, 48:56] = sc.view(np.uint8).reshape(-1, 8)
    else:
        b[:, 0:2] = ONE_F16  # d
    return b


@pytest.mark.parametrize("qtype", IQ_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_iq_dequant_matches_oracle(qtype):
    if get_oracle() is None:
        pytest.skip("oracle lib unavailable")
    rng = np.random.default_rng(int(qtype))
    blocks = _random_blocks(qtype, 64, rng)
    data = blocks.reshape(-1)
    n = 64 * TYPE_TRAITS[qtype].block_size
    ours = numpy_ref.dequantize(data, qtype)
    theirs = oracle_dequantize(data, TYPE_TRAITS[qtype].name, n)
    assert ours.shape == theirs.shape
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("qtype", [GGMLQuantType.IQ4_NL, GGMLQuantType.IQ4_XS,
                                   GGMLQuantType.IQ3_XXS, GGMLQuantType.IQ3_S,
                                   GGMLQuantType.IQ2_S, GGMLQuantType.IQ1_M])
def test_iq_decode_of_oracle_encoded(qtype):
    """Encode real float data with the reference quantizer (NULL imatrix is
    allowed for these types), then decode parity on realistic bit patterns."""
    from tests.ggml_oracle import oracle_quantize_nrow

    if get_oracle() is None:
        pytest.skip("oracle lib unavailable")
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(8 * 256) * 0.1).astype(np.float32)
    wire = oracle_quantize_nrow(x, TYPE_TRAITS[qtype].name, 256)
    ours = numpy_ref.dequantize(np.frombuffer(wire, np.uint8), qtype)
    theirs = oracle_dequantize(np.frombuffer(wire, np.uint8),
                               TYPE_TRAITS[qtype].name, len(x))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("qtype", IQ_TYPES, ids=lambda t: TYPE_TRAITS[t].name)
def test_iq_qtensor_repack_bitexact(qtype):
    """Exact IQ -> QTensor repack: jnp dequantize of the repacked tensor
    must equal the wire decoder bit-for-bit (all partial products carry
    <=24 significand bits, so f32 evaluation is exact in any order)."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.quant import qtensor
    from llama_kotlin_tpu.quant.repack import repack

    rng = np.random.default_rng(100 + int(qtype))
    bs = TYPE_TRAITS[qtype].block_size
    n, nb_per_row = 4, 2048 // bs
    k = nb_per_row * bs
    blocks = _random_blocks(qtype, n * nb_per_row, rng)
    data = blocks.reshape(-1)
    ref = numpy_ref.dequantize(data, qtype, shape=(n, k))
    qt = jax.tree.map(jnp.asarray, repack(data, qtype, n, k))
    assert qt.codes.dtype == jnp.int8
    out = np.asarray(qtensor.dequantize(qt))
    np.testing.assert_array_equal(out, ref.astype(np.float32))


@pytest.mark.parametrize("qtype", [GGMLQuantType.IQ4_NL, GGMLQuantType.IQ4_XS,
                                   GGMLQuantType.IQ3_XXS, GGMLQuantType.IQ3_S,
                                   GGMLQuantType.IQ2_S, GGMLQuantType.IQ1_M])
def test_iq_repack_bitexact_on_oracle_encoded(qtype):
    """Same parity on reference-encoder wire bits (realistic scale values,
    not the pinned d=1.5 of the random blocks)."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.quant import qtensor
    from llama_kotlin_tpu.quant.repack import repack
    from tests.ggml_oracle import oracle_quantize_nrow

    if get_oracle() is None:
        pytest.skip("oracle lib unavailable")
    rng = np.random.default_rng(11)
    n, k = 8, 512
    x = (rng.standard_normal(n * k) * 0.1).astype(np.float32)
    wire = np.frombuffer(oracle_quantize_nrow(x, TYPE_TRAITS[qtype].name, k), np.uint8)
    ref = numpy_ref.dequantize(wire, qtype, shape=(n, k))
    qt = jax.tree.map(jnp.asarray, repack(wire, qtype, n, k))
    out = np.asarray(qtensor.dequantize(qt))
    np.testing.assert_array_equal(out, ref.astype(np.float32))


def test_iq_qmm_parity():
    """IQ QTensors flow through the fused dequant-matmul kernel family."""
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.ops.qmatmul import qmatmul
    from llama_kotlin_tpu.quant import qtensor
    from llama_kotlin_tpu.quant.repack import repack

    rng = np.random.default_rng(12)
    qtype = GGMLQuantType.IQ4_XS
    n, k = 256, 512
    blocks = _random_blocks(qtype, n * (k // 256), rng)
    qt = jax.tree.map(jnp.asarray, repack(blocks.reshape(-1), qtype, n, k))
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    w = qtensor.dequantize(qt)
    want = x @ w.T
    got = qmatmul(x, qt, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_iq_model_load(tmp_path):
    """A GGUF with IQ4_NL weights loads through the exact QTensor repack
    (no dense fallback) and the Q8F fast mode accepts IQ wire formats."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.quant.qtensor import QTensor
    from llama_kotlin_tpu.quant.repack import repack_q8flat
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf

    rng = np.random.default_rng(4)
    dims = tiny_llama_dims(n_embd=64, n_ff=256, vocab=256)
    weights = random_llama_weights(dims, rng)
    path = tmp_path / "iq.gguf"
    write_llama_gguf(path, weights, dims, qtype=GGMLQuantType.IQ4_NL)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    assert isinstance(params["layers"][0]["ffn_up"], QTensor)  # exact repack, not dense
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    rc = ctx.decode(Batch.single(np.array([3, 5, 9], np.int32)))
    assert rc == 0
    assert np.isfinite(ctx.get_logits()).all()

    # Q8F fast-mode path over an IQ wire tensor
    w = weights["blk.0.ffn_up.weight"]
    wire = numpy_ref.quantize(w, GGMLQuantType.IQ4_NL)
    qt = repack_q8flat(wire, GGMLQuantType.IQ4_NL, *w.shape)
    assert qt.codes.dtype == np.int8
    # our encoder must be decodable by the ORACLE too (wire validity)
    if get_oracle() is not None:
        theirs = oracle_dequantize(wire, "iq4_nl", w.size)
        ours = numpy_ref.dequantize(wire, GGMLQuantType.IQ4_NL)
        np.testing.assert_array_equal(ours, theirs)
