"""Native C++ repack vs numpy repack: bit-exact equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from llama_kotlin_tpu.native import get_native
from llama_kotlin_tpu.quant import numpy_ref as Q
from llama_kotlin_tpu.quant import repack as R
from llama_kotlin_tpu.quant.formats import NAME_TO_TYPE

NATIVE_TYPES = ["q8_0", "q4_0", "q4_K", "q6_K"]


@pytest.mark.parametrize("tname", NATIVE_TYPES)
@pytest.mark.parametrize("k", [512, 1280])
def test_native_matches_numpy(rng, tname, k):
    if get_native() is None:
        pytest.skip("native toolchain unavailable")
    qt = NAME_TO_TYPE[tname]
    n = 8
    x = rng.standard_normal((n, k)).astype(np.float32)
    wire = Q.quantize(x, qt)

    native = R._native_repack(wire, qt, n, k)
    assert native is not None, "native path refused a supported shape"
    ref = R.REPACKERS[qt](wire, n, k)

    np.testing.assert_array_equal(np.asarray(native.codes), np.asarray(ref.codes))
    np.testing.assert_array_equal(np.asarray(native.g_scale), np.asarray(ref.g_scale))
    for field in ("g_min", "sb_scale", "sb_min"):
        a, b = getattr(native, field), getattr(ref, field)
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (native.bits, native.group_size, native.code_offset) == \
        (ref.bits, ref.group_size, ref.code_offset)


def test_native_used_by_default(rng):
    if get_native() is None:
        pytest.skip("native toolchain unavailable")
    qt = NAME_TO_TYPE["q4_K"]
    x = rng.standard_normal((4, 512)).astype(np.float32)
    wire = Q.quantize(x, qt)
    out = R.repack(wire, qt, 4, 512)
    ref_f = Q.dequantize(wire, qt, shape=(4, 512))
    from llama_kotlin_tpu.quant.qtensor import dequantize

    np.testing.assert_array_equal(np.asarray(dequantize(out)), ref_f)


def test_native_spm_matches_python():
    """Native C++ SPM produces identical ids to the pure-python path on
    fuzzed inputs (same heap ordering / byte fallback)."""
    from llama_kotlin_tpu.native import get_native
    from llama_kotlin_tpu.tokenizer.spm import SPMTokenizer
    from tests.fixtures import spm_vocab_kvs
    from llama_kotlin_tpu.tokenizer.vocab import vocab_from_metadata

    if get_native() is None:
        pytest.skip("no native toolchain")
    md = spm_vocab_kvs(160)
    v = vocab_from_metadata({f"tokenizer.ggml.{k.split('.')[-1]}" if False else k: val
                             for k, val in md.items()})
    nat = SPMTokenizer(v, use_native=True)
    py = SPMTokenizer(v, use_native=False)
    assert nat._native is not None
    import random
    rng = random.Random(0)
    alphabet = "abcdefghij mnop.,!? xyz"
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        assert nat.encode(s) == py.encode(s), s
    # multibyte + byte-fallback path
    for s in ["héllo wörld", "日本語 text", "a\x00b", "  spaces  "]:
        assert nat.encode(s) == py.encode(s), s


def test_native_bpe_matches_python():
    """Native C++ BPE merge produces identical ids to pure python."""
    from llama_kotlin_tpu.native import get_native
    from llama_kotlin_tpu.tokenizer.bpe import BPETokenizer, bytes_to_unicode
    from llama_kotlin_tpu.tokenizer.vocab import Vocab

    if get_native() is None:
        pytest.skip("no native toolchain")
    b2u = bytes_to_unicode()
    # small byte-level vocab: all mapped bytes + some merges
    base = [b2u[b] for b in range(256)]
    merges = ["h e", "l l", "he ll", "hell o", "w o", "wo r", "wor l",
              "worl d", "Ġ w", "Ġ h"]
    extra = [m.replace(" ", "") for m in merges]
    tokens = base + extra
    v = Vocab(model="gpt2", tokens=tokens, merges=merges, bos_id=-1, eos_id=-1,
              add_bos=False)
    nat = BPETokenizer(v, use_native=True)
    py = BPETokenizer(v, use_native=False)
    assert nat._native is not None
    import random
    rng = random.Random(1)
    for _ in range(200):
        s = "".join(rng.choice("helo wrd xyz.!?") for _ in range(rng.randrange(0, 40)))
        assert nat.encode(s, add_special=False) == py.encode(s, add_special=False), s
    for s in ["hello world", "héllo wörld", "日本語", "  hh  "]:
        assert nat.encode(s, add_special=False) == py.encode(s, add_special=False), s


@pytest.mark.parametrize("tname", ["q2_K", "q3_K", "q4_K", "q5_K", "q6_K"])
def test_native_kquant_encoder_matches_numpy_quality(rng, tname):
    """The C++ K-quant encoder (native/kquant_encode.cpp) implements the
    same weighted scale search as the numpy encoders: decoded output must
    match numpy's round-trip error to within float-ordering noise, and
    the wire bytes must decode through the standard decoder."""
    import os

    lib = get_native()
    if lib is None or not hasattr(lib, "lk_encode_kquant"):
        pytest.skip("native toolchain unavailable")
    qt = NAME_TO_TYPE[tname]
    x = (rng.standard_normal((64, 512)) * 0.07).astype(np.float32)

    wire_native = Q._native_kquant(x, qt)
    assert wire_native is not None

    os.environ["LKTPU_NO_NATIVE"] = "1"
    try:
        import llama_kotlin_tpu.native as N

        N._lib, N._tried = None, False
        wire_numpy = Q.quantize(x, qt)
    finally:
        del os.environ["LKTPU_NO_NATIVE"]
        N._lib, N._tried = None, False

    dn = Q.dequantize(wire_native, qt, shape=x.shape)
    dp = Q.dequantize(wire_numpy, qt, shape=x.shape)
    mse_n = float(np.mean((x - dn) ** 2))
    mse_p = float(np.mean((x - dp) ** 2))
    assert mse_n <= mse_p * 1.05, (mse_n, mse_p)
    # sanity: same scale structure class (f16 supers decode finite)
    assert np.isfinite(dn).all()


@pytest.mark.parametrize("tname", ["iq4_nl", "iq4_xs"])
def test_native_iq4_encoder_byte_identical(rng, tname):
    """The C++ IQ4 encoders are byte-identical to the numpy ones (the
    nearest-level search has a deterministic first-min tiebreak)."""
    import os

    lib = get_native()
    if lib is None or not hasattr(lib, "lk_encode_iq4"):
        pytest.skip("native toolchain unavailable")
    qt = NAME_TO_TYPE[tname]
    x = (rng.standard_normal((32, 512)) * 0.07).astype(np.float32)
    wire_native = Q.quantize(x, qt)

    os.environ["LKTPU_NO_NATIVE"] = "1"
    try:
        import llama_kotlin_tpu.native as N

        N._lib, N._tried = None, False
        wire_numpy = Q.quantize(x, qt)
    finally:
        del os.environ["LKTPU_NO_NATIVE"]
        N._lib, N._tried = None, False
    np.testing.assert_array_equal(wire_native, wire_numpy)


def test_iq4_zero_blocks_roundtrip_to_zero(rng):
    """Zero blocks must encode d=0 and decode to zeros on BOTH the native
    and numpy paths (regression: numpy wrote d=1.0 for zero blocks,
    corrupting zero-padded rows)."""
    import os

    x = np.zeros((4, 256), np.float32)
    x[2, :32] = 0.1
    for tname in ("iq4_nl", "iq4_xs"):
        qt = NAME_TO_TYPE[tname]
        wire_native = Q.quantize(x, qt)
        os.environ["LKTPU_NO_NATIVE"] = "1"
        try:
            import llama_kotlin_tpu.native as N

            N._lib, N._tried = None, False
            wire_numpy = Q.quantize(x, qt)
        finally:
            del os.environ["LKTPU_NO_NATIVE"]
            N._lib, N._tried = None, False
        rt = Q.dequantize(wire_numpy, qt, shape=x.shape)
        assert not rt[0].any() and not rt[3].any()
        if get_native() is not None:
            np.testing.assert_array_equal(wire_native, wire_numpy)
