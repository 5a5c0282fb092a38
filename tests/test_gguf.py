"""GGUF container tests: writer->reader round-trip, and (if available)
cross-validation against the reference gguf reader compiled as an oracle.

Fixture pattern follows the reference's TestGGUFGenerator (synthesized GGUF
byte streams, SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pytest

from llama_kotlin_tpu.gguf import GGUFFile, GGUFWriter
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.quant import numpy_ref as Q


def _write_sample(tmp_path, rng):
    w = GGUFWriter()
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.name", "test-model")
    w.add_kv("llama.block_count", np.uint32(2))
    w.add_kv("llama.embedding_length", np.uint32(64))
    w.add_kv("llama.attention.head_count", np.uint32(4))
    w.add_kv("llama.rope.freq_base", np.float32(10000.0))
    w.add_kv("tokenizer.ggml.tokens", ["<unk>", "<s>", "</s>", "hello", "world"])
    w.add_kv("tokenizer.ggml.scores", np.array([0.0, 0.0, 0.0, -1.0, -2.0], np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([2, 3, 3, 1, 1], np.int32))
    w.add_kv("flag", True)
    t0 = rng.standard_normal((8, 64)).astype(np.float32)
    t1 = rng.standard_normal((64, 256)).astype(np.float32)
    w.add_tensor("tok_embd.weight", t0, GGMLQuantType.F32)
    w.add_tensor("blk.0.ffn_up.weight", t1, GGMLQuantType.Q4_0)
    w.add_tensor("blk.0.ffn_down.weight", t1.T.copy(), GGMLQuantType.Q8_0)
    path = tmp_path / "sample.gguf"
    w.write(path)
    return path, t0, t1


def test_roundtrip(tmp_path, rng):
    path, t0, t1 = _write_sample(tmp_path, rng)
    with GGUFFile(path) as f:
        assert f.version == 3
        assert f.metadata["general.architecture"] == "llama"
        assert f.metadata["llama.block_count"] == 2
        assert f.metadata["flag"] is True
        assert list(f.metadata["tokenizer.ggml.tokens"]) == ["<unk>", "<s>", "</s>", "hello", "world"]
        np.testing.assert_allclose(
            np.asarray(f.metadata["tokenizer.ggml.scores"]), [0, 0, 0, -1, -2]
        )
        assert f.metadata["llama.rope.freq_base"] == pytest.approx(10000.0)

        assert set(f.tensors) == {"tok_embd.weight", "blk.0.ffn_up.weight", "blk.0.ffn_down.weight"}
        # ggml ne order = reversed numpy shape
        assert f.tensors["tok_embd.weight"].shape == (64, 8)
        np.testing.assert_array_equal(f.tensor_float("tok_embd.weight"), t0)
        # quantized tensor decodes to the round-tripped values
        np.testing.assert_array_equal(
            f.tensor_float("blk.0.ffn_up.weight"), Q.roundtrip(t1, GGMLQuantType.Q4_0)
        )
        np.testing.assert_array_equal(
            f.tensor_float("blk.0.ffn_down.weight"),
            Q.roundtrip(t1.T.copy(), GGMLQuantType.Q8_0),
        )


def test_alignment(tmp_path, rng):
    path, *_ = _write_sample(tmp_path, rng)
    with GGUFFile(path) as f:
        assert f.data_offset % f.alignment == 0
        for info in f.tensors.values():
            assert info.offset % f.alignment == 0


def test_reference_oracle_reads_our_gguf(tmp_path, rng):
    """The compiled reference gguf reader must parse files we write."""
    from tests.ggml_oracle import get_oracle
    import ctypes

    lib = get_oracle()
    if lib is None:
        pytest.skip("reference oracle unavailable")
    path, t0, t1 = _write_sample(tmp_path, rng)

    class InitParams(ctypes.Structure):
        _fields_ = [("no_alloc", ctypes.c_bool), ("ctx", ctypes.c_void_p)]

    lib.gguf_init_from_file.argtypes = [ctypes.c_char_p, InitParams]
    lib.gguf_init_from_file.restype = ctypes.c_void_p
    gctx = lib.gguf_init_from_file(str(path).encode(), InitParams(True, None))
    assert gctx, "reference reader rejected our GGUF"
    lib.gguf_get_n_tensors.argtypes = [ctypes.c_void_p]
    lib.gguf_get_n_tensors.restype = ctypes.c_int64
    assert lib.gguf_get_n_tensors(gctx) == 3
    lib.gguf_get_n_kv.argtypes = [ctypes.c_void_p]
    lib.gguf_get_n_kv.restype = ctypes.c_int64
    assert lib.gguf_get_n_kv(gctx) == 11
    lib.gguf_free.argtypes = [ctypes.c_void_p]
    lib.gguf_free(gctx)
