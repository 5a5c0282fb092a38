"""convert-llama2c + baby-llama parity tests.

Reference: examples/convert-llama2c-to-ggml/convert-llama2c-to-ggml.cpp
(header/weight-order parsing at :152-171, vocab handling at :545-616) and
examples/baby-llama/baby-llama.cpp (sine-token task, get_example_targets).
"""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from llama_kotlin_tpu.tools.convert_llama2c import (
    convert,
    read_llama2c_model,
    read_llama2c_tokenizer,
)


def _make_llama2c_bin(path, rng, *, dim=64, hidden=96, n_layer=2, n_head=4,
                      n_kv=2, vocab=160, seq=64, shared=False):
    head = dim // n_head
    kvd = dim * n_kv // n_head
    parts = [struct.pack("<7i", dim, hidden, n_layer, n_head, n_kv,
                         vocab if shared else -vocab, seq)]

    def r(*s):
        a = (rng.standard_normal(s) * 0.05).astype(np.float32)
        parts.append(a.tobytes())
        return a

    w = {
        "tok": r(vocab, dim), "ra": r(n_layer, dim),
        "wq": r(n_layer, dim, dim), "wk": r(n_layer, kvd, dim),
        "wv": r(n_layer, kvd, dim), "wo": r(n_layer, dim, dim),
        "rf": r(n_layer, dim), "w1": r(n_layer, hidden, dim),
        "w2": r(n_layer, dim, hidden), "w3": r(n_layer, hidden, dim),
        "rfin": r(dim),
    }
    # legacy freq_cis block the converter must skip
    parts.append(np.arange(seq * head, dtype=np.float32).tobytes())
    if not shared:
        w["wcls"] = r(vocab, dim)
    path.write_bytes(b"".join(parts))
    return w


def _make_tokenizer_bin(path, vocab):
    parts = [struct.pack("<I", 16)]
    for i in range(vocab):
        txt = {0: "junk0", 1: "junk1", 2: "junk2"}.get(
            i, f"<0x{i:02X}>" if i < 16 else f" tok{i}")
        b = txt.encode()
        parts.append(struct.pack("<f", -float(i)) + struct.pack("<I", len(b)) + b)
    path.write_bytes(b"".join(parts))


def test_checkpoint_parsing_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = _make_llama2c_bin(tmp_path / "ak.bin", rng, shared=False)
    hdr, got = read_llama2c_model(tmp_path / "ak.bin")
    assert hdr["n_layer"] == 2 and hdr["n_kv_head"] == 2
    assert not hdr["shared_classifier"]
    np.testing.assert_array_equal(got["token_embd"], w["tok"])
    np.testing.assert_array_equal(got["wk"], w["wk"])
    np.testing.assert_array_equal(got["w2"], w["w2"])
    np.testing.assert_array_equal(got["rms_final"], w["rfin"])
    np.testing.assert_array_equal(got["wcls"], w["wcls"])  # after freq_cis skip


def test_shared_classifier(tmp_path):
    rng = np.random.default_rng(1)
    w = _make_llama2c_bin(tmp_path / "ak.bin", rng, shared=True)
    hdr, got = read_llama2c_model(tmp_path / "ak.bin")
    assert hdr["shared_classifier"]
    np.testing.assert_array_equal(got["wcls"], w["tok"])


def test_tokenizer_bin_parsing(tmp_path):
    _make_tokenizer_bin(tmp_path / "tok.bin", 160)
    tokens, scores, types = read_llama2c_tokenizer(tmp_path / "tok.bin", 160)
    # ids 0/1/2 rewritten regardless of file contents (reference :591-598)
    assert tokens[:3] == ["<unk>", "<s>", "</s>"]
    assert types[:3] == [2, 3, 3]
    assert tokens[5] == "<0x05>" and types[5] == 6     # byte token kept
    assert tokens[20] == "▁tok20" and types[20] == 1   # whitespace escaped
    assert scores[20] == -20.0


def test_converted_gguf_matches_direct_weights(tmp_path):
    """Converted GGUF must produce the same logits as the same tensors
    written directly through the fixture writer (no hidden permutation —
    the reference converter writes rows unchanged)."""
    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from tests.fixtures import tiny_llama_dims, write_llama_gguf

    rng = np.random.default_rng(2)
    w = _make_llama2c_bin(tmp_path / "ak.bin", rng)
    _make_tokenizer_bin(tmp_path / "tok.bin", 160)
    hdr = convert(tmp_path / "ak.bin", tmp_path / "tok.bin", tmp_path / "c.gguf")
    assert hdr["n_vocab"] == 160

    dims = tiny_llama_dims(n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
                           n_ff=96, vocab=160)
    ws = {"token_embd.weight": w["tok"], "output_norm.weight": w["rfin"],
          "output.weight": w["wcls"]}
    for i in range(2):
        ws[f"blk.{i}.attn_norm.weight"] = w["ra"][i]
        ws[f"blk.{i}.attn_q.weight"] = w["wq"][i]
        ws[f"blk.{i}.attn_k.weight"] = w["wk"][i]
        ws[f"blk.{i}.attn_v.weight"] = w["wv"][i]
        ws[f"blk.{i}.attn_output.weight"] = w["wo"][i]
        ws[f"blk.{i}.ffn_norm.weight"] = w["rf"][i]
        ws[f"blk.{i}.ffn_gate.weight"] = w["w1"][i]
        ws[f"blk.{i}.ffn_down.weight"] = w["w2"][i]
        ws[f"blk.{i}.ffn_up.weight"] = w["w3"][i]
    write_llama_gguf(tmp_path / "d.gguf", ws, dims)

    toks = np.array([3, 17, 42, 99], np.int32)
    logits = []
    for p in ("c.gguf", "d.gguf"):
        cfg, params, f = load_gguf_model(tmp_path / p, compute_dtype=jnp.float32)
        f.close()
        ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
        assert ctx.decode(Batch.single(toks)) == 0
        logits.append(np.asarray(ctx.get_logits()[0]))
    np.testing.assert_allclose(logits[0], logits[1], atol=1e-5)


def test_vocab_size_mismatch_raises(tmp_path):
    rng = np.random.default_rng(4)
    _make_llama2c_bin(tmp_path / "ak.bin", rng, vocab=160)
    _make_tokenizer_bin(tmp_path / "tok.bin", 120)
    with pytest.raises(ValueError, match="vocab size mismatch"):
        convert(tmp_path / "ak.bin", tmp_path / "tok.bin", tmp_path / "o.gguf")


def test_baby_llama_learns(tmp_path, capsys):
    """baby-llama demo: loss on the sine-token task must collapse and the
    trained net generates (reference trains the same synthetic task)."""
    from llama_kotlin_tpu.tools.baby_llama import main, sine_tokens

    data = sine_tokens(500, 32, n_tokens=32)
    assert data.min() >= 0 and data.max() < 32 and data[0] == 0

    main(["--steps", "150", "--n-embd", "32", "--n-layer", "1",
          "--seq-len", "32", "--n-vocab", "32", "--batch", "8",
          "--out", str(tmp_path / "baby.gguf")])
    out = capsys.readouterr().out
    first, last = None, None
    for line in out.splitlines():
        if line.startswith("trained"):
            seg = line.split("loss ")[1]
            first, last = (float(x) for x in seg.split(" -> "))
    assert first is not None and last < 0.4 * first
    assert (tmp_path / "baby.gguf").exists()
