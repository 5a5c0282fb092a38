"""Tool-level tests: quantize round-trip, perplexity sanity, CLI main,
llama-bench (tiny synthetic model; patterns from the reference's ci/run.sh
quantized e2e generations)."""

from __future__ import annotations

import json
import subprocess
from pathlib import Path
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from llama_kotlin_tpu.gguf import GGUFFile
from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.tools.perplexity import compute_perplexity, kl_divergence
from llama_kotlin_tpu.tools.quantize import quantize_model, tensor_get_type

from tests.fixtures import random_llama_weights, tiny_llama_dims, write_llama_gguf


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    rng = np.random.default_rng(5)
    dims = tiny_llama_dims(n_embd=64, n_ff=96, vocab=160)
    weights = random_llama_weights(dims, rng)
    path = tmp_path_factory.mktemp("m") / "f32.gguf"
    write_llama_gguf(path, weights, dims)
    return path, dims


def test_quantize_tool_roundtrip(f32_model, tmp_path):
    src, dims = f32_model
    out = tmp_path / "q8.gguf"
    stats = quantize_model(str(src), str(out), "Q8_0")
    assert stats["out_bytes"] < stats["in_bytes"]
    with GGUFFile(out) as f:
        assert f.metadata["general.architecture"] == "llama"
        assert int(f.metadata["general.file_type"]) == int(GGMLQuantType.Q8_0)
        # norms stay f32, matmuls are Q8_0
        assert f.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLQuantType.F32
        assert f.tensors["blk.0.ffn_up.weight"].ggml_type == GGMLQuantType.Q8_0

    # the quantized model loads and decodes
    cfg, params, fh = load_gguf_model(out, compute_dtype=jnp.float32)
    fh.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    assert ctx.decode(Batch.single(np.array([3, 5, 7], np.int32))) == 0
    assert np.isfinite(ctx.get_logits()).all()


def test_tensor_type_heuristics():
    assert tensor_get_type("output.weight", GGMLQuantType.Q4_K, "Q4_K_M") == GGMLQuantType.Q6_K
    assert tensor_get_type("blk.3.attn_v.weight", GGMLQuantType.Q4_K, "Q4_K_M") == GGMLQuantType.Q6_K
    assert tensor_get_type("blk.3.attn_v.weight", GGMLQuantType.Q4_K, "Q4_K_S") == GGMLQuantType.Q4_K
    assert tensor_get_type("blk.0.ffn_down.weight", GGMLQuantType.Q3_K, "Q3_K_M") == GGMLQuantType.Q4_K
    assert tensor_get_type("token_embd.weight", GGMLQuantType.Q2_K, "Q2_K") == GGMLQuantType.Q4_K


def test_perplexity_and_kl(f32_model, tmp_path):
    src, dims = f32_model
    cfg, params, fh = load_gguf_model(src, compute_dtype=jnp.float32)
    fh.close()
    n_ctx = 32
    ctx = LlamaContext(cfg, params, n_cells=n_ctx, compute_dtype=jnp.float32,
                       buckets=(n_ctx,), n_ubatch=n_ctx)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, dims["vocab"], 3 * n_ctx).astype(np.int32)
    ppl, nll, count, logits = compute_perplexity(ctx, tokens, n_ctx, collect_logits=True)
    assert np.isfinite(ppl) and ppl > 1.0
    assert count == 3 * (n_ctx - n_ctx // 2)

    # PPL of a quantized variant is close; KL is small; identical model KL=0
    q = tmp_path / "q8.gguf"
    quantize_model(str(src), str(q), "Q8_0")
    cfg2, params2, fh2 = load_gguf_model(q, compute_dtype=jnp.float32)
    fh2.close()
    ctx2 = LlamaContext(cfg2, params2, n_cells=n_ctx, compute_dtype=jnp.float32,
                        buckets=(n_ctx,), n_ubatch=n_ctx)
    ppl2, _, _, logits2 = compute_perplexity(ctx2, tokens, n_ctx, collect_logits=True)
    assert abs(ppl2 - ppl) / ppl < 0.05
    kl, top1 = kl_divergence(logits, logits2)
    assert kl < 0.01
    assert top1 > 0.9
    kl_same, top1_same = kl_divergence(logits, logits)
    assert kl_same < 1e-6 and top1_same == 1.0


def test_main_cli(f32_model, tmp_path):
    src, _ = f32_model
    from llama_kotlin_tpu.tools.main import main as cli_main
    import io
    from contextlib import redirect_stdout

    # SPM-less model: use a session file + greedy generation; vocab has no
    # tokenizer metadata so build_tokenizer would fail -> add minimal vocab
    # (covered by test fixtures writing tokenizer-free GGUFs is a gap in the
    # reference too; here we just ensure arg parsing + load path pre-checks)
    from llama_kotlin_tpu.tools.main import build_argparser

    args = build_argparser().parse_args(["-m", str(src), "-p", "x", "-n", "2"])
    assert args.model == str(src)
    assert args.n_predict == 2


def test_llama_bench_tool(f32_model, capsys):
    src, _ = f32_model
    from llama_kotlin_tpu.tools import llama_bench

    sys.argv = ["llama_bench", "--model", str(src), "-p", "16", "-n", "4",
                "-r", "1", "-o", "json"]
    llama_bench.main()
    rows = json.loads(capsys.readouterr().out)
    assert {r["test"] for r in rows} == {"pp16", "tg4"}
    assert all(r["avg"] > 0 for r in rows)


def test_imatrix_collection(f32_model):
    src, dims = f32_model
    from llama_kotlin_tpu.tools.imatrix import collect_imatrix

    cfg, params, fh = load_gguf_model(src, compute_dtype=jnp.float32)
    fh.close()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, dims["vocab"], 64).astype(np.int32)
    im = collect_imatrix(cfg, params, tokens, n_ctx=32, compute_dtype=jnp.float32)
    assert f"blk.0.attn_qkv" in im and f"blk.{dims['n_layer']-1}.ffn_down" in im
    assert im["blk.0.attn_qkv"].shape == (dims["n_embd"],)
    assert all(np.isfinite(v).all() and (v >= 0).all() for v in im.values())


def test_gguf_split_merge_hash(f32_model, tmp_path):
    src, dims = f32_model
    from llama_kotlin_tpu.tools.gguf_tools import hash_file, merge, split

    shards = split(str(src), str(tmp_path / "shard"), max_tensors=5)
    assert len(shards) > 1
    with GGUFFile(shards[0]) as f:
        assert f.metadata["split.count"] == len(shards)
    merged = tmp_path / "merged.gguf"
    merge(shards[0], str(merged))
    h_src = hash_file(str(src))
    h_merged = hash_file(str(merged))
    assert h_src == h_merged  # tensor bytes identical through split+merge

    # merged model still loads and decodes
    cfg, params, fh = load_gguf_model(merged, compute_dtype=jnp.float32)
    fh.close()
    ctx = LlamaContext(cfg, params, n_cells=32, compute_dtype=jnp.float32)
    assert ctx.decode(Batch.single(np.array([1, 2, 3], np.int32))) == 0


def test_server_embeddings_endpoint(f32_model):
    # exercised via the engine-level API (HTTP covered in test_server.py)
    src, dims = f32_model
    cfg, params, fh = load_gguf_model(src, compute_dtype=jnp.float32)
    fh.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)
    ctx.decode(Batch.single(np.array([5, 6, 7], np.int32), logits_last_only=False))
    emb = ctx.get_embeddings("mean")
    assert emb.shape == (dims["n_embd"],)


def test_quant_quality_ladder(tmp_path):
    """train -> quantize -> ΔPPL pipeline runs end-to-end; Q2_K (2-bit)
    must degrade at least as much as Q8_0 (8-bit) on held-out text."""
    from llama_kotlin_tpu.tools.quant_quality import run

    text = (Path(__file__).resolve().parents[1] / "README.md").read_bytes()
    text = (text * (30_000 // len(text) + 1))[:30_000]
    rows = run(steps=80, text=text, out_dir=tmp_path / "q",
               n_ctx=64, ladder=["Q8_0", "Q4_K_M", "Q2_K"], seed=1)
    assert rows["f32"]["ppl"] > 0
    assert rows["Q2_K"]["delta"] >= rows["Q8_0"]["delta"] - 1e-3
    # 8-bit is near-lossless on any model
    assert abs(rows["Q8_0"]["delta"]) < 0.05 * rows["f32"]["ppl"]
    # KLD gate (reference KLD method, examples/perplexity/README.md:77-114):
    # KL(f32 || quant) through the serving path must be near-zero at 8-bit,
    # monotone down the ladder, and bounded at 4-bit
    assert rows["Q8_0"]["kld"] < 1e-3
    assert rows["Q4_K_M"]["kld"] < 0.05
    assert rows["Q8_0"]["kld"] <= rows["Q4_K_M"]["kld"] + 1e-6
    assert rows["Q4_K_M"]["kld"] <= rows["Q2_K"]["kld"] + 1e-6
    # top-1 agreement with f32 stays high through 4-bit
    assert rows["Q4_K_M"]["top1_agree"] > 0.95


def test_gritlm_causal_toggle(tmp_path):
    """set_causal_attn switches masking per call (the gritlm pattern):
    bidirectional embedding differs from causal, and switching back
    restores the exact causal logits (both step variants stay cached)."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
    )

    rng = np.random.default_rng(12)
    dims = tiny_llama_dims(vocab=160)
    path = tmp_path / "g.gguf"
    write_llama_gguf(path, random_llama_weights(dims, rng), dims)
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=64, compute_dtype=jnp.float32)

    toks = np.array([3, 17, 42, 9], np.int32)
    ctx.decode(Batch.single(toks, logits_last_only=False))
    causal1 = ctx.get_logits().copy()

    ctx.set_causal_attn(False)
    ctx.clear()
    ctx.decode(Batch.single(toks, logits_last_only=False))
    bidi = ctx.get_logits().copy()
    # early tokens now see later ones -> first-row logits must change
    assert not np.allclose(bidi[0], causal1[0], atol=1e-4)

    ctx.set_causal_attn(True)
    ctx.clear()
    ctx.decode(Batch.single(toks, logits_last_only=False))
    np.testing.assert_array_equal(ctx.get_logits(), causal1)


def test_gritlm_encode_semantics(tmp_path):
    """gritlm encode(): instruction tokens are excluded from the mean pool
    and outputs are unit-norm."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tools.gritlm import encode, gritlm_instruction
    from tests.fixtures import (
        random_llama_weights,
        tiny_llama_dims,
        write_llama_gguf,
        spm_vocab_kvs,
    )
    from llama_kotlin_tpu.tokenizer import build_tokenizer
    from llama_kotlin_tpu.gguf.reader import GGUFFile

    rng = np.random.default_rng(13)
    dims = tiny_llama_dims(vocab=160)
    path = tmp_path / "g2.gguf"
    write_llama_gguf(path, random_llama_weights(dims, rng), dims,
                     extra_kv=spm_vocab_kvs(160))
    cfg, params, f = load_gguf_model(path, compute_dtype=jnp.float32)
    gf = GGUFFile(path)
    tok = build_tokenizer(gf.metadata)
    gf.close()
    f.close()
    ctx = LlamaContext(cfg, params, n_cells=128, compute_dtype=jnp.float32)
    reps = encode(ctx, tok, ["abc", "xyz xyz"], gritlm_instruction("find it"))
    assert reps.shape[0] == 2
    np.testing.assert_allclose(np.linalg.norm(reps, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(reps[0], reps[1])
