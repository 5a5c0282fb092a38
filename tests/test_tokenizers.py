"""Tokenizer golden tests against the reference's fixtures:
models/ggml-vocab-*.gguf with .inp/.out files (same protocol as
tests/test-tokenizer-0.cpp: add_special=false, parse_special=false)."""

from __future__ import annotations

from pathlib import Path

import pytest

from llama_kotlin_tpu.gguf import GGUFFile
from llama_kotlin_tpu.tokenizer import build_tokenizer

MODELS = Path("/root/reference/models")

GOLDEN_VOCABS = [
    "llama-spm",
    "phi-3",
    "gpt-2",
    "falcon",
    "mpt",
    "starcoder",
    "refact",
    "deepseek-llm",
    "deepseek-coder",
    "bert-bge",
]


def load_cases(name: str):
    inp = (MODELS / f"ggml-vocab-{name}.gguf.inp").read_text(encoding="utf-8")
    out = (MODELS / f"ggml-vocab-{name}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split("\n__ggml_vocab_test__\n")
    id_lines = out.splitlines()
    cases = []
    for text, line in zip(texts, id_lines):
        ids = [int(x) for x in line.split()]
        cases.append((text, ids))
    return cases


@pytest.mark.parametrize("name", GOLDEN_VOCABS)
def test_golden_vocab(name):
    gguf_path = MODELS / f"ggml-vocab-{name}.gguf"
    if not gguf_path.exists():
        pytest.skip(f"{gguf_path} missing")
    with GGUFFile(gguf_path) as f:
        tok = build_tokenizer(f.metadata)
    failures = []
    cases = load_cases(name)
    assert cases, "no golden cases parsed"
    for text, expect in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != expect:
            failures.append((text, expect, got))
    msg = "\n".join(
        f"text={t!r}\n  expect={e}\n  got   ={g}" for t, e, g in failures[:5]
    )
    assert not failures, f"{len(failures)}/{len(cases)} golden mismatches:\n{msg}"


def test_spm_decode_roundtrip():
    with GGUFFile(MODELS / "ggml-vocab-llama-spm.gguf") as f:
        tok = build_tokenizer(f.metadata)
    text = "Hello world, this is a test! 123"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


def test_bpe_decode_roundtrip():
    with GGUFFile(MODELS / "ggml-vocab-gpt-2.gguf") as f:
        tok = build_tokenizer(f.metadata)
    text = "Hello world, this is a test! 123\nnew line"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text
