"""Sample-grammar pack parity: the reference ships grammars/*.gbnf as the
de-facto conformance suite for its GBNF engine.  Run each through our
parser + pushdown (tools/gbnf_validator.py) with accept/reject fixtures.
Grammars are read from the reference tree at test time (they are input
data, not code)."""

from __future__ import annotations

from pathlib import Path

import pytest

from llama_kotlin_tpu.tools.gbnf_validator import validate

GRAMMAR_DIR = Path("/root/reference/grammars")

pytestmark = pytest.mark.skipif(not GRAMMAR_DIR.is_dir(),
                                reason="reference grammar pack not on disk")

# grammar file -> (accepted strings, rejected strings)
FIXTURES = {
    "arithmetic.gbnf": (
        ["1+2=3\n", "x*y=z1\n", "(a)+1=2\n", "12 = 7\n1+1=2\n"],
        ["1+2=3", "=3\n", "1+*2=3\n", "A+1=2\n"],
    ),
    "json.gbnf": (
        # root ::= object — top-level must be an object
        ['{"a": 1} ', '{"s": "v", "n": [1, 2] } ', '{"b": true} ',
         '{"u": "\\u00e9"} ', '{} '],
        ['{a: 1}', '{"a": 1,}', "[1] ", '"hi" ', "3.14 ", "{'a': 1}"],
    ),
    "json_arr.gbnf": (
        # arr separators are ",\n" (ws only AFTER the newline)
        ["[\n1,\n2]", "[\n]", '[\n"x",\n {"k": 1} ]'],
        ['{"a": 1}', "[\n1, 2]", "1", "[\n1,\n2] "],
    ),
    "list.gbnf": (
        ["- one\n", "- one\n- two\n"],
        ["one\n", "- one", "-one\n", ""],
    ),
    "chess.gbnf": (
        ["1. e4 e5\n2. Nf3 Nc6\n", "1. d4 d5\n2. O-O Ke7+\n",
         "1. exd5 Qxd5\n10. O-O-O a1=Q#\n"],
        ["e4 e5\n", "1. e4\n", "1. e9 e5\n2. Nf3 Nc6\n", "1. e4 e5\n"[:-1]],
    ),
    "japanese.gbnf": (
        ["こんにちは", "カタカナ です", "日本語 テスト"],
        ["hello", "こんにちはhello", ""],
    ),
    "c.gbnf": (
        ["int main(){return 1;}",
         "int f(int x){int y = x;while(x<y){y = 1;}return y;}",
         "float g(){// c\nreturn 2;}"],
        ["int main(){return 1}", "main(){}", "int 1f(){}"],
    ),
}


@pytest.mark.parametrize("fname", sorted(FIXTURES))
def test_grammar_pack(fname):
    text = (GRAMMAR_DIR / fname).read_text(encoding="utf-8")
    accepts, rejects = FIXTURES[fname]
    for s in accepts:
        ok, pos = validate(text, s)
        assert ok, f"{fname} rejected {s!r} at {pos}"
    for s in rejects:
        ok, _pos = validate(text, s)
        assert not ok, f"{fname} accepted {s!r}"


def test_grammar_pack_covers_all_files():
    files = {p.name for p in GRAMMAR_DIR.glob("*.gbnf")}
    assert files == set(FIXTURES), f"unfixtured grammars: {files - set(FIXTURES)}"
