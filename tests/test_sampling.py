"""Sampler + grammar tests (patterns from reference tests/test-sampling.cpp,
test-grammar-parser.cpp, test-grammar-integration.cpp)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from llama_kotlin_tpu.sampling.samplers import (
    Candidates,
    SamplerChain,
    SamplingParams,
    min_p,
    penalties,
    tail_free,
    temperature,
    top_k,
    top_p,
    typical,
)
from llama_kotlin_tpu.sampling.grammar import Grammar, GrammarSampler, parse_gbnf

GRAMMARS = Path("/root/reference/grammars")


def _cand(probs):
    return Candidates.from_logits(np.log(np.asarray(probs, np.float32)))


def test_top_k():
    c = _cand([0.1, 0.2, 0.3, 0.4])
    top_k(c, 2)
    np.testing.assert_allclose(c.probs(), [4 / 7, 3 / 7], rtol=1e-5)
    assert list(c.ids) == [3, 2]


def test_top_p():
    c = _cand([0.1, 0.2, 0.3, 0.4])
    top_p(c, 0.69)
    # 0.4 + 0.3 = 0.7 >= 0.69 -> keep two
    np.testing.assert_allclose(c.probs(), [4 / 7, 3 / 7], rtol=1e-5)


def test_min_p():
    c = _cand([0.1, 0.2, 0.3, 0.4])
    min_p(c, 0.6)
    assert len(c.ids) == 2  # 0.4 and 0.3 >= 0.6*0.4=0.24
    c = _cand([0.1, 0.2, 0.3, 0.4])
    min_p(c, 0.4)
    assert len(c.ids) == 3  # >= 0.16


def test_typical():
    c = _cand([0.97, 0.01, 0.01, 0.01])
    typical(c, 0.5)
    assert len(c.ids) == 1 and c.ids[0] == 0


def test_tfs():
    c = _cand([0.1, 0.15, 0.25, 0.5])
    tail_free(c, 0.25)
    assert len(c.ids) >= 1
    assert c.ids[0] == 3


def test_penalties_repeat():
    c = Candidates.from_logits(np.array([1.0, 2.0, 3.0], np.float32))
    penalties(c, [2, 2, 1], repeat=2.0, freq=0.0, present=0.0)
    np.testing.assert_allclose(c.logits, [1.0, 1.0, 1.5])


def test_penalties_freq_presence():
    c = Candidates.from_logits(np.zeros(3, np.float32))
    penalties(c, [0, 1, 1], repeat=1.0, freq=0.5, present=0.25)
    np.testing.assert_allclose(c.logits, [-0.75, -1.25, 0.0])


def test_temperature_scaling():
    c = Candidates.from_logits(np.array([1.0, 2.0], np.float32))
    temperature(c, 0.5)
    np.testing.assert_allclose(c.logits, [2.0, 4.0])


def test_chain_greedy_and_dist():
    p = SamplingParams(temp=0.0)
    chain = SamplerChain(p, vocab_size=4)
    logits = np.array([0.0, 5.0, 1.0, 2.0], np.float32)
    assert chain.sample(logits) == 1
    p2 = SamplingParams(temp=0.8, top_k=0, top_p=1.0, min_p=0.0, seed=42)
    chain2 = SamplerChain(p2, vocab_size=4)
    counts = np.zeros(4)
    for _ in range(200):
        counts[chain2.sample(logits)] += 1
    assert counts[1] > 100  # dominant token sampled most


def test_chain_mirostat_runs():
    for version in (1, 2):
        p = SamplingParams(temp=0.8, mirostat=version, seed=7)
        chain = SamplerChain(p, vocab_size=100)
        logits = np.random.default_rng(0).standard_normal(100).astype(np.float32)
        for _ in range(10):
            tok = chain.sample(logits)
            chain.accept(tok)
        assert 0 <= tok < 100


# -- grammar ----------------------------------------------------------------


@pytest.mark.parametrize("name", ["json.gbnf", "arithmetic.gbnf", "list.gbnf",
                                  "chess.gbnf", "c.gbnf", "japanese.gbnf",
                                  "json_arr.gbnf"])
def test_parse_reference_grammars(name):
    rules, root = parse_gbnf((GRAMMARS / name).read_text())
    assert rules and root in rules


def _mk(name):
    rules, root = parse_gbnf((GRAMMARS / name).read_text())
    return Grammar(rules, root)


def _accepts(g: Grammar, text: str) -> bool:
    g.reset()
    for ch in text:
        if not g.accept_cp(ord(ch)):
            return False
    return g.can_end


def test_json_grammar_acceptance():
    g = _mk("json.gbnf")
    assert _accepts(g, '{}')
    assert _accepts(g, '{"a": 1}')
    assert _accepts(g, '{"a": [1, 2, 3], "b": {"c": "d"}}')
    assert _accepts(g, '{"s": "he\\nllo", "n": -1.5e+12, "t": true}')
    assert not _accepts(g, '{')
    assert not _accepts(g, '{"a": }')
    assert not _accepts(g, '[1, 2]')  # root must be object
    assert not _accepts(g, '{"a": 1,}')


def test_arithmetic_grammar():
    g = _mk("arithmetic.gbnf")
    assert _accepts(g, "1+2*3=x\n")  # form: expr "=" ws term "\n"
    assert _accepts(g, "(a+b)*c=d\n")
    assert not _accepts(g, "1+2\n")


def test_grammar_sampler_filters():
    class FakeTok:
        pieces = {0: b"{", 1: b"}", 2: b"x", 3: b'"a"'}

        def id_to_piece(self, tid):
            return self.pieces[tid]

    gs = GrammarSampler((GRAMMARS / "json.gbnf").read_text())
    tok = FakeTok()
    assert gs.token_allowed(0, tok)  # '{' can start an object
    assert not gs.token_allowed(2, tok)  # 'x' cannot
    gs.accept_token(0, tok)  # consume '{'
    assert gs.token_allowed(1, tok)  # '}' closes
    assert gs.token_allowed(3, tok)  # '"a"' starts a key
    assert not gs.token_allowed(2, tok)


def test_repetition_bounds():
    rules, root = parse_gbnf('root ::= "a"{2,4}')
    g = Grammar(rules, root)
    for text, ok in [("a", False), ("aa", True), ("aaa", True), ("aaaa", True), ("aaaaa", False)]:
        assert _accepts(g, text) == ok, text


def test_grammar_allows_eos_on_completion():
    """When the grammar can only end, EOS must be allowed (and accepting
    it is a no-op) — previously every candidate was rejected and accept
    raised, killing generation (reference: llama_sample_grammar allows
    EOS iff a stack is empty)."""
    from llama_kotlin_tpu.sampling.grammar import GrammarSampler

    class Tok:
        def id_to_piece(self, tid):
            return {0: "a", 1: "b", 2: ""}.get(tid, f"x{tid}").encode()

    g = GrammarSampler('root ::= "a"')
    tok = Tok()
    assert g.token_allowed(0, tok, eos_id=2)
    assert not g.token_allowed(2, tok, eos_id=2)  # not complete yet
    g.accept_token(0, tok, eos_id=2)
    assert not g.token_allowed(0, tok, eos_id=2)  # grammar exhausted
    assert g.token_allowed(2, tok, eos_id=2)      # EOS now the only option
    g.accept_token(2, tok, eos_id=2)              # no-op, no raise


def test_grammar_partial_utf8_byte_tokens():
    """Multi-byte characters split across byte-level tokens match the
    grammar via partial-sequence assembly (reference decode_utf8)."""
    from llama_kotlin_tpu.sampling.grammar import GrammarSampler

    e = "é".encode("utf-8")  # 2 bytes

    class Tok:
        def id_to_piece(self, tid):
            return {0: e[:1], 1: e[1:], 2: b"z"}[tid]

    g = GrammarSampler('root ::= [é] "z"')
    tok = Tok()
    assert g.token_allowed(0, tok)   # valid prefix byte: optimistic
    g.accept_token(0, tok)
    assert g.partial == e[:1]
    assert g.token_allowed(1, tok)   # completes é, which the grammar wants
    assert not g.token_allowed(2, tok)  # 'z' byte can't continue the é lead
    g.accept_token(1, tok)
    assert g.partial == b""
    assert g.token_allowed(2, tok)
    g.accept_token(2, tok)
    assert g.grammar.can_end


def test_json_schema_min_items_open_max():
    """minItems=1 without maxItems must allow arbitrarily long arrays
    (regression: the repetition term was dropped, forcing length 1)."""
    from llama_kotlin_tpu.sampling.grammar import Grammar, parse_gbnf
    from llama_kotlin_tpu.sampling.json_schema import json_schema_to_gbnf

    gb = json_schema_to_gbnf(
        {"type": "array", "items": {"type": "integer"}, "minItems": 1})
    g = Grammar(*parse_gbnf(gb))
    for text in ("[1]", "[1,2]", "[1,2,3,4,5]"):
        g.reset()
        assert g.accepts_text(text[0])
        for ch in text:
            assert g.accept_cp(ord(ch)), (text, ch)
        assert g.can_end, text
    g.reset()
    for ch in "[]":
        ok = g.accept_cp(ord(ch))
        if not ok:
            break
    else:
        ok = g.can_end
    assert not ok  # minItems=1: empty array rejected


def test_grammar_allowed_mask_memo_and_overlap():
    """The grammar's full-vocab allowed mask is state-memoized and matches
    the per-token loop; precompute_grammar warms the memo so the sampling-
    path filter is a lookup (the decode-overlap mechanism)."""
    import numpy as np

    from llama_kotlin_tpu.sampling.grammar import GrammarSampler
    from llama_kotlin_tpu.sampling.samplers import SamplerChain, SamplingParams

    class Tok:
        class vocab:
            eos_id = 0

        @staticmethod
        def id_to_piece(t):
            return {1: b"{", 2: b"}", 3: b'"', 4: b"a", 5: b":", 6: b"1",
                    7: b" ", 8: b"x"}.get(t, b"@")

    g = GrammarSampler('root ::= "{" "}"')
    V = 9
    mask = g.allowed_mask(Tok, V, eos_id=0)
    loop = np.array([g.token_allowed(t, Tok, eos_id=0) for t in range(V)])
    np.testing.assert_array_equal(mask, loop)
    assert mask[1] and not mask[2] and not mask[0]  # only "{" opens
    # memo hit: same state returns the same array object
    assert g.allowed_mask(Tok, V, eos_id=0) is mask
    # state advance invalidates (new key), eos allowed only at the end
    g.accept_token(1, Tok, eos_id=0)
    m2 = g.allowed_mask(Tok, V, eos_id=0)
    assert m2[2] and not m2[1]
    g.accept_token(2, Tok, eos_id=0)
    m3 = g.allowed_mask(Tok, V, eos_id=0)
    assert m3[0] and not m3[1] and not m3[2]  # only EOS

    # chain path: precompute then sample hits the memo and stays legal
    chain = SamplerChain(SamplingParams(temp=0.0, grammar='root ::= "{" "}"'),
                         vocab_size=V)
    chain.precompute_grammar(Tok)
    assert chain.grammar._mask_memo  # memo warmed for the current state
    logits = np.zeros(V, np.float32)
    logits[8] = 10.0  # illegal argmax: grammar must veto it
    tok = chain.sample(logits, tokenizer=Tok)
    assert tok == 1


def test_grammar_tables_shared_across_requests():
    """Novel-state sweeps persist across GrammarSampler instances of the
    same grammar text + tokenizer (VERDICT r3 #6): a server serving one
    JSON schema pays mask construction once per process, so a second
    request's masks are pure dict lookups."""
    import numpy as np

    from llama_kotlin_tpu.sampling.grammar import GrammarSampler

    class Tok:
        class vocab:
            eos_id = 0

        @staticmethod
        def id_to_piece(t):
            return {1: b"{", 2: b"}", 3: b"a"}.get(t, b"@")

    text = 'root ::= "{" "a"* "}"'
    g1 = GrammarSampler(text)
    V = 4
    m_open = g1.allowed_mask(Tok, V, eos_id=0)
    g1.accept_token(1, Tok, eos_id=0)
    m_body = g1.allowed_mask(Tok, V, eos_id=0)

    # request 2: a FRESH sampler returns the SAME cached mask arrays
    g2 = GrammarSampler(text)
    assert g2.allowed_mask(Tok, V, eos_id=0) is m_open
    g2.accept_token(1, Tok, eos_id=0)
    assert g2.allowed_mask(Tok, V, eos_id=0) is m_body
    # and its transition memo is pre-warmed (no new state interning)
    n_states = len(g2.grammar._states)
    g2.accept_token(3, Tok, eos_id=0)  # "a"* loops back to the same state
    np.testing.assert_array_equal(
        g2.allowed_mask(Tok, V, eos_id=0), m_body)
    assert len(g2.grammar._states) == n_states

    # different grammar text does NOT share
    g3 = GrammarSampler('root ::= "{" "}"')
    assert g3.allowed_mask(Tok, V, eos_id=0) is not m_open
