"""JSON-schema -> GBNF tests (pattern: reference
test-json-schema-to-grammar.cpp): convert a schema, then verify the
resulting grammar accepts conforming JSON and rejects violations."""

from __future__ import annotations

import json

import pytest

from llama_kotlin_tpu.sampling.grammar import Grammar, parse_gbnf
from llama_kotlin_tpu.sampling.json_schema import json_schema_to_gbnf


def _grammar(schema):
    text = json_schema_to_gbnf(schema)
    rules, root = parse_gbnf(text)
    return Grammar(rules, root)


def _accepts(g, obj_text: str) -> bool:
    g.reset()
    for ch in obj_text:
        if not g.accept_cp(ord(ch)):
            return False
    return g.can_end


def test_object_required_props():
    g = _grammar({
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    })
    assert _accepts(g, '{"name": "bob", "age": 3}')
    assert not _accepts(g, '{"age": 3, "name": "bob"}')  # declaration order enforced
    assert not _accepts(g, '{"name": "bob"}')
    assert not _accepts(g, '{"name": "bob", "age": "x"}')


def test_optional_props():
    g = _grammar({
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "boolean"}},
        "required": ["a"],
    })
    assert _accepts(g, '{"a": 1}')
    assert _accepts(g, '{"a": 1, "b": true}')
    assert not _accepts(g, '{"b": true}')


def test_enum_and_const():
    g = _grammar({"enum": ["red", "green", 7]})
    assert _accepts(g, '"red"')
    assert _accepts(g, '7')
    assert not _accepts(g, '"blue"')
    g2 = _grammar({"const": 42})
    assert _accepts(g2, '42')
    assert not _accepts(g2, '41')


def test_array_items_and_bounds():
    g = _grammar({"type": "array", "items": {"type": "integer"}, "minItems": 2, "maxItems": 3})
    assert not _accepts(g, '[1]')
    assert _accepts(g, '[1, 2]')
    assert _accepts(g, '[1, 2, 3]')
    assert not _accepts(g, '[1, 2, 3, 4]')
    assert not _accepts(g, '[1, "x"]')


def test_anyof():
    g = _grammar({"anyOf": [{"type": "integer"}, {"type": "boolean"}]})
    assert _accepts(g, '5')
    assert _accepts(g, 'true')
    assert not _accepts(g, '"s"')


def test_ref_and_nested():
    g = _grammar({
        "type": "object",
        "properties": {"p": {"$ref": "#/$defs/point"}},
        "required": ["p"],
        "$defs": {
            "point": {
                "type": "object",
                "properties": {"x": {"type": "number"}, "y": {"type": "number"}},
                "required": ["x", "y"],
            }
        },
    })
    assert _accepts(g, '{"p": {"x": 1.5, "y": -2}}')
    assert not _accepts(g, '{"p": {"x": 1.5}}')


def test_free_value():
    g = _grammar({})
    assert _accepts(g, '{"anything": [1, "two", null, {"n": false}]}')
    assert _accepts(g, '3.25')
