"""Shared helpers for the device bench harnesses."""

from __future__ import annotations


class CharTokenizer:
    """id -> single letter piece; enough for Engine harnesses over a big
    vocab (grammar masks, TTFT load waves) without a real vocab file."""

    class V:
        eos_id = 2
        bos_id = 1
        add_bos = True

    vocab = V()

    def __init__(self, vocab_size):
        self.vocab_size = vocab_size

    def encode(self, text, add_special=True, parse_special=False):
        return [1] + [3 + (ord(c) % 200) for c in text]

    def decode(self, ids, skip_special=True):
        return "".join(chr(97 + (t % 26)) for t in ids)

    def id_to_piece(self, tid):
        return chr(97 + (tid % 26))
