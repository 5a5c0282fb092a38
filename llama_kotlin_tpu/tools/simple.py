"""Minimal API demo (parity: reference examples/simple/simple.cpp — the
~100-line "hello world" of the C API): load a GGUF, tokenize a prompt,
greedy-decode N tokens with the lowest-level decode/logits calls.

Usage:
    python -m llama_kotlin_tpu.tools.simple model.gguf "Hello my name is" 32
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__, file=sys.stderr)
        return 1
    model_path = argv[0]
    prompt = argv[1] if len(argv) > 1 else "Hello my name is"
    n_predict = int(argv[2]) if len(argv) > 2 else 32

    from llama_kotlin_tpu.models.loader import load_gguf_model
    from llama_kotlin_tpu.runtime.batch import Batch
    from llama_kotlin_tpu.runtime.context import LlamaContext
    from llama_kotlin_tpu.tokenizer import build_tokenizer

    cfg, params, f = load_gguf_model(model_path)
    tok = build_tokenizer(f.metadata)
    f.close()
    ids = list(tok.encode(prompt, add_special=True))
    ctx = LlamaContext(cfg, params, n_cells=max(256, len(ids) + n_predict + 8))

    if ctx.decode(Batch.single(np.asarray(ids, np.int32))) != 0:
        print("decode failed (context too small?)", file=sys.stderr)
        return 1
    sys.stdout.write(prompt)
    n_past = len(ids)
    eos = tok.vocab.eos_id
    for _ in range(n_predict):
        tok_id = int(np.argmax(ctx.get_logits()[-1]))
        if tok_id == eos:
            break
        sys.stdout.write(tok.decode([tok_id], skip_special=False))
        sys.stdout.flush()
        if ctx.decode(Batch.single(np.array([tok_id], np.int32),
                                   pos0=n_past)) != 0:
            break
        n_past += 1
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
