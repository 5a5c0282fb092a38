"""llama2.c checkpoint -> GGUF converter.

Parity target: the reference's examples/convert-llama2c-to-ggml/
convert-llama2c-to-ggml.cpp — reads a karpathy llama2.c `.bin` model
(7-int32 header + contiguous f32 weight blocks, reference
checkpoint_init_weights at convert-llama2c-to-ggml.cpp:152-171) plus a
vocabulary (either a llama2.c `tokenizer.bin` or an existing GGUF model to
copy the vocab from, reference load_vocab at :545-616), and writes a
"llama"-architecture GGUF our runtime (and the reference's) can load.

Format notes (mirroring the reference):
  * header: dim, hidden_dim, n_layers, n_heads, n_kv_heads, vocab_size,
    seq_len (int32 LE).  vocab_size > 0 means the classifier head shares
    the token-embedding table; negative means a separate wcls tensor is
    appended (reference :893).
  * weight order: token_embd, rms_att, wq, wk, wv, wo, rms_ffn, w1(gate),
    w2(down), w3(up), rms_final, [skip seq_len*head_size freq_cis], [wcls].
  * no q/k row permutation: llama2.c applies RoPE to adjacent value pairs
    (interleaved), which is exactly the "llama" arch's NORM rope — the
    reference converter also writes the rows unchanged.
  * tokenizer.bin: u32 max_token_length, then per token f32 score,
    u32 len, bytes.  Token 0/1/2 are rewritten to <unk>/<s>/</s> and
    spaces are escaped to U+2581 (reference :576-616).

Usage:
    python -m llama_kotlin_tpu.tools.convert_llama2c \
        --llama2c-model stories15M.bin --vocab tokenizer.bin out.gguf
"""

from __future__ import annotations

import argparse
import re
import struct
import sys
from pathlib import Path

import numpy as np

from llama_kotlin_tpu.gguf import GGUFWriter
from llama_kotlin_tpu.quant.formats import GGMLQuantType

# llama_token_type values (reference llama.h)
TT_NORMAL, TT_UNKNOWN, TT_CONTROL, TT_BYTE = 1, 2, 3, 6

_BYTE_RE = re.compile(r"^<0x[0-9A-Fa-f]{2}>$")


def read_llama2c_model(path: str | Path):
    """Parse a llama2.c .bin checkpoint -> (header dict, weights dict)."""
    raw = Path(path).read_bytes()
    dim, hidden, n_layer, n_head, n_kv_head, vocab_signed, seq_len = \
        struct.unpack_from("<7i", raw, 0)
    shared = vocab_signed > 0
    n_vocab = abs(vocab_signed)
    if n_kv_head <= 0:
        n_kv_head = n_head
    head_size = dim // n_head
    kv_dim = dim * n_kv_head // n_head

    off = 7 * 4
    f32 = np.frombuffer(raw, np.float32, offset=off)

    pos = 0

    def take(*shape):
        nonlocal pos
        n = int(np.prod(shape))
        flat = f32[pos:pos + n]
        if flat.size != n:
            raise ValueError(f"{path}: truncated checkpoint at {pos + n} floats")
        pos += n
        return flat.reshape(shape)

    w = {
        "token_embd": take(n_vocab, dim),
        "rms_att": take(n_layer, dim),
        "wq": take(n_layer, dim, dim),
        "wk": take(n_layer, kv_dim, dim),
        "wv": take(n_layer, kv_dim, dim),
        "wo": take(n_layer, dim, dim),
        "rms_ffn": take(n_layer, dim),
        "w1": take(n_layer, hidden, dim),   # ffn_gate
        "w2": take(n_layer, dim, hidden),   # ffn_down
        "w3": take(n_layer, hidden, dim),   # ffn_up
        "rms_final": take(dim),
    }
    pos += seq_len * head_size  # skip legacy freq_cis_real/imag
    w["wcls"] = w["token_embd"] if shared else take(n_vocab, dim)
    hdr = dict(dim=dim, hidden_dim=hidden, n_layer=n_layer, n_head=n_head,
               n_kv_head=n_kv_head, n_vocab=n_vocab, seq_len=seq_len,
               shared_classifier=shared)
    return hdr, w


def _escape_ws(s: str) -> str:
    return s.replace(" ", "▁")


def read_llama2c_tokenizer(path: str | Path, n_vocab: int):
    """Parse llama2.c tokenizer.bin -> (tokens, scores, token_types)."""
    raw = Path(path).read_bytes()
    off = 4  # u32 max_token_length, unused
    tokens: list[str] = []
    scores: list[float] = []
    types: list[int] = []
    for tid in range(n_vocab):
        if off + 8 > len(raw):
            raise ValueError(
                f"vocab size mismatch: {path} holds only {tid} tokens, "
                f"model expects {n_vocab}")
        (score,) = struct.unpack_from("<f", raw, off)
        off += 4
        (ln,) = struct.unpack_from("<I", raw, off)
        off += 4
        text = raw[off:off + ln].decode("utf-8", errors="replace")
        off += ln
        if tid == 0:
            text, tt = "<unk>", TT_UNKNOWN
        elif tid == 1:
            text, tt = "<s>", TT_CONTROL
        elif tid == 2:
            text, tt = "</s>", TT_CONTROL
        elif text == "":
            tt = TT_CONTROL
        elif _BYTE_RE.match(text):
            tt = TT_BYTE
        else:
            tt = TT_NORMAL
        tokens.append(_escape_ws(text))
        scores.append(float(score))
        types.append(tt)
    return tokens, scores, types


def read_gguf_vocab(path: str | Path):
    """Copy the vocab tables out of an existing GGUF model."""
    from llama_kotlin_tpu.gguf.reader import GGUFFile

    f = GGUFFile(path)
    md = f.metadata
    tokens = list(md["tokenizer.ggml.tokens"])
    n = len(tokens)
    scores = list(md.get("tokenizer.ggml.scores", [0.0] * n))
    types = [int(t) for t in md.get("tokenizer.ggml.token_type", [TT_NORMAL] * n)]
    f.close()
    return tokens, scores, types


def convert(model_path, vocab_path, out_path, ctx_len: int | None = None) -> dict:
    hdr, w = read_llama2c_model(model_path)
    vp = Path(vocab_path)
    if vp.read_bytes()[:4] == b"GGUF":
        tokens, scores, types = read_gguf_vocab(vp)
    else:
        tokens, scores, types = read_llama2c_tokenizer(vp, hdr["n_vocab"])
    if len(tokens) != hdr["n_vocab"]:
        raise ValueError(
            f"vocab size mismatch: model {hdr['n_vocab']} vs vocab {len(tokens)}")

    g = GGUFWriter()
    g.add_kv("general.architecture", "llama")
    g.add_kv("general.name", "llama")
    g.add_kv("llama.context_length", np.uint32(ctx_len or hdr["seq_len"]))
    g.add_kv("llama.embedding_length", np.uint32(hdr["dim"]))
    g.add_kv("llama.feed_forward_length", np.uint32(hdr["hidden_dim"]))
    g.add_kv("llama.attention.head_count", np.uint32(hdr["n_head"]))
    g.add_kv("llama.attention.head_count_kv", np.uint32(hdr["n_kv_head"]))
    g.add_kv("llama.block_count", np.uint32(hdr["n_layer"]))
    g.add_kv("llama.rope.dimension_count",
             np.uint32(hdr["dim"] // hdr["n_head"]))
    g.add_kv("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    g.add_kv("tokenizer.ggml.model", "llama")
    g.add_kv("tokenizer.ggml.tokens", tokens)
    g.add_kv("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    g.add_kv("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    g.add_kv("tokenizer.ggml.unknown_token_id", np.uint32(0))
    g.add_kv("tokenizer.ggml.bos_token_id", np.uint32(1))
    g.add_kv("tokenizer.ggml.eos_token_id", np.uint32(2))

    def t(name, arr):
        g.add_tensor(name, np.ascontiguousarray(arr, np.float32),
                     GGMLQuantType.F32)

    t("token_embd.weight", w["token_embd"])
    t("output_norm.weight", w["rms_final"])
    t("output.weight", w["wcls"])
    for i in range(hdr["n_layer"]):
        t(f"blk.{i}.attn_q.weight", w["wq"][i])
        t(f"blk.{i}.attn_k.weight", w["wk"][i])
        t(f"blk.{i}.attn_v.weight", w["wv"][i])
        t(f"blk.{i}.attn_output.weight", w["wo"][i])
        t(f"blk.{i}.attn_norm.weight", w["rms_att"][i])
        t(f"blk.{i}.ffn_gate.weight", w["w1"][i])
        t(f"blk.{i}.ffn_down.weight", w["w2"][i])
        t(f"blk.{i}.ffn_up.weight", w["w3"][i])
        t(f"blk.{i}.ffn_norm.weight", w["rms_ffn"][i])
    g.write(out_path)
    return hdr


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a llama2.c checkpoint to GGUF")
    ap.add_argument("--llama2c-model", required=True,
                    help="llama2.c .bin checkpoint (e.g. stories15M.bin)")
    ap.add_argument("--vocab", required=True,
                    help="llama2.c tokenizer.bin, or a GGUF model to copy "
                         "the vocab from (--copy-vocab-from-model)")
    ap.add_argument("out", help="output GGUF path")
    ap.add_argument("--ctx", type=int, default=None,
                    help="override context_length (default: model seq_len)")
    args = ap.parse_args(argv)
    hdr = convert(args.llama2c_model, args.vocab, args.out, ctx_len=args.ctx)
    print(f"wrote {args.out}: dim={hdr['dim']} layers={hdr['n_layer']} "
          f"heads={hdr['n_head']}/{hdr['n_kv_head']} vocab={hdr['n_vocab']} "
          f"shared_classifier={hdr['shared_classifier']}", file=sys.stderr)


if __name__ == "__main__":
    main()
