"""GGUF utilities: inspect, split, merge, hash.

Parity targets: examples/gguf (read/write demo), examples/gguf-split
(shard split/merge with `split.no`/`split.count`/`split.tensors.count`
metadata), examples/gguf-hash (content hashing per tensor + overall).

Usage:
    python -m llama_kotlin_tpu.tools.gguf_tools show model.gguf
    python -m llama_kotlin_tpu.tools.gguf_tools split model.gguf out --max-tensors 32
    python -m llama_kotlin_tpu.tools.gguf_tools merge out-00001-of-00003.gguf merged.gguf
    python -m llama_kotlin_tpu.tools.gguf_tools hash model.gguf
"""

from __future__ import annotations

import argparse
import hashlib
import re
import sys
from pathlib import Path

import numpy as np

from llama_kotlin_tpu.gguf import GGUFFile, GGUFWriter
from llama_kotlin_tpu.quant.formats import TYPE_TRAITS

SHARD_RE = re.compile(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$")


def show(path: str) -> None:
    with GGUFFile(path) as f:
        print(f"{f!r}")
        print(f"alignment={f.alignment} data_offset={f.data_offset}")
        for k, v in f.metadata.items():
            vs = str(v)
            if len(vs) > 80:
                vs = f"<{len(v)} items>" if hasattr(v, "__len__") else vs[:77] + "..."
            print(f"  kv {k} = {vs}")
        for name, info in f.tensors.items():
            print(f"  tensor {name} {TYPE_TRAITS[info.ggml_type].name} "
                  f"ne={list(info.shape)} bytes={info.n_bytes}")


def split(path: str, out_prefix: str, max_tensors: int = 128) -> list[str]:
    src = GGUFFile(path)
    names = list(src.tensors)
    n_shards = (len(names) + max_tensors - 1) // max_tensors
    outs = []
    for s in range(n_shards):
        w = GGUFWriter()
        if s == 0:  # first shard carries the full metadata
            for k, v in src.metadata.items():
                if k == "general.alignment":
                    continue
                try:
                    w.add_kv(k, v)
                except TypeError:
                    w.add_kv(k, str(v))
        w.add_kv("split.no", np.uint16(s))
        w.add_kv("split.count", np.uint16(n_shards))
        w.add_kv("split.tensors.count", np.int32(len(names)))
        for name in names[s * max_tensors : (s + 1) * max_tensors]:
            info = src.tensors[name]
            w.add_tensor(name, src.tensor_data(name).copy(), ggml_type=info.ggml_type,
                         raw_shape=info.shape)
        out = f"{out_prefix}-{s+1:05d}-of-{n_shards:05d}.gguf"
        w.write(out)
        outs.append(out)
    src.close()
    return outs


def shard_paths(first: str) -> list[str]:
    m = SHARD_RE.match(Path(first).name)
    if not m:
        return [first]
    base, _, count = m.groups()
    parent = Path(first).parent
    return [str(parent / f"{base}-{i+1:05d}-of-{int(count):05d}.gguf")
            for i in range(int(count))]


def merge(first_shard: str, out_path: str) -> None:
    paths = shard_paths(first_shard)
    w = GGUFWriter()
    meta_done = False
    for p in paths:
        with GGUFFile(p) as f:
            if not meta_done:
                for k, v in f.metadata.items():
                    if k.startswith("split.") or k == "general.alignment":
                        continue
                    try:
                        w.add_kv(k, v)
                    except TypeError:
                        w.add_kv(k, str(v))
                meta_done = True
            for name, info in f.tensors.items():
                w.add_tensor(name, f.tensor_data(name).copy(), ggml_type=info.ggml_type,
                             raw_shape=info.shape)
    w.write(out_path)


def hash_file(path: str, algo: str = "sha256") -> dict[str, str]:
    out = {}
    overall = hashlib.new(algo)
    with GGUFFile(path) as f:
        for name in f.tensors:
            h = hashlib.new(algo)
            data = f.tensor_data(name)
            h.update(data)
            overall.update(data)
            out[name] = h.hexdigest()
    out["__overall__"] = overall.hexdigest()
    return out


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("show"); p.add_argument("path")
    p = sub.add_parser("split"); p.add_argument("path"); p.add_argument("out_prefix")
    p.add_argument("--max-tensors", type=int, default=128)
    p = sub.add_parser("merge"); p.add_argument("first_shard"); p.add_argument("out")
    p = sub.add_parser("hash"); p.add_argument("path"); p.add_argument("--algo", default="sha256")
    args = ap.parse_args()
    if args.cmd == "show":
        show(args.path)
    elif args.cmd == "split":
        for o in split(args.path, args.out_prefix, args.max_tensors):
            print(o)
    elif args.cmd == "merge":
        merge(args.first_shard, args.out)
        print(args.out)
    elif args.cmd == "hash":
        for name, h in hash_file(args.path, args.algo).items():
            print(f"{h}  {name}")


if __name__ == "__main__":
    main()
