"""Merge LoRA adapters into a base GGUF (parity: examples/export-lora):
for every tensor with a matching lora_a/lora_b pair, write
W' = W + (alpha/r * scale) * (b @ a); everything else copies verbatim."""

from __future__ import annotations

import argparse

import numpy as np

from llama_kotlin_tpu.gguf import GGUFFile, GGUFWriter
from llama_kotlin_tpu.models.lora import LoraAdapter
from llama_kotlin_tpu.quant import numpy_ref
from llama_kotlin_tpu.quant.formats import GGMLQuantType, TYPE_TRAITS


def export_lora(base_path: str, out_path: str, adapters: list[tuple[str, float]],
                out_type: GGMLQuantType = GGMLQuantType.F16) -> int:
    """Returns the number of merged tensors."""
    loaded = [(LoraAdapter.load(p), s) for p, s in adapters]
    src = GGUFFile(base_path)
    w = GGUFWriter()
    for key, value in src.metadata.items():
        if key == "general.alignment":
            continue
        try:
            w.add_kv(key, value)
        except TypeError:
            pass
    merged = 0
    for name, info in src.tensors.items():
        deltas = []
        for ad, scale in loaded:
            ab = ad.tensors.get(name)
            if ab is not None:
                a, b = ab
                deltas.append((scale * ad.alpha / max(a.shape[0], 1)) *
                              (b.astype(np.float32) @ a.astype(np.float32)))
        if not deltas:
            # copy wire bytes untouched
            w.add_tensor(name, np.frombuffer(src.tensor_data(name), np.uint8),
                         info.ggml_type, raw_shape=tuple(info.shape))
            continue
        np_shape = tuple(reversed(info.shape))
        x = numpy_ref.dequantize(src.tensor_data(name), info.ggml_type,
                                 shape=np_shape).astype(np.float32)
        for d in deltas:
            x = x + d.reshape(x.shape)
        t = out_type
        if x.ndim == 1 or not TYPE_TRAITS[t].is_quantized and t not in (
                GGMLQuantType.F16, GGMLQuantType.BF16, GGMLQuantType.F32):
            t = GGMLQuantType.F32
        if TYPE_TRAITS[t].is_quantized and x.shape[-1] % TYPE_TRAITS[t].block_size:
            t = GGMLQuantType.F32
        w.add_tensor(name, x, t)
        merged += 1
    src.close()
    w.write(out_path)
    return merged


def main(argv=None):
    ap = argparse.ArgumentParser(description="merge LoRA adapters into a GGUF")
    ap.add_argument("--model", "-m", required=True, help="base model GGUF")
    ap.add_argument("--output", "-o", required=True)
    ap.add_argument("--lora", action="append", default=[],
                    help="adapter GGUF (repeatable)")
    ap.add_argument("--lora-scaled", action="append", nargs=2, default=[],
                    metavar=("PATH", "SCALE"))
    ap.add_argument("--outtype", default="f16", choices=["f16", "f32"])
    args = ap.parse_args(argv)
    adapters = [(p, 1.0) for p in args.lora]
    adapters += [(p, float(s)) for p, s in args.lora_scaled]
    if not adapters:
        ap.error("need at least one --lora")
    t = GGMLQuantType.F16 if args.outtype == "f16" else GGMLQuantType.F32
    n = export_lora(args.model, args.output, adapters, t)
    print(f"merged {n} tensors -> {args.output}")


if __name__ == "__main__":
    main()
