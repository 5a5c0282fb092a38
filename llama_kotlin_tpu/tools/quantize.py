"""Model quantization tool: GGUF -> GGUF requant.

Parity target: examples/quantize/quantize.cpp + the per-tensor type
selection heuristics of llama_model_quantize_internal /
llama_tensor_get_type (reference src/llama.cpp:16353-16695): attn_v and
ffn_down get extra bits in the *_M mixes, output.weight is kept at Q6_K,
embeddings quantize lighter, 1D tensors (norms) stay f32.  Supports
importance-matrix weighting hooks (imatrix collection in tools/imatrix.py).

Usage:
    python -m llama_kotlin_tpu.tools.quantize input.gguf output.gguf Q4_K_M
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from llama_kotlin_tpu.gguf import GGUFFile, GGUFWriter
from llama_kotlin_tpu.quant import numpy_ref
from llama_kotlin_tpu.quant.formats import GGMLQuantType, NAME_TO_TYPE, TYPE_TRAITS

# file-type mixes (cf. the ftype table quantize.cpp:19-53)
FTYPES = {
    "Q4_0": GGMLQuantType.Q4_0,
    "Q4_1": GGMLQuantType.Q4_1,
    "Q5_0": GGMLQuantType.Q5_0,
    "Q5_1": GGMLQuantType.Q5_1,
    "Q8_0": GGMLQuantType.Q8_0,
    "Q2_K": GGMLQuantType.Q2_K,
    "Q3_K_S": GGMLQuantType.Q3_K,
    "Q3_K_M": GGMLQuantType.Q3_K,
    "Q4_K_S": GGMLQuantType.Q4_K,
    "Q4_K_M": GGMLQuantType.Q4_K,
    "Q5_K_S": GGMLQuantType.Q5_K,
    "Q5_K_M": GGMLQuantType.Q5_K,
    "Q6_K": GGMLQuantType.Q6_K,
    "IQ2_XXS": GGMLQuantType.IQ2_XXS,
    "IQ2_XS": GGMLQuantType.IQ2_XS,
    "IQ3_XXS": GGMLQuantType.IQ3_XXS,
    "IQ3_S": GGMLQuantType.IQ3_S,
    "IQ4_NL": GGMLQuantType.IQ4_NL,
    "IQ4_XS": GGMLQuantType.IQ4_XS,
    "F16": GGMLQuantType.F16,
    "BF16": GGMLQuantType.BF16,
    "F32": GGMLQuantType.F32,
}


def tensor_get_type(name: str, default: GGMLQuantType, ftype: str,
                    n_expert: int = 0) -> GGMLQuantType:
    """Per-tensor type heuristics (cf. llama_tensor_get_type)."""
    is_m = ftype.endswith("_M")
    if name == "output.weight" and TYPE_TRAITS[default].is_quantized:
        # keep the lm head at >= 6 bits (quantize.cpp keeps Q6_K)
        if default in (GGMLQuantType.Q2_K, GGMLQuantType.Q3_K, GGMLQuantType.Q4_K,
                       GGMLQuantType.Q5_K, GGMLQuantType.Q4_0, GGMLQuantType.Q4_1,
                       GGMLQuantType.Q5_0, GGMLQuantType.Q5_1):
            return GGMLQuantType.Q6_K
    iq_low = (GGMLQuantType.IQ2_XXS, GGMLQuantType.IQ2_XS,
              GGMLQuantType.IQ3_XXS)
    if name == "output.weight" and default in iq_low + (GGMLQuantType.IQ3_S,):
        return GGMLQuantType.Q5_K  # lm head stays high-bit (cf. quantize.cpp)
    if name == "token_embd.weight" and default in iq_low:
        return GGMLQuantType.Q4_K
    if name == "token_embd.weight" and default == GGMLQuantType.Q2_K:
        return GGMLQuantType.Q4_K  # embeddings suffer at 2 bits
    if ".attn_v.weight" in name and is_m:
        bump = {GGMLQuantType.Q2_K: GGMLQuantType.Q4_K,
                GGMLQuantType.Q3_K: GGMLQuantType.Q5_K,
                GGMLQuantType.Q4_K: GGMLQuantType.Q6_K,
                GGMLQuantType.Q5_K: GGMLQuantType.Q6_K}
        return bump.get(default, default)
    if ".ffn_down" in name and is_m:
        bump = {GGMLQuantType.Q3_K: GGMLQuantType.Q4_K,
                GGMLQuantType.Q4_K: GGMLQuantType.Q6_K}
        return bump.get(default, default)
    return default


def _imatrix_key(tensor_name: str) -> str | None:
    """GGUF tensor name -> imatrix collection key (models/llama.py record
    sites tag each linear's INPUT, so siblings sharing an input share an
    entry — attn q/k/v map to attn_qkv, gate/up to ffn_gate_up)."""
    if not tensor_name.startswith("blk.") or not tensor_name.endswith(".weight"):
        return None
    stem = tensor_name[:-len(".weight")]
    blk, idx, kind = stem.split(".", 2)
    kind = {"attn_q": "attn_qkv", "attn_k": "attn_qkv", "attn_v": "attn_qkv",
            "attn_qkv": "attn_qkv", "attn_output": "attn_output",
            "ffn_gate": "ffn_gate_up", "ffn_up": "ffn_gate_up",
            "ffn_down": "ffn_down"}.get(kind)
    return None if kind is None else f"blk.{idx}.{kind}"


def quantize_model(in_path: str, out_path: str, ftype: str,
                   imatrix: dict | None = None, progress=None) -> dict:
    target = FTYPES[ftype.upper()]
    src = GGUFFile(in_path)
    w = GGUFWriter()
    for key, value in src.metadata.items():
        if key == "general.alignment":
            continue
        try:
            w.add_kv(key, value)
        except TypeError:
            w.add_kv(key, str(value))
    w.add_kv("general.file_type", np.uint32(int(target)))

    stats = {"in_bytes": 0, "out_bytes": 0, "tensors": 0}
    names = list(src.tensors)
    for idx, name in enumerate(names):
        info = src.tensors[name]
        stats["in_bytes"] += info.n_bytes
        np_shape = tuple(reversed(info.shape))
        # 1D tensors and norms stay f32; only 2D matmul weights quantize
        if len(np_shape) < 2 or not TYPE_TRAITS[target].is_quantized:
            out_type = target if len(np_shape) >= 2 else GGMLQuantType.F32
        else:
            out_type = tensor_get_type(name, target, ftype.upper())
            if np_shape[-1] % TYPE_TRAITS[out_type].block_size != 0:
                out_type = GGMLQuantType.F16  # unquantizable row size
        data = src.tensor_float(name)
        qw = None
        if imatrix is not None and TYPE_TRAITS[out_type].is_quantized:
            key = _imatrix_key(name)
            ent = imatrix.get(key) if key else None
            if ent is not None and np.asarray(ent).size == np_shape[-1]:
                qw = np.asarray(ent, np.float32)
        wire = numpy_ref.quantize(data, out_type, qw=qw)  # uint8 wire bytes
        w.add_tensor(name, wire, ggml_type=out_type, raw_shape=info.shape)
        stats["out_bytes"] += wire.size
        stats["tensors"] += 1
        if progress:
            progress(idx + 1, len(names), name, out_type)
    src.close()
    w.write(out_path)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("ftype", choices=sorted(FTYPES), type=str.upper)
    ap.add_argument("--imatrix", help="importance matrix npz "
                                      "(tools/imatrix.py output)")
    args = ap.parse_args()
    t0 = time.time()

    def progress(i, n, name, out_type):
        sys.stderr.write(f"[{i}/{n}] {name} -> {TYPE_TRAITS[out_type].name}\n")

    im = dict(np.load(args.imatrix)) if args.imatrix else None
    stats = quantize_model(args.input, args.output, args.ftype,
                           imatrix=im, progress=progress)
    mb = 1024 * 1024
    print(f"quantized {stats['tensors']} tensors: "
          f"{stats['in_bytes']/mb:.1f} MiB -> {stats['out_bytes']/mb:.1f} MiB "
          f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
