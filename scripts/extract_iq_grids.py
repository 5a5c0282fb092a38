"""Extract the IQ-quant codebook grids from the reference's ggml-common.h
into a binary .npz consumed by llama_kotlin_tpu/quant/iq.py.

The grids (iq2xxs/iq2xs/iq2s/iq3xxs/iq3s/iq1s) are *trained codebooks* —
functional wire-format constants every compatible decoder must share,
exactly like a codec's quantization tables.  They are data, not code;
this script records their provenance (reference ggml/src/ggml-common.h:
494-1571) and regenerates quant/iq_grids.npz from a reference checkout.

Usage: python scripts/extract_iq_grids.py [ref_ggml_common_h] [out_npz]
"""

from __future__ import annotations

import re
import sys

import numpy as np

TABLES = {
    "iq2xxs_grid": (np.uint64, 256),
    "iq2xs_grid": (np.uint64, 512),
    "iq2s_grid": (np.uint64, 1024),
    "iq3xxs_grid": (np.uint32, 256),
    "iq3s_grid": (np.uint32, 512),
    "iq1s_grid": (np.uint64, 2048),  # NGRID_IQ1S
}


def extract(src_path: str) -> dict[str, np.ndarray]:
    text = open(src_path).read()
    out = {}
    for name, (dtype, count) in TABLES.items():
        m = re.search(
            rf"GGML_TABLE_BEGIN\(uint\d+_t,\s*{name}\s*,\s*\w+\)(.*?)GGML_TABLE_END\(\)",
            text, re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found in {src_path}")
        vals = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+", m.group(1))]
        if len(vals) != count:
            raise SystemExit(f"{name}: expected {count} entries, got {len(vals)}")
        out[name] = np.array(vals, dtype=dtype)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ggml/src/ggml-common.h"
    dst = sys.argv[2] if len(sys.argv) > 2 else "llama_kotlin_tpu/quant/iq_grids.npz"
    tables = extract(src)
    np.savez_compressed(dst, **tables)
    for k, v in tables.items():
        print(f"{k}: {v.shape} {v.dtype}")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
