"""Round-5 e2e decode A/B sweep: XLA compiler knobs x kernel block sizes
around the current kernel mix (VERDICT r4 task 1).  Each config spawns
`trace_decode.py --out none` (timing-only warm loops, compile-cached) and
records the best t/s.  Serialized — the TPU is single-tenant.

Usage: timeout 5400 python scripts/opt_sweep.py [--steps 32]
Appends JSONL rows to scripts/tune_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

BASE_OPTS = ("xla_tpu_scoped_vmem_limit_kib=98304,"
             "xla_tpu_async_copy_bandwidth_scaling_factor=2.0")

CONFIGS = [
    # (label, LKTPU_XLA_OPTS, extra env)
    ("base", BASE_OPTS, {}),
    ("vmem64", "xla_tpu_scoped_vmem_limit_kib=65536,"
               "xla_tpu_async_copy_bandwidth_scaling_factor=2.0", {}),
    ("vmem112", "xla_tpu_scoped_vmem_limit_kib=114688,"
                "xla_tpu_async_copy_bandwidth_scaling_factor=2.0", {}),
    ("bw4", "xla_tpu_scoped_vmem_limit_kib=98304,"
            "xla_tpu_async_copy_bandwidth_scaling_factor=4.0", {}),
    ("bw8", "xla_tpu_scoped_vmem_limit_kib=98304,"
            "xla_tpu_async_copy_bandwidth_scaling_factor=8.0", {}),
    ("bw1", "xla_tpu_scoped_vmem_limit_kib=98304,"
            "xla_tpu_async_copy_bandwidth_scaling_factor=1.0", {}),
    ("ffnbf2048", BASE_OPTS, {"LKTPU_FFN_BF_COMPACT": "2048"}),
    ("ffnvmem64", BASE_OPTS, {"LKTPU_FFN_VMEM_MB": "64"}),
    ("bkc4096", BASE_OPTS, {"LKTPU_W4_BKC": "4096,2048,1024,512"}),
    ("bn1024", BASE_OPTS, {"LKTPU_W4_BN": "1024,512,256,128"}),
    ("bcast", BASE_OPTS, {"LKTPU_W4_BCAST": "1"}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--preset", default="llama3-8b")
    args = ap.parse_args()
    results = []
    out_path = ROOT / "scripts" / "tune_results.json"
    for label, opts, extra in CONFIGS:
        env = dict(os.environ)
        env["LKTPU_XLA_OPTS"] = opts
        env.update(extra)
        t0 = time.time()
        best = None
        err_txt = ""
        try:
            p = subprocess.run(
                [sys.executable, str(ROOT / "scripts" / "trace_decode.py"),
                 "--preset", args.preset, "--steps", str(args.steps),
                 "--out", "none"],
                env=env, capture_output=True, text=True, timeout=1500)
            for line in p.stdout.splitlines():
                if line.startswith("best:"):
                    best = float(line.split()[1])
            err_txt = (p.stdout + p.stderr)[-300:]
        except subprocess.TimeoutExpired:
            # a hung config (the tunnel can wedge) must not kill the sweep
            err_txt = "timeout"
        row = {"kind": "e2e_opt_sweep", "label": label, "tps": best,
               "wall_s": round(time.time() - t0, 1),
               "t": time.strftime("%H:%M:%S")}
        if best is None:
            row["err"] = err_txt
        results.append(row)
        print(json.dumps(row), flush=True)
        with out_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
    good = [r for r in results if r["tps"]]
    if good:
        best = max(good, key=lambda r: r["tps"])
        print(json.dumps({"kind": "e2e_opt_sweep", "winner": best["label"],
                          "tps": best["tps"]}))


if __name__ == "__main__":
    main()
