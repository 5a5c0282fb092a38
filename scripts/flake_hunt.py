"""Flake hunter: run pytest targets repeatedly, keep full output of any
failure (TODO.md flake watch: test_context_shift_*, test_kv_shift, plus
one unidentified round-2 full-suite failure).

Usage:
    python scripts/flake_hunt.py [-n 30] [--full] [targets ...]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DEFAULT_TARGETS = ["tests/test_model.py", "tests/test_kv_quant.py"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=30)
    ap.add_argument("--full", action="store_true", help="run the whole suite")
    ap.add_argument("--out", default="/tmp/flake_hunt")
    ap.add_argument("targets", nargs="*", default=None)
    args = ap.parse_args(argv)
    targets = ["tests/"] if args.full else (args.targets or DEFAULT_TARGETS)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fails = 0
    for i in range(args.n):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", *targets, "-x", "-q"],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
        dt = time.time() - t0
        if r.returncode != 0:
            fails += 1
            log = out / f"fail_{i:03d}.log"
            log.write_text(r.stdout + "\n--- stderr ---\n" + r.stderr)
            print(f"run {i}: FAIL ({dt:.0f}s) -> {log}", flush=True)
        else:
            print(f"run {i}: ok ({dt:.0f}s)", flush=True)
    print(f"{args.n - fails}/{args.n} green")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
