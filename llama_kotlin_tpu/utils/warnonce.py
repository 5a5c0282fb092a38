"""One-time-per-key RuntimeWarnings for silent-perf-cliff fallbacks.

The fast-path kernel dispatchers (ops/pallas/qmm_w4.py, qmm_w4_ffn.py)
decline shapes by returning None, and the callers fall back to slower
paths.  That design keeps dispatch simple, but an *unexpected* decline is
a silent perf regression (round-4 finding: a Mosaic failure in the FFN
megakernel would drop the headline ~25% with no log line).  warn_once
makes the first occurrence of each distinct decline loud without spamming
a hot loop.
"""

from __future__ import annotations

import warnings

_SEEN: set = set()


def warn_once(key, msg: str) -> None:
    """Emit `msg` as a RuntimeWarning the first time `key` is seen."""
    if key in _SEEN:
        return
    _SEEN.add(key)
    warnings.warn(msg, RuntimeWarning, stacklevel=3)
