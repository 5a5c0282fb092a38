"""Tracing/profiling integration (SURVEY §5 aux subsystem).

The reference ships wall-clock timings (llama_print_timings,
common/common.cpp) plus perf counters; on TPU the equivalent evidence is a
DEVICE trace — host-side wall-clock of small async dispatches through the
axon tunnel is unreliable (see TODO.md measurement warning), so the
supported workflow is:

    with device_trace("/tmp/trace"):        # or CLI --profile-dir
        ctx.decode(...)                      # any jitted work
    # -> /tmp/trace/plugins/profile/<ts>/*.xplane.pb, viewable in
    #    TensorBoard / xprof; per-op durations, HBM traffic, MXU util

`annotate(name)` adds named scopes around model stages so kernels show up
as "attn/flash", "ffn/moe" etc. in the trace (and in jaxpr/XLA dumps) —
zero cost outside tracing.

Env toggle: LKTPU_TRACE_DIR=<dir> makes the CLI tools (main, llama_bench)
trace their generation run without a flag (the analogue of the
reference's LLAMA_TRACE env toggle); --profile-dir does the same per-run.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


def annotate(name: str):
    """Named scope for model stages: shows up in device traces, jaxprs and
    XLA HLO names.  Usable as decorator or context manager."""
    import jax

    return jax.named_scope(name)


@contextlib.contextmanager
def device_trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device trace (xplane protobufs under `log_dir`).

    Works on TPU (full device timeline) and CPU backends (host events
    only); view with TensorBoard's profile plugin or xprof."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def env_trace_dir() -> Optional[str]:
    """LKTPU_TRACE_DIR env toggle (empty/unset -> None)."""
    d = os.environ.get("LKTPU_TRACE_DIR", "").strip()
    return d or None


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]) -> Iterator[None]:
    """device_trace(log_dir) when a directory is given, else no-op."""
    if log_dir:
        with device_trace(log_dir):
            yield
    else:
        yield


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: serving restarts skip the
    multi-minute first-compile of the decode buckets (the TPU analogue of
    the reference shipping prebuilt kernels).  Respects an existing
    JAX_COMPILATION_CACHE_DIR; LKTPU_COMPILE_CACHE=0 disables."""
    import jax

    if os.environ.get("LKTPU_COMPILE_CACHE", "1") == "0":
        return
    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.expanduser("~/.cache/llama_kotlin_tpu/xla"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache


# round-5 bench-harness A/B winner (STATUS.md): harness entry points
# setdefault LKTPU_XLA_OPTS from here so knob retunes edit ONE site
DEFAULT_XLA_OPTS = ("xla_tpu_scoped_vmem_limit_kib=98304,"
                    "xla_tpu_async_copy_bandwidth_scaling_factor=8.0")


def default_xla_opts() -> None:
    """setdefault the tuned TPU compiler options into the environment."""
    os.environ.setdefault("LKTPU_XLA_OPTS", DEFAULT_XLA_OPTS)


def compiler_opts():
    """XLA compiler options for the hot jits, from LKTPU_XLA_OPTS
    ("key=value,key=value").  The axon PJRT backend parses and applies
    these server-side (verified round 3: invalid names/values fail the
    remote compile), which is the only way to reach TPU compiler knobs —
    client-side XLA_FLAGS only knows the CPU flag set.  Returns None when
    unset so jit signatures stay cache-stable by default."""
    s = os.environ.get("LKTPU_XLA_OPTS", "")
    if not s:
        return None
    try:
        import jax

        if jax.default_backend() == "cpu":
            # the knobs are TPU-only compile options; the CPU backend
            # rejects them (harness scripts default TPU opts and must
            # still run under the CPU-pinned test/dev flows)
            return None
    except Exception:
        pass
    return dict(kv.split("=", 1) for kv in s.split(","))
