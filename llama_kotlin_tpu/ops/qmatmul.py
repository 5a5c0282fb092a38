"""Quantized matmul: y = x @ W^T with W a QTensor (or plain array).

Two code paths:
- reference/jnp: dequantize to the compute dtype, then jnp.dot (XLA).  Used
  on CPU, for tests, and as the fallback.
- Pallas TPU kernel (ops/pallas/qmm.py): streams packed codes HBM->VMEM,
  dequantizes in-registers and feeds the MXU, avoiding materialising the
  dequantized weights in HBM.  Activated for TPU backends when shapes
  qualify; cross-checked against this path by tests/test_ops.py.

Replaces the reference's per-format ``ggml_vec_dot_*`` CPU hot loops
(ggml/src/ggml-quants.c) and tinyBLAS prompt-processing matmul
(ggml/src/llamafile/sgemm.cpp) with a single MXU-shaped design.
"""

from __future__ import annotations

import os
from dataclasses import replace as _dc_replace
from typing import Optional, Union

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import PartitionSpec as P

from llama_kotlin_tpu.quant.qtensor import QTensor, SPAN, dequantize

Weight = Union[QTensor, jax.Array]


class StackedSlice:
    """Deferred layer selection on stacked [L, ...] weights (scan path).

    Resolved by plain leading-axis indexing.  A zero-copy scalar-prefetch
    kernel variant (qmm_stacked) was built and device-measured ~20x SLOWER
    than sliced qmm — prefetched block indices defeat Mosaic's pipelining —
    so it was removed; see git history (ops/pallas/qmm_stacked.py) for the
    measurement context.
    """

    def __init__(self, w, index):
        self.w = w
        self.index = index


def _interpret_forced() -> bool:
    """LKTPU_FORCE_PALLAS_INTERPRET=1 runs every Pallas kernel in interpret
    mode even on CPU — used by tests and the multichip dryrun to exercise
    the REAL kernel dispatch (incl. the shard_map TP path) without TPU
    hardware."""
    return bool(os.environ.get("LKTPU_FORCE_PALLAS_INTERPRET"))


def _w4_bmax() -> int:
    """Decode-row count above which W4 dispatch switches to the Q8F shadow
    fold when one is attached (see quant/fold.attach_q8).  Default from the
    round-5 device b-sweep (STATUS.md); LKTPU_W4_BMAX overrides."""
    return int(os.environ.get("LKTPU_W4_BMAX", "8"))


def _use_pallas() -> bool:
    if _interpret_forced():
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _pallas_dispatch(x: jnp.ndarray, w: QTensor, compute_dtype) -> Optional[jnp.ndarray]:
    """Kernel-only dispatch chain (no dequant fallback): W4 block-diagonal
    -> W8 block-diagonal -> Q8F flat -> fused dequant prefill.  Returns
    None when no kernel takes the shapes."""
    itp = _interpret_forced()
    if w.hi_signed:
        aux = w.aux or {}
        if "q8_codes" in aux:
            # high-batch switch (quant/fold.attach_q8): above LKTPU_W4_BMAX
            # decode rows the block-diagonal kernel's 16x MXU row redundancy
            # is compute-bound; route to the dense HBM-bound Q8F kernel.
            # Capped at 256 rows so real prefill keeps the fused dequant
            # path (weights stream once per many rows there).
            b_rows = 1
            for d in x.shape[:-1]:
                b_rows *= int(d)
            if _w4_bmax() < b_rows <= 256:
                from llama_kotlin_tpu.ops.pallas.qmm_int8 import \
                    qmm_int8_or_none
                from llama_kotlin_tpu.quant.formats import GGMLQuantType

                q8 = QTensor(codes=aux["q8_codes"], g_scale=aux["q8_scale"],
                             g_min=None, sb_scale=None, sb_min=None,
                             qtype=GGMLQuantType.Q8_0, bits=8,
                             group_size=SPAN, code_offset=0, shape=w.shape)
                y = qmm_int8_or_none(x, q8, interpret=itp)
                if y is not None:
                    return y
        from llama_kotlin_tpu.ops.pallas.qmm_w4 import qmm_w4_or_none

        y = qmm_w4_or_none(x, w, interpret=itp)
        if y is not None:
            return y
    if w.aux is not None and "scw" in w.aux:
        from llama_kotlin_tpu.ops.pallas.qmm_w8 import qmm_w8_or_none

        y = qmm_w8_or_none(x, w, interpret=itp)
        if y is not None:
            return y
    if w.bits == 8 and w.group_size == 256 and w.g_min is None \
            and w.sb_scale is None:
        from llama_kotlin_tpu.ops.pallas.qmm_int8 import qmm_int8_or_none

        y = qmm_int8_or_none(x, w, interpret=itp)
        if y is not None:
            return y
    from llama_kotlin_tpu.ops.pallas.qmm import qmm_pallas_or_none

    return qmm_pallas_or_none(x, w, compute_dtype=compute_dtype, interpret=itp)


def _w_specs(w: QTensor, axis: int):
    """PartitionSpec pytree matching `w` for shard_map: main arrays are
    [n, k/x] (spec follows `axis`); rank-2 aux planes are TRANSPOSED
    ([G-ish, n], parallel/sharding._put) so their spec swaps; rank-3
    compact aux planes are [section, G-ish, n]; scalars replicate."""
    main = ("tp", None) if axis == 0 else (None, "tp")
    auxs = (None, "tp") if axis == 0 else ("tp", None)
    aux3 = (None,) + auxs

    def spec_fn(path, a):
        nd = getattr(a, "ndim", 0)
        is_aux = bool(path) and getattr(path[0], "name", None) == "aux"
        if is_aux and str(getattr(path[-1], "key", "")).startswith("q8_"):
            return P(*main)  # Q8F shadow planes are main-oriented [n, .]
        if is_aux and nd == 3:
            return P(*aux3)
        if nd != 2:
            return P()
        return P(*(auxs if is_aux else main))

    return jtu.tree_map_with_path(spec_fn, w)


def _localize_abstract(w: QTensor, tp: int, axis: int) -> QTensor:
    """Abstract (ShapeDtypeStruct-leaved) QTensor with per-shard local
    shapes, used to pre-check kernel eligibility via jax.eval_shape."""

    def loc(path, a):
        nd = getattr(a, "ndim", 0)
        is_aux = bool(path) and getattr(path[0], "name", None) == "aux"
        if is_aux and str(getattr(path[-1], "key", "")).startswith("q8_"):
            s = list(a.shape)  # main-oriented [n, .]; only col splits exist
            s[axis] //= tp
            return jax.ShapeDtypeStruct(tuple(s), a.dtype)
        if is_aux and nd == 3:  # compact planes [section, G-ish, n]
            s = list(a.shape)
            s[2 - axis] //= tp
            return jax.ShapeDtypeStruct(tuple(s), a.dtype)
        if nd != 2:
            return jax.ShapeDtypeStruct(getattr(a, "shape", ()), a.dtype)
        ax = (1 - axis) if is_aux else axis
        s = list(a.shape)
        s[ax] //= tp
        return jax.ShapeDtypeStruct(tuple(s), a.dtype)

    t = jtu.tree_map_with_path(loc, w)
    n, k = w.shape
    local = (n // tp, k) if axis == 0 else (n, k // tp)
    return _dc_replace(t, shape=local, tp_axis=None)


def _tp_qmatmul(x: jnp.ndarray, w: QTensor, *, compute_dtype) -> Optional[jnp.ndarray]:
    """Run the Pallas fast-path kernels per-shard under jax.shard_map for a
    TP-sharded weight (w.tp_axis set by parallel/sharding.py).

    XLA's SPMD partitioner cannot split a Pallas custom call, so without
    this wrapper sharded serving silently falls back to the slow dequant
    path (the reference runs its hot loop on every backend under every
    split mode, ggml-backend.c:1258-1841 — this is the TPU equivalent).

    Column parallel (tp_axis=0): x replicated, each shard computes its
    n/tp output slice, output sharded on the last axis — no collective.
    Row parallel (tp_axis=1): x split on k, partial products psum over
    the tp axis (Megatron row-parallel).  Returns None when the mesh is
    absent or no kernel would take the local shard shapes (caller then
    uses the global XLA dequant path, numerics-identical to today's
    sharded fallback)."""
    from llama_kotlin_tpu.parallel.mesh import get_active_mesh

    mesh = get_active_mesh()
    if mesh is None:
        return None
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
    if tp <= 1 and not (tp == 1 and os.environ.get("LKTPU_TP_PROVE1") == "1"):
        # LKTPU_TP_PROVE1: run the shard_map wrapper over a 1-device mesh —
        # no-op numerically, but proves Mosaic compiles the kernels under
        # shard_map on real hardware and measures the dispatch overhead
        # (scripts/tp_onchip.py; real multi-chip is unavailable here)
        return None
    axis = w.tp_axis
    n, k = w.shape
    if x.shape[-1] != k:
        return None
    if axis == 0:
        if n % tp:
            return None
    else:
        # row shards split the contraction: shard boundaries must align
        # with the 256-element span structure, and x's logical k must equal
        # the padded k so x and codes split congruently
        if w.k_pad != k or k % tp or (k // tp) % SPAN:
            return None
    w_abs = _localize_abstract(w, tp, axis)
    xk = k // tp if axis == 1 else k
    x_abs = jax.ShapeDtypeStruct(x.shape[:-1] + (xk,), x.dtype)
    try:
        ok = jax.eval_shape(
            lambda xx, ww: _pallas_dispatch(xx, ww, compute_dtype),
            x_abs, w_abs) is not None
    except Exception:
        ok = False
    if not ok:
        return None  # keep sharded/unsharded numerics aligned per mode

    local_shape = w_abs.shape

    def f(xl, wl):
        wl = _dc_replace(wl, shape=local_shape, tp_axis=None)
        y = _pallas_dispatch(xl, wl, compute_dtype)
        if y is None:  # unreachable (eval_shape-gated); stay correct anyway
            y = jnp.dot(xl.astype(compute_dtype),
                        dequantize(wl, dtype=compute_dtype).T,
                        preferred_element_type=jnp.float32)
        if axis == 1:
            y = jax.lax.psum(y, "tp")
        return y

    nd = x.ndim
    if axis == 0:
        x_spec = P(*((None,) * nd))
        out_spec = P(*((None,) * (nd - 1)), "tp")
    else:
        x_spec = P(*((None,) * (nd - 1)), "tp")
        out_spec = P(*((None,) * nd))
    fn = jax.shard_map(f, mesh=mesh, in_specs=(x_spec, _w_specs(w, axis)),
                       out_specs=out_spec, check_vma=False)
    return fn(x, w)


def qmm_ffn(x: jnp.ndarray, gu: Weight, dn: Weight,
            act: str = "silu", up: Optional[Weight] = None) -> Optional[jnp.ndarray]:
    """Fused gated-FFN fast path: act(x@gate^T)*(x@up^T) @ down^T in ONE
    Pallas launch (ops/pallas/qmm_w4_ffn.py) — gate|up|down weights stream
    through a single pipelined grid and the intermediate h never leaves
    VMEM.  Returns None when ineligible (caller uses the two-launch path;
    numerics match it bit-for-bit, see the kernel docstring).

    `up=None`: gu is the single-chip fused [gate; up] tensor.  `up` given:
    gu is gate, both [F, E] — the layout TP loads use (loader fuses only
    at tp==1).  When the three tensors carry tp_axis markers the megakernel
    dispatches PER SHARD under jax.shard_map (+psum over the row-parallel
    down), so multi-chip serving runs the same full-speed kernel as the
    single-chip headline (cf. reference row-split mode carrying its
    full-speed kernels, src/llama.cpp:3216-3289)."""
    if not (isinstance(gu, QTensor) and isinstance(dn, QTensor)):
        return None
    if up is not None and not isinstance(up, QTensor):
        return None
    if os.environ.get("LKTPU_FFN_FUSED", "1") == "0":
        return None  # A/B knob: fall back to the two-launch path
    if not _use_pallas():
        return None
    if "q8_codes" in (gu.aux or {}):
        # high-batch switch: above LKTPU_W4_BMAX rows the megakernel's
        # block-diagonal MXU redundancy loses to pairwise dense Q8F
        # matmuls — decline so the caller's two-launch path routes there
        b_rows = 1
        for d in x.shape[:-1]:
            b_rows *= int(d)
        if b_rows > _w4_bmax():
            return None
    from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import qmm_w4_ffn_or_none

    if gu.tp_axis is not None or dn.tp_axis is not None \
            or (up is not None and up.tp_axis is not None):
        return _tp_qmm_ffn(x, gu, dn, up, act)
    return qmm_w4_ffn_or_none(x, gu, dn, act=act, up=up,
                              interpret=_interpret_forced())


def qmm_layer(attn: jnp.ndarray, h_resid: jnp.ndarray, wo: Weight,
              gu: Weight, dn: Weight, norm_w, *, eps: float,
              act: str = "silu",
              norm_offset: float = 0.0) -> Optional[jnp.ndarray]:
    """Fused post-attention layer half: h3 = h2 + FFN(rmsnorm(h2)) with
    h2 = h_resid + attn @ Wo^T, in ONE Pallas launch (ops/pallas/
    qmm_w4_ffn.qmm_w4_layer_matmul) — removes the o launch's ramp and the
    o→FFN XLA seam from the decode critical path.  Returns None when
    ineligible (caller runs the separate o + FFN path, numerics-faithful;
    see the kernel docstring for the exact parity contract)."""
    if not (isinstance(wo, QTensor) and isinstance(gu, QTensor)
            and isinstance(dn, QTensor)):
        return None
    if os.environ.get("LKTPU_LAYER_FUSED", "0") != "1":
        # DEFAULT OFF — measured negative on v5e (round-5 A/B: fused
        # 127.2 vs separate 129.16 t/s on the 8B headline; standalone
        # microbench 0.188 vs 0.182 ms).  The round-4 in-kernel prep
        # already removed the o->FFN glue the fusion targeted, and XLA's
        # cross-iteration prefetch overlaps separate launches as well as
        # one big grid; the fused kernel's coarser o blocking loses ~3%.
        # Kept behind LKTPU_LAYER_FUSED=1 for other topologies.
        return None
    if not _use_pallas():
        return None
    if "q8_codes" in (gu.aux or {}):
        b_rows = 1
        for d in attn.shape[:-1]:
            b_rows *= int(d)
        if b_rows > _w4_bmax():
            return None  # high-batch switch: pairwise Q8F matmuls
    from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import qmm_w4_layer_or_none

    return qmm_w4_layer_or_none(attn, h_resid, wo, gu, dn, norm_w,
                                eps=eps, act=act, norm_offset=norm_offset,
                                interpret=_interpret_forced())


def _tp_qmm_ffn(x: jnp.ndarray, gate: QTensor, dn: QTensor,
                up: Optional[QTensor], act: str) -> Optional[jnp.ndarray]:
    """FFN megakernel under a tp mesh: gate/up column-parallel (tp_axis=0),
    down row-parallel (tp_axis=1) — each shard holds a complete gated FFN
    over its F/tp hidden columns (gate/up row-shard s and down
    column-shard s cover the SAME f-block), so the local megakernel output
    psums to the exact full FFN.  Needs the separate-tensor layout: a
    fused [gate; up] tensor row-shards into all-gate/all-up halves."""
    from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import (qmm_w4_ffn_matmul,
                                                        qmm_w4_ffn_or_none)
    from llama_kotlin_tpu.parallel.mesh import get_active_mesh

    if up is None:
        return None
    mesh = get_active_mesh()
    if mesh is None:
        return None
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
    if tp <= 1 and not (tp == 1 and os.environ.get("LKTPU_TP_PROVE1") == "1"):
        return None
    if gate.tp_axis != 0 or up.tp_axis != 0 or dn.tp_axis != 1:
        return None
    F, E = gate.shape
    if up.shape != (F, E) or dn.shape != (E, F) or x.shape[-1] != E:
        return None
    if F % tp or dn.k_pad != F:
        return None
    g_abs = _localize_abstract(gate, tp, 0)
    u_abs = _localize_abstract(up, tp, 0)
    d_abs = _localize_abstract(dn, tp, 1)
    x_abs = jax.ShapeDtypeStruct(x.shape, x.dtype)
    try:
        ok = jax.eval_shape(
            lambda xx, g, u, d: qmm_w4_ffn_matmul(xx, g, d, up=u, act=act),
            x_abs, g_abs, u_abs, d_abs) is not None
    except Exception:
        ok = False
    if not ok:
        return None
    itp = _interpret_forced()
    g_shape, d_shape = g_abs.shape, d_abs.shape

    def f(xl, gl, ul, dl):
        gl = _dc_replace(gl, shape=g_shape, tp_axis=None)
        ul = _dc_replace(ul, shape=g_shape, tp_axis=None)
        dl = _dc_replace(dl, shape=d_shape, tp_axis=None)
        y = qmm_w4_ffn_or_none(xl, gl, dl, up=ul, act=act, interpret=itp)
        if y is None:  # unreachable (eval_shape-gated); stay correct anyway
            from llama_kotlin_tpu.ops.activations import ACTIVATIONS

            g = jnp.dot(xl, dequantize(gl, dtype=jnp.float32).T)
            u = jnp.dot(xl, dequantize(ul, dtype=jnp.float32).T)
            h = (ACTIVATIONS[act](g) * u).astype(jnp.bfloat16).astype(
                jnp.float32)
            y = jnp.dot(h, dequantize(dl, dtype=jnp.float32).T)
        return jax.lax.psum(y, "tp")

    nd = x.ndim
    x_spec = P(*((None,) * nd))
    fn = jax.shard_map(
        f, mesh=mesh,
        in_specs=(x_spec, _w_specs(gate, 0), _w_specs(up, 0),
                  _w_specs(dn, 1)),
        out_specs=x_spec, check_vma=False)
    return fn(x, gate, up, dn)


def qmatmul(x: jnp.ndarray, w: Weight, *, compute_dtype=jnp.bfloat16,
            allow_pallas: bool = True) -> jnp.ndarray:
    """x [..., k] @ w[n, k]^T -> [..., n].

    Accumulation in f32 (preferred_element_type), inputs cast to
    `compute_dtype` for the MXU.  LoraWeight wrappers add their low-rank
    delta on the fly (cf. llm_build_lora_mm, src/llama.cpp:8515).
    """
    from llama_kotlin_tpu.models.lora import LoraWeight

    if isinstance(w, StackedSlice):
        inner = w.w
        if isinstance(inner, QTensor):
            sliced = jax.tree.map(lambda a: a[w.index], inner)
        elif isinstance(inner, LoraWeight):
            sliced = jax.tree.map(lambda a: a[w.index], inner)
        else:
            sliced = inner[w.index]
        return qmatmul(x, sliced, compute_dtype=compute_dtype, allow_pallas=allow_pallas)
    if isinstance(w, LoraWeight):
        y = qmatmul(x, w.base, compute_dtype=compute_dtype, allow_pallas=allow_pallas)
        xa = jnp.dot(x.astype(compute_dtype), w.a.T.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
        delta = jnp.dot(xa.astype(compute_dtype), w.b.T.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        return y + w.scale * delta
    if isinstance(w, QTensor):
        if allow_pallas and _use_pallas():
            if w.tp_axis is not None and not w.is_stacked:
                y = _tp_qmatmul(x, w, compute_dtype=compute_dtype)
                if y is not None:
                    return y
            else:
                y = _pallas_dispatch(x, w, compute_dtype)
                if y is not None:
                    return y
        wf = dequantize(w, dtype=compute_dtype)
    else:
        wf = w.astype(compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype), wf.T, preferred_element_type=jnp.float32
    )
    return y


def take_rows(w: Weight, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Row gather (embedding lookup) from a possibly-quantized [n, k] weight.

    Equivalent of ggml_get_rows on quantized tensors: gathers the packed
    rows first, dequantizes only the gathered rows.
    """
    from llama_kotlin_tpu.models.lora import LoraWeight

    if isinstance(w, LoraWeight):
        w = w.base  # row gathers bypass LoRA, like ggml_get_rows
    if not isinstance(w, QTensor):
        return w[ids].astype(dtype)
    sub = QTensor(
        codes=w.codes[ids],
        g_scale=w.g_scale[ids],
        g_min=None if w.g_min is None else w.g_min[ids],
        sb_scale=None if w.sb_scale is None else w.sb_scale[ids],
        sb_min=None if w.sb_min is None else w.sb_min[ids],
        qtype=w.qtype, bits=w.bits, group_size=w.group_size,
        code_offset=w.code_offset, shape=(int(ids.shape[0]), w.k),
        hi_signed=w.hi_signed,
    )
    return dequantize(sub, dtype=dtype)
