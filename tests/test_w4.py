"""W4A8 fast-mode tests: fold parity and the block-diagonal group-dot
kernel (ops/pallas/qmm_w4.py) against the dequantization reference.

Mirrors the reference's vec-dot testing strategy (test-quantize-fns.cpp:
quant/dequant/vec_dot vs float reference with error budgets) for the
TPU-native W4 layout.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_kotlin_tpu.ops.pallas.qmm_int8 import quantize_activations
from llama_kotlin_tpu.ops.pallas.qmm_w4 import (
    build_sxv,
    build_xbd,
    qmm_w4_matmul,
)
from llama_kotlin_tpu.quant.fold import fold_to_w4, float_to_w4
from llama_kotlin_tpu.quant.formats import GGMLQuantType
from llama_kotlin_tpu.quant.qtensor import dequantize, unpack_codes
from llama_kotlin_tpu.quant.repack import repack_float


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_0,
                                   GGMLQuantType.Q4_1])
def test_fold_to_w4_dequant_parity(rng, qtype):
    """Folding preserves dequantized values up to bf16 scale rounding."""
    n, k = 8, 512
    x = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = repack_float(x, qtype)
    w4 = fold_to_w4(qt)
    assert w4.hi_signed and w4.bits == 4 and w4.group_size == 32
    ref = np.asarray(dequantize(qt, jnp.float32))
    got = np.asarray(dequantize(w4, jnp.float32))
    # bf16 rounding of the folded scale (2^-9 * |q-off| <= 15) and of the
    # folded min m_adj: ~0.6% of full scale worst-case, far below the 4-bit
    # codes' own ~3% quantization noise
    denom = np.abs(ref).max() + 1e-8
    assert np.abs(got - ref).max() / denom < 1e-2
    # code round trip is exact: |codes| <= 15 both nibble planes
    codes = np.asarray(unpack_codes(w4))
    assert codes.min() >= -8 and codes.max() <= 15


def test_xbd_layout(rng):
    """Block-diagonal activations: row r*b+i carries x8[i] on exactly the
    plane columns whose group index (c//32 mod 16) == r."""
    b, k_pad = 8, 1024
    x8 = rng.integers(-127, 128, (b, k_pad), dtype=np.int8)
    xlo, xhi = (np.asarray(a) for a in build_xbd(jnp.asarray(x8), k_pad))
    assert xlo.shape == (16 * b, k_pad // 2)
    spans = k_pad // 256
    planes = x8.reshape(b, spans, 2, 128)
    lo_plane = planes[:, :, 0].reshape(b, -1)
    for c in range(0, k_pad // 2, 32):
        r = (c // 32) % 16
        for i in range(b):
            np.testing.assert_array_equal(xlo[r * b + i, c:c + 32],
                                          lo_plane[i, c:c + 32])
        dead = [rr for rr in range(16) if rr != r]
        assert all(not xlo[rr * b:(rr + 1) * b, c:c + 32].any() for rr in dead)


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_1,
                                   GGMLQuantType.Q4_0])  # Q4_0 = sym path
@pytest.mark.parametrize("shape", [(128, 1024), (256, 2048),
                                   # chunk-UNALIGNED k (llama2-7b n_ff
                                   # 11008 class): fold pads to ALIGN_W4
                                   # with zero scales, kernel must accept
                                   (128, 2816)])
def test_qmm_w4_kernel_matches_reference(rng, qtype, shape):
    """Kernel (interpret mode) vs dequantized matmul on the SAME quantized
    activations — agreement to f32 accumulation order."""
    n, k = shape
    b = 3
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    w4 = fold_to_w4(repack_float(wf, qtype))
    x = (rng.standard_normal((b, k)) * 0.7).astype(np.float32)

    got = qmm_w4_matmul(jnp.asarray(x), jax.tree.map(jnp.asarray, w4),
                        interpret=True)
    assert got is not None and got.shape == (b, n)

    # reference: same activation quantization, dequantized weights, f32 dot
    bp = 8
    x2 = np.pad(x, ((0, bp - b), (0, 0)))
    x8, sx = (np.asarray(a) for a in quantize_activations(jnp.asarray(x2)))
    x_hat = (x8.astype(np.float32).reshape(bp, -1, 256)
             * np.asarray(sx)[..., None]).reshape(bp, k)
    ref = x_hat @ np.asarray(dequantize(w4, jnp.float32)).T
    np.testing.assert_allclose(np.asarray(got), ref[:b], rtol=2e-4, atol=2e-4)


def test_w4x_precise_dequant_bitexact(rng):
    """W4X (precise fold): f32 scale planes hold the folded Q4_K products
    exactly, so dequantization matches the source repack bit-for-bit
    (the <=17-significand-bit argument in quant/fold.py)."""
    n, k = 8, 512
    x = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = repack_float(x, GGMLQuantType.Q4_K)
    w4x = fold_to_w4(qt, precise=True)
    assert "precise" in w4x.aux and w4x.g_scale.dtype == np.float32
    ref = np.asarray(dequantize(qt, jnp.float32))
    got = np.asarray(dequantize(w4x, jnp.float32))
    np.testing.assert_array_equal(got, ref)


def test_w4x_dual_plane_tighter_than_bf16(rng):
    """The W4X matmul (dual-plane int8 activations, exact weight scales)
    must beat the bf16 dequant path in end-to-end fidelity vs the f32
    reference — the basis for serving it as the high-fidelity mode."""
    n, k = 256, 2048
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = repack_float(wf, GGMLQuantType.Q4_K)
    w4x = fold_to_w4(qt, precise=True)
    x = rng.standard_normal((3, k)).astype(np.float32)

    wdq = np.asarray(dequantize(qt, jnp.float32))
    ref = x @ wdq.T  # f32 reference on exactly-dequantized weights

    got = np.asarray(qmm_w4_matmul(jnp.asarray(x), jax.tree.map(jnp.asarray, w4x),
                                   interpret=True))
    assert got.shape == (3, n)
    # the bf16 path: bf16 activations x bf16 weights, f32 accumulate
    bf = np.asarray(jnp.dot(jnp.asarray(x, jnp.bfloat16),
                            jnp.asarray(wdq, jnp.bfloat16).T,
                            preferred_element_type=jnp.float32))
    e_w4x = np.abs(got - ref).mean()
    e_bf16 = np.abs(bf - ref).mean()
    assert e_w4x < e_bf16 * 0.25, (e_w4x, e_bf16)  # ~2^-15.8 vs 2^-9 precision


def test_qmm_w4_quality_vs_float(rng):
    """End-to-end error of the W4A8 path vs the float matmul stays in the
    Q4_K noise class (the activation quant adds < the weight quant noise)."""
    n, k = 256, 1024
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    x = rng.standard_normal((2, k)).astype(np.float32)
    w4 = float_to_w4(wf)
    got = np.asarray(qmm_w4_matmul(jnp.asarray(x), jax.tree.map(jnp.asarray, w4),
                                   interpret=True))
    exact = x @ wf.T
    q4_ref = x @ np.asarray(dequantize(w4, jnp.float32)).T  # weight-quant-only error
    e_kernel = np.abs(got - exact).mean()
    e_weight = np.abs(q4_ref - exact).mean()
    assert e_kernel < e_weight * 1.15  # activation quant adds <15% on top


@pytest.mark.parametrize("precise", [False, True])
def test_qmm_fused_prefill_on_w4_layout(rng, precise):
    """The generic fused dequant-matmul kernel (ops/pallas/qmm.py) accepts
    the W4 fold layout for prefill shapes (b > the block-diagonal decode
    kernel's row cap): signed-hi plane unpack + m_adj group mins must
    reproduce the dequantized matmul."""
    from llama_kotlin_tpu.ops.pallas.qmm import qmm

    n, k = 256, 1024
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    w4 = fold_to_w4(repack_float(wf, GGMLQuantType.Q4_K), precise=precise)
    b = 48  # beyond qmm_w4_matmul's max_rows: the prefill route
    x = (rng.standard_normal((b, k)) * 0.5).astype(np.float32)

    got = qmm(jnp.asarray(x), jax.tree.map(jnp.asarray, w4), interpret=True)
    assert got is not None and got.shape == (b, n)
    ref = jnp.dot(jnp.asarray(x, jnp.bfloat16),
                  jnp.asarray(dequantize(w4, jnp.float32), jnp.bfloat16).T,
                  preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # tighter: compare against the f32 dequant matmul within bf16 budget
    reff = x @ np.asarray(dequantize(w4, jnp.float32)).T
    err = np.abs(np.asarray(got) - reff).max()
    scale = np.abs(reff).max()
    assert err / scale < 2e-2


@pytest.mark.parametrize("qtype", [GGMLQuantType.Q4_K, GGMLQuantType.Q4_0])
def test_qmm_w4_fx_matches_standard(rng, qtype, monkeypatch):
    """Fused-x kernel (in-kernel quantize + plane split + block-diagonal
    build) is bit-compatible with the standard path."""
    monkeypatch.setenv("LKTPU_W4_FX", "1")
    n, k = 256, 2048
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    # compact=False: the legacy fx/standard kernels need the bf16 scw/madj
    # planes (compact aux is served by fx2 only; its parity is tested in
    # test_ffn_fused.test_fx2_matches_standard and test_w4_compact below)
    w4 = jax.tree.map(jnp.asarray,
                      fold_to_w4(repack_float(wf, qtype), compact=False))
    x = jnp.asarray(rng.standard_normal((2, k)) * 0.7, jnp.float32)
    got_fx = np.asarray(qmm_w4_matmul(x, w4, interpret=True))
    monkeypatch.setenv("LKTPU_W4_FX", "0")
    got_std = np.asarray(qmm_w4_matmul(x, w4, interpret=True))
    # (i,r)- vs (r,i)-ordered partial sums differ in f32 association
    np.testing.assert_allclose(got_fx, got_std, rtol=1e-5, atol=1e-5)


def test_w4_compact_fold_and_kernel(rng):
    """Compact aux layout (quant/fold.py round 4: int8 6-bit scale/min
    codes + f32 per-superblock d/dmin, 4.625 bits/weight streamed):

    - dequantize() is BIT-IDENTICAL to the source repack (f32 planes hold
      the d*sc products exactly);
    - the fx2 kernel on compact planes reproduces the exact
      activation-quantized f32 reference to accumulation-order tolerance
      (~1e-6 relative — far tighter than the legacy bf16 planes' ~3e-3).
    """
    n, k = 256, 2048
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = repack_float(wf, GGMLQuantType.Q4_K)
    w4c = jax.tree.map(jnp.asarray, fold_to_w4(qt))
    assert "q6_t" in w4c.aux and w4c.aux["q6_t"].dtype == jnp.int8
    assert w4c.aux["q6_t"].shape[0] == 4  # sc6_lo|sc6_hi|m6_lo|m6_hi
    assert w4c.aux["dd_t"].shape == (w4c.k_pad // 128, n)  # d/dmin interleave
    assert w4c.g_scale.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dequantize(w4c, jnp.float32)),
                                  np.asarray(dequantize(qt, jnp.float32)))

    for b in (1, 2, 5):
        x = jnp.asarray(rng.standard_normal((b, k)) * 0.7, jnp.float32)
        got = qmm_w4_matmul(x, w4c, interpret=True)
        assert got is not None
        bp = max(2, int(2 ** np.ceil(np.log2(b))))
        x2 = np.pad(np.asarray(x), ((0, bp - b), (0, 0)))
        x8, sx = (np.asarray(a) for a in quantize_activations(jnp.asarray(x2)))
        x_hat = (x8.astype(np.float32).reshape(bp, -1, 256)
                 * sx[..., None]).reshape(bp, k)
        ref = x_hat @ np.asarray(dequantize(w4c, jnp.float32)).T
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(np.asarray(got) - ref[:b]).max() / denom < 5e-6


def test_w4_compact_gates(rng):
    """Shapes whose padded kc only chunks at 512 (k=2816 pads to 3072)
    take the LEGACY fold: the compact q6_t blocks at a bkc=512 plan tile
    as (4, 16, bn) int8 — second-minor dim under the (32, 128) tile —
    which Mosaic compiles but silently miscomputes on hardware (rel err
    ~0.9 at k=7168, round-5 device smoke; ADVICE r4 #2).  The legacy fold
    is kernel-served and correct at bkc=512 (llama2-7b's 11008-class FFN
    was device-proven on it in round 3).  sym/precise never compact."""
    n, k = 128, 2816
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    w4 = fold_to_w4(repack_float(wf, GGMLQuantType.Q4_K))
    assert "q6_t" not in w4.aux and "madj_t" in w4.aux
    x = jnp.asarray(rng.standard_normal((2, k)) * 0.7, jnp.float32)
    got = qmm_w4_matmul(x, jax.tree.map(jnp.asarray, w4), interpret=True)
    assert got is not None  # bkc=512 plan takes the legacy planes
    ref = jnp.dot(x, dequantize(w4, jnp.float32).T)
    denom = float(jnp.abs(ref).max()) + 1e-9
    assert float(jnp.abs(got - ref).max()) / denom < 2e-2
    # the kernel-side guard: an env-forced bkc=512 plan on a COMPACT
    # tensor must DECLINE rather than miscompute (the fold guard keeps
    # real folds legacy at such shapes, so force both knobs here)
    wf3 = (rng.standard_normal((128, 2048)) * 0.1).astype(np.float32)
    w4c = fold_to_w4(repack_float(wf3, GGMLQuantType.Q4_K))
    assert "q6_t" in w4c.aux  # kc=1024: compact-eligible
    x3 = jnp.asarray(rng.standard_normal((2, 2048)) * 0.7, jnp.float32)
    import os

    old_env = os.environ.get("LKTPU_W4_BKC")
    os.environ["LKTPU_W4_BKC"] = "512"
    try:
        assert qmm_w4_matmul(x3, jax.tree.map(jnp.asarray, w4c),
                             interpret=True) is None
    finally:
        if old_env is None:
            os.environ.pop("LKTPU_W4_BKC", None)
        else:
            os.environ["LKTPU_W4_BKC"] = old_env
    wf2 = (rng.standard_normal((64, 2048)) * 0.1).astype(np.float32)
    w4x = fold_to_w4(repack_float(wf2, GGMLQuantType.Q4_K), precise=True)
    assert "q6_t" not in w4x.aux
    w40 = fold_to_w4(repack_float(wf2, GGMLQuantType.Q4_0))
    assert "sym" in w40.aux and "q6_t" not in w40.aux


def test_w4_decode_kernels_never_read_gscale_planes(rng):
    """Streamed-bytes audit (bench.py w_gbps accounting): the decode-path
    kernels must consume ONLY codes + the transposed aux planes; the f32
    g_scale/g_min effective planes are HBM-resident for the dequant/
    prefill paths but never cross HBM on the decode loop.  Proof: poison
    g_scale/g_min with garbage -> kernel outputs are BIT-IDENTICAL (an op
    cannot be insensitive to a buffer it reads).  On device the same claim
    holds arithmetically: the FFN megakernel measures ~690 GB/s on
    streamed-bytes accounting (4.625 bits/wt); counting the f32 planes
    (+43%) would put it over the v5e 819 GB/s speed-of-light."""
    from dataclasses import replace

    from llama_kotlin_tpu.ops.pallas.qmm_w4_ffn import qmm_w4_ffn_matmul

    E, F = 2048, 4096
    gu = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(
        (rng.standard_normal((2 * F, E)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K)))
    dn = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(
        (rng.standard_normal((E, F)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K)))
    w = jax.tree.map(jnp.asarray, fold_to_w4(repack_float(
        (rng.standard_normal((512, E)) * 0.1).astype(np.float32),
        GGMLQuantType.Q4_K)))

    def poison(q):
        return replace(q, g_scale=jnp.full_like(q.g_scale, 777.0),
                       g_min=None if q.g_min is None
                       else jnp.full_like(q.g_min, -333.0))

    x = jnp.asarray(rng.standard_normal((2, E)) * 0.7, jnp.float32)
    ref_mm = qmm_w4_matmul(x, w, interpret=True)
    got_mm = qmm_w4_matmul(x, poison(w), interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mm), np.asarray(ref_mm))
    ref_ffn = qmm_w4_ffn_matmul(x, gu, dn, interpret=True)
    got_ffn = qmm_w4_ffn_matmul(x, poison(gu), poison(dn), interpret=True)
    assert ref_ffn is not None
    np.testing.assert_array_equal(np.asarray(got_ffn), np.asarray(ref_ffn))


def test_w4_high_batch_q8_switch(rng, monkeypatch):
    """attach_q8 + ops/qmatmul high-batch routing: above LKTPU_W4_BMAX
    decode rows the dispatch leaves the block-diagonal W4 kernel for the
    dense Q8F path (the reference's mmvq vs dequant+GEMM batch split);
    below it the W4 path is untouched (bit-identical to the un-attached
    tensor's result)."""
    from llama_kotlin_tpu.ops import qmatmul as _qm_mod
    from llama_kotlin_tpu.ops.qmatmul import qmatmul
    from llama_kotlin_tpu.quant.fold import attach_q8

    monkeypatch.setenv("LKTPU_FORCE_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("LKTPU_W4_BMAX", "8")
    n, k = 256, 1024
    wf = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    w4 = jax.tree.map(jnp.asarray,
                      fold_to_w4(repack_float(wf, GGMLQuantType.Q4_K)))
    # no wf: the shadow encodes the Q4_K-DEQUANTIZED values, so the mode
    # switch serves the same effective weights as the W4 path
    dual = jax.tree.map(jnp.asarray, attach_q8(fold_to_w4(
        repack_float(wf, GGMLQuantType.Q4_K))))
    assert "q8_codes" in dual.aux and "q8_scale" in dual.aux

    calls = []
    orig = _qm_mod.__dict__.get("_pallas_dispatch")
    from llama_kotlin_tpu.ops.pallas import qmm_int8 as _qi
    orig_int8 = _qi.qmm_int8_or_none

    def counting_int8(*a, **kw):
        y = orig_int8(*a, **kw)
        if y is not None:
            calls.append(a[1].codes.shape)
        return y

    monkeypatch.setattr(_qi, "qmm_int8_or_none", counting_int8)

    wref = np.asarray(dequantize(w4, jnp.float32))
    # below the threshold: W4 path, bit-identical with/without shadow
    x_lo = jnp.asarray(rng.standard_normal((2, k)) * 0.5, jnp.float32)
    y_plain = np.asarray(qmatmul(x_lo, w4, compute_dtype=jnp.bfloat16))
    y_dual = np.asarray(qmatmul(x_lo, dual, compute_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(y_dual, y_plain)
    assert not calls
    # above: Q8F path fires and matches the float reference within the
    # W8A8 error budget
    x_hi = jnp.asarray(rng.standard_normal((16, k)) * 0.5, jnp.float32)
    y_hi = np.asarray(qmatmul(x_hi, dual, compute_dtype=jnp.bfloat16))
    assert calls, "Q8F switch did not fire above LKTPU_W4_BMAX"
    ref = np.asarray(x_hi) @ wref.T
    err = np.abs(y_hi - ref).max()
    scale = np.abs(ref).max() + 1e-6
    assert err / scale < 0.03, f"q8 switch numerics off: {err/scale}"


def test_w4_ffn_declines_at_high_batch_with_q8(rng, monkeypatch):
    """qmm_ffn defers to pairwise Q8F matmuls above the batch threshold
    when the dual fold is attached (the two-launch fallback then routes
    each matmul through the high-batch switch)."""
    from llama_kotlin_tpu.ops.qmatmul import qmm_ffn
    from llama_kotlin_tpu.quant.fold import attach_q8

    monkeypatch.setenv("LKTPU_FORCE_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("LKTPU_W4_BMAX", "8")
    E, F = 2048, 2048
    gu_f = (rng.standard_normal((2 * F, E)) * 0.05).astype(np.float32)
    dn_f = (rng.standard_normal((E, F)) * 0.05).astype(np.float32)
    gu = jax.tree.map(jnp.asarray, attach_q8(
        fold_to_w4(repack_float(gu_f, GGMLQuantType.Q4_K)), gu_f))
    dn = jax.tree.map(jnp.asarray,
                      fold_to_w4(repack_float(dn_f, GGMLQuantType.Q4_K)))
    x_lo = jnp.asarray(rng.standard_normal((2, E)) * 0.5, jnp.float32)
    x_hi = jnp.asarray(rng.standard_normal((16, E)) * 0.5, jnp.float32)
    assert qmm_ffn(x_lo, gu, dn, act="silu") is not None
    assert qmm_ffn(x_hi, gu, dn, act="silu") is None
