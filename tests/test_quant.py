

def test_imatrix_weighted_quantize_improves_weighted_error():
    """K-quant encoders accept per-column importance weights (the
    reference's quant_weights, ggml_quantize_chunk): weighting must reduce
    the importance-weighted reconstruction error on the emphasized columns
    vs unweighted encoding."""
    import numpy as np

    from llama_kotlin_tpu.quant import numpy_ref as R
    from llama_kotlin_tpu.quant.formats import GGMLQuantType

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 512)).astype(np.float32)
    qw = np.ones(512, np.float32)
    qw[:64] = 100.0  # first superblock's first groups matter most
    for qt in (GGMLQuantType.Q2_K, GGMLQuantType.Q3_K, GGMLQuantType.Q4_K,
               GGMLQuantType.Q5_K, GGMLQuantType.Q6_K):
        plain = R.dequantize(R.quantize(x, qt), qt, shape=x.shape)
        wtd = R.dequantize(R.quantize(x, qt, qw=qw), qt, shape=x.shape)
        err_plain = (qw * (plain - x) ** 2).sum()
        err_wtd = (qw * (wtd - x) ** 2).sum()
        if qt in (GGMLQuantType.Q3_K, GGMLQuantType.Q6_K):
            # symmetric scale-search: the weighted objective must win on
            # the weighted metric
            assert err_wtd < err_plain, (qt, err_wtd, err_plain)
        else:
            # asymmetric ALS: per-group-constant importance cancels in the
            # per-group fit (only the per-element sqrt(sigma2+x^2) form
            # shifts it); require the weighted encode to stay sane
            assert err_wtd <= err_plain * 1.05, (qt, err_wtd, err_plain)
            assert not np.array_equal(plain, wtd)  # weights do reach it


def test_imatrix_key_mapping():
    from llama_kotlin_tpu.tools.quantize import _imatrix_key

    assert _imatrix_key("blk.3.attn_q.weight") == "blk.3.attn_qkv"
    assert _imatrix_key("blk.3.attn_v.weight") == "blk.3.attn_qkv"
    assert _imatrix_key("blk.0.ffn_up.weight") == "blk.0.ffn_gate_up"
    assert _imatrix_key("blk.0.ffn_down.weight") == "blk.0.ffn_down"
    assert _imatrix_key("blk.0.attn_output.weight") == "blk.0.attn_output"
    assert _imatrix_key("token_embd.weight") is None
