"""Training harness test (baby-llama pattern): loss decreases on a
learnable toy distribution, and the checkpoint GGUF round-trips through
the inference runtime."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from llama_kotlin_tpu.models.config import ModelConfig
from llama_kotlin_tpu.models.loader import load_gguf_model
from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext
from llama_kotlin_tpu.tools.train import save_checkpoint_gguf, train, training_forward


def test_train_loss_decreases_and_checkpoint_loads(tmp_path):
    cfg = ModelConfig(arch="llama", vocab_size=32, n_embd=32, n_layer=2,
                      n_head=2, n_head_kv=2, n_ff=64, n_ctx_train=32)
    # learnable structure: repeating pattern
    data = np.tile(np.arange(8, dtype=np.int32), 2000)
    params, losses = train(cfg, data, steps=60, batch=4, seq_len=16, lr=1e-2)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    out = tmp_path / "trained.gguf"
    save_checkpoint_gguf(params, cfg, out)
    cfg2, params2, f = load_gguf_model(out, compute_dtype=jnp.float32)
    f.close()
    ctx = LlamaContext(cfg2, params2, n_cells=32, compute_dtype=jnp.float32)
    # the trained model predicts the repeating pattern
    prompt = np.array([0, 1, 2, 3], np.int32)
    assert ctx.decode(Batch.single(prompt)) == 0
    assert int(np.argmax(ctx.get_logits()[0])) == 4


def test_train_lbfgs_reduces_loss():
    """L-BFGS optimizer path (parity: ggml_opt L-BFGS)."""
    from llama_kotlin_tpu.tools.train import train
    from llama_kotlin_tpu.models.synthetic import preset_config

    cfg = preset_config("test-tiny", n_ctx_train=64)
    rng = np.random.default_rng(0)
    data = rng.integers(0, cfg.vocab_size, 2000).astype(np.int32)
    _, losses = train(cfg, data, steps=8, batch=2, seq_len=16, lr=0.5,
                      optimizer="lbfgs")
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
