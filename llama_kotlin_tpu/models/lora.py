"""LoRA adapters and control vectors.

Parity targets:
- llama_lora_adapter_init / _set / _remove (reference src/llama.cpp:18143,
  llama.h:524-551): GGUF adapters with `<tensor>.lora_a` / `.lora_b`
  pairs, scaled by adapter.lora.alpha / r * user_scale, applied on the fly
  during matmuls (llm_build_lora_mm :8515) — here as LoraWeight wrappers
  that qmatmul understands.
- llama_control_vector_apply (llama.h:556): per-layer additive steering
  vectors, applied at the end of each decoder layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Union

import jax
import jax.numpy as jnp
import numpy as np

from llama_kotlin_tpu.gguf.reader import GGUFFile
from llama_kotlin_tpu.quant.qtensor import QTensor


@jax.tree_util.register_dataclass
@dataclass
class LoraWeight:
    """base weight + low-rank delta: y = x@base^T + scale * (x@a^T)@b^T."""

    base: Any  # QTensor or dense [n, k]
    a: jax.Array  # [r, k]
    b: jax.Array  # [n, r]
    scale: float = field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.base.shape


@dataclass
class LoraAdapter:
    """Host-side adapter: tensor-name -> (a, b) numpy pairs + alpha."""

    tensors: dict[str, tuple[np.ndarray, np.ndarray]]
    alpha: float = 16.0

    @staticmethod
    def load(path: str | Path) -> "LoraAdapter":
        f = GGUFFile(path)
        if f.metadata.get("general.type") not in (None, "adapter"):
            raise ValueError("not an adapter GGUF")
        alpha = float(f.metadata.get("adapter.lora.alpha", 16.0))
        pairs: dict[str, dict[str, np.ndarray]] = {}
        for name in f.tensors:
            if name.endswith(".lora_a"):
                base, kind = name[: -len(".lora_a")], "a"
            elif name.endswith(".lora_b"):
                base, kind = name[: -len(".lora_b")], "b"
            else:
                continue
            pairs.setdefault(base, {})[kind] = f.tensor_float(name)
        f.close()
        tensors = {}
        for base, ab in pairs.items():
            if "a" in ab and "b" in ab:
                tensors[base] = (ab["a"], ab["b"])
        return LoraAdapter(tensors=tensors, alpha=alpha)


# model params key -> GGUF tensor base name (per layer)
_KEY_TO_TENSOR = {
    "wq": "attn_q.weight", "wk": "attn_k.weight", "wv": "attn_v.weight",
    "wo": "attn_output.weight", "ffn_gate": "ffn_gate.weight",
    "ffn_up": "ffn_up.weight", "ffn_down": "ffn_down.weight",
}
_GLOBAL_KEY_TO_TENSOR = {"output": "output.weight", "tok_embd": "token_embd.weight"}


def apply_lora(params: dict, adapter: LoraAdapter, scale: float = 1.0) -> dict:
    """Wrap matching weights with LoraWeight; returns new (unstacked) params."""
    if "layers" not in params:
        raise ValueError("apply_lora needs unstacked params (before LlamaContext)")

    def eff_scale(a: np.ndarray) -> float:
        r = a.shape[0]
        return scale * adapter.alpha / max(r, 1)

    def wrap(w, tname):
        ab = adapter.tensors.get(tname)
        if ab is None or w is None:
            return w
        a, b = ab
        return LoraWeight(base=w, a=jnp.asarray(a, jnp.float32),
                          b=jnp.asarray(b, jnp.float32), scale=eff_scale(a))

    out = {k: v for k, v in params.items()}
    for k, tname in _GLOBAL_KEY_TO_TENSOR.items():
        if k in out:
            out[k] = wrap(out[k], tname)
    out["layers"] = []
    for i, layer in enumerate(params["layers"]):
        nl = dict(layer)
        for k, suffix in _KEY_TO_TENSOR.items():
            if k in nl:
                nl[k] = wrap(nl[k], f"blk.{i}.{suffix}")
        out["layers"].append(nl)
    return out


def remove_lora(params: dict) -> dict:
    """Strip all LoraWeight wrappers (llama_lora_adapter_remove)."""
    def unwrap(w):
        return w.base if isinstance(w, LoraWeight) else w

    out = {k: (unwrap(v) if not isinstance(v, (dict, list)) else v)
           for k, v in params.items()}
    if "layers" in params:
        out["layers"] = [{k: unwrap(v) for k, v in layer.items()}
                         for layer in params["layers"]]
    return out


def load_control_vector(path: str | Path, n_layer: int, n_embd: int,
                        strength: float = 1.0) -> jnp.ndarray:
    """Load a control-vector GGUF (direction.N tensors) -> [n_layer, n_embd]."""
    f = GGUFFile(path)
    out = np.zeros((n_layer, n_embd), np.float32)
    for name, info in f.tensors.items():
        if name.startswith("direction."):
            layer = int(name.split(".")[1])
            if 0 < layer <= n_layer:
                out[layer - 1] = f.tensor_float(name).reshape(-1)[:n_embd]
    f.close()
    return jnp.asarray(out * strength)
