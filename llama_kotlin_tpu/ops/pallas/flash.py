"""Flash attention over the unified cell cache (placeholder: jnp fallback)."""

from __future__ import annotations


def flash_attention_or_none(q, k, v, mask, *, scale, logit_softcap=0.0):
    return None
