"""Token sampling (reference `generate.py:66-74`): temperature, top-k, categorical.

Implemented as pure jittable functions so sampling lives *inside* the compiled decode
step — no host round-trip per token (the reference needs `xm.mark_step()` per token on
XLA; native jit makes that boundary disappear).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> jax.Array:
    """Sample one token id from ``logits`` of shape ``(V,)``.

    temperature == 0.0 is treated as greedy argmax.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
