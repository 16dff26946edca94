"""Token sampling (reference `generate.py:66-74`): temperature, top-k, top-p,
categorical.

Implemented as pure jittable functions so sampling lives *inside* the compiled decode
step — no host round-trip per token (the reference needs `xm.mark_step()` per token on
XLA; native jit makes that boundary disappear). Top-p (nucleus) sampling is an
extension over the reference, which has temperature/top-k only.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask logits outside the smallest set whose probability mass ≥ ``top_p``.

    The top-1 token is always kept (its preceding mass is 0 < top_p). Ties at
    the nucleus boundary are all kept. Applies along the last axis.
    """
    sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    mass_before = jnp.cumsum(probs, axis=-1) - probs
    kept = jnp.where(mass_before < top_p, sorted_logits, jnp.inf)
    thresh = jnp.min(kept, axis=-1, keepdims=True)  # smallest kept logit
    return jnp.where(logits < thresh, -jnp.inf, logits)


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Sample one token id from ``logits`` of shape ``(V,)``.

    temperature == 0.0 is treated as greedy argmax. Filter order: temperature
    scale, then top-k, then top-p (nucleus mass measured after top-k).
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
