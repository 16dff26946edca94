"""Cross-entropy loss with ignore_index (reference `pretrain/redpajama.py:232-234`,
`finetune/*` use ignore_index=-1 for masked prompt tokens)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array, targets: jax.Array, ignore_index: int = -1
) -> jax.Array:
    """Mean token NLL over positions where ``targets != ignore_index``.

    Args:
      logits: ``(..., V)`` float; targets: ``(...)`` int.
    """
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tok_logit = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    ).squeeze(-1)
    nll = (logz - tok_logit) * mask
    return nll.sum() / jnp.maximum(mask.sum(), 1)


def token_nll_sum(logits: jax.Array, targets: jax.Array, ignore_index: int = -1):
    """(sum NLL, token count) — the perplexity protocol's accumulator
    (reference `evaluate/full.py:117-128`)."""
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tok_logit = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    ).squeeze(-1)
    nll = (logz - tok_logit) * mask
    return nll.sum(), mask.sum()
