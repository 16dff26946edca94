"""Learning-rate schedules (reference `pretrain/redpajama.py:382-393`)."""
from __future__ import annotations

import jax.numpy as jnp


def cosine_with_warmup(
    learning_rate: float,
    warmup_iters: int,
    lr_decay_iters: int,
    min_lr: float,
):
    """Linear warmup then cosine decay to ``min_lr``; ``min_lr`` after decay ends.

    Exactly the reference's `get_lr` shape, as an optax-compatible schedule fn.
    """

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = learning_rate * it / max(warmup_iters, 1)
        decay_ratio = (it - warmup_iters) / max(lr_decay_iters - warmup_iters, 1)
        decay_ratio = jnp.clip(decay_ratio, 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * decay_ratio))
        cos = min_lr + coeff * (learning_rate - min_lr)
        return jnp.where(
            it < warmup_iters, warm, jnp.where(it > lr_decay_iters, min_lr, cos)
        )

    return schedule
