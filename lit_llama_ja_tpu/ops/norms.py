"""RMSNorm (reference `lit_llama/model.py:263-283`).

XLA-level implementation; fuses into neighbouring ops under jit. A Pallas variant exists
in `ops/pallas/rmsnorm.py` for cases where profiling shows the fusion boundary matters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jax.Array, scale: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Mean-of-squares RMSNorm: ``scale * x / sqrt(mean(x^2) + eps)``.

    Matches the reference's variant (mean of squares, not the original paper's
    norm-based formula — see the note at `lit_llama/model.py:276-281`).
    Statistics are computed in float32 regardless of input dtype.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    norm_x = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x_normed = x32 * jax.lax.rsqrt(norm_x + eps)
    return (scale.astype(jnp.float32) * x_normed).astype(dtype)
