"""Rotary position embeddings (reference `lit_llama/model.py:286-329`).

The cache layout matches the reference: ``(seq_len, head_dim // 2, 2)`` holding
``(cos, sin)`` pairs, applied by real-pair rotation. Rotation is computed in float32
and cast back, mirroring the reference's ``x.float()`` upcast at
`lit_llama/model.py:318`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_rope_cache(
    seq_len: int,
    n_elem: int,
    base: int = 10000,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Precompute (cos, sin) rotation table of shape ``(seq_len, n_elem // 2, 2)``."""
    theta = 1.0 / (base ** (jnp.arange(0, n_elem, 2, dtype=jnp.float32) / n_elem))
    seq_idx = jnp.arange(seq_len, dtype=jnp.float32)
    idx_theta = jnp.outer(seq_idx, theta)  # (seq_len, n_elem // 2)
    cache = jnp.stack([jnp.cos(idx_theta), jnp.sin(idx_theta)], axis=-1)
    # The reference truncates the table to fp16 for half dtypes to mimic complex32
    # (`lit_llama/model.py:307-308`); we keep float32 here — rotation happens in
    # float32 either way and the fp16 truncation only adds error.
    return cache.astype(dtype)


def apply_rope(x: jax.Array, rope_cache: jax.Array) -> jax.Array:
    """Rotate ``x`` of shape ``(B, T, n_head, head_dim)`` by the (cos, sin) table.

    ``rope_cache`` has shape ``(T, head_dim // 2, 2)`` — already gathered for the
    positions of the T tokens present in ``x``.
    """
    B, T, nh, hd = x.shape
    xs = x.astype(jnp.float32).reshape(B, T, nh, hd // 2, 2)
    rc = rope_cache.astype(jnp.float32).reshape(1, T, 1, hd // 2, 2)
    cos, sin = rc[..., 0], rc[..., 1]
    x0, x1 = xs[..., 0], xs[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(B, T, nh, hd).astype(x.dtype)
