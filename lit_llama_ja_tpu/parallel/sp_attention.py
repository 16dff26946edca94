"""Sequence-parallel (context-parallel) prefill attention.

The reference hard-caps context at block_size=2048 and has no sequence parallelism
(SURVEY.md §5 "Long-context / sequence parallelism: absent"). This is the north-star
extension: long-prompt prefill attention sharded over the sequence axis of a mesh —
each device holds a T/n slice of q/k/v, all-gathers k/v over ICI, and computes its
q-rows' causal attention with a global row offset.

Memory per device: O(T·hd/n) activations + the gathered k/v (O(T·hd)); attention
scores are only materialized for the local q-slice (O(T²/n)) — the quadratic term
shards. The ring variant (`impl="ring"` → `ring_attention.ring_attention`) never
materializes full k/v: blocks travel the ring via ppermute and fold into an
online-softmax accumulator, making per-device memory O(T/n).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _offset_causal_sdpa(q, k, v, row_offset):
    """Causal attention where q rows sit at global positions row_offset..+Tq."""
    Tq, hd = q.shape[2], q.shape[3]
    S = k.shape[2]
    scale = 1.0 / (hd**0.5)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 0) + row_offset
    col = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 1)
    att = jnp.where((col <= row)[None, None], att.astype(jnp.float32), -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    impl: str = "allgather",
) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over ``axis``.

    Args:
      q, k, v: ``(B, n_head, T, head_dim)`` with T divisible by the axis size.
      impl: ``"allgather"`` (k/v gathered per device, O(T) k/v memory) or
        ``"ring"`` (k/v blocks streamed via ppermute, O(T/n) memory).
    Returns the attention output with the same (sequence-sharded) layout.
    """
    if impl == "ring":
        from lit_llama_ja_tpu.parallel.ring_attention import ring_attention

        return ring_attention(q, k, v, mesh, axis=axis)
    if impl != "allgather":
        raise ValueError(f"unknown sequence-parallel impl {impl!r}")
    n = mesh.shape[axis]
    T = q.shape[2]
    assert T % n == 0, (T, n)

    spec = P(None, None, axis, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def inner(q_loc, k_loc, v_loc):
        k_full = jax.lax.all_gather(k_loc, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_loc, axis, axis=2, tiled=True)
        shard_idx = jax.lax.axis_index(axis)
        offset = shard_idx * q_loc.shape[2]
        return _offset_causal_sdpa(q_loc, k_full, v_full, offset)

    return inner(q, k, v)
