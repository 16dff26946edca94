"""Ring attention: sequence-parallel causal attention with O(T/n) per-device
k/v memory.

`sp_attention.sequence_parallel_attention` all-gathers k/v, so each device still
holds the full O(T·hd) k/v — fine up to a point, but it caps context at what one
device can hold. Here k/v blocks instead travel the ring one hop per step
(`jax.lax.ppermute` over ICI) while each device folds the visiting block into an
online-softmax accumulator (the flash-attention recurrence, f32 stats). Per-device
memory is O(T/n) for q/k/v and O(T/n · hd) for the accumulator — the context
ceiling scales linearly with the mesh, enabling multi-million-token prefill.

The reference has nothing like this (SURVEY.md §5: "No ring attention / context
parallel / blockwise / Ulysses anywhere"); it is the north-star long-context
extension. XLA overlaps the ppermute DMA with the per-block matmuls (async
collective scheduling), so the ring latency hides behind compute for any
reasonably sized block.

Causal masking: q rows on device i sit at global positions i·Tb..(i+1)·Tb; the
block visiting at ring step s originated on device (i−s) mod n, at global column
offset ((i−s) mod n)·Tb. Blocks strictly above the diagonal contribute nothing —
they are computed uniformly (SPMD) and masked out; the online-softmax guards keep
fully-masked steps exact (zero weight, no NaN).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _fold_block(m, l, acc, q, k_blk, v_blk, col_offset, row_offset):
    """One online-softmax step: fold (k_blk, v_blk) at global column offset
    ``col_offset`` into the running (m, l, acc) stats for q rows at
    ``row_offset``. All stats f32; m is initialized to -inf, and fully-masked
    blocks are handled exactly (correction factor 0, probability mass 0)."""
    Tq, hd = q.shape[2], q.shape[3]
    S = k_blk.shape[2]
    scale = 1.0 / (hd**0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk).astype(jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 0) + row_offset
    col = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 1) + col_offset
    valid = (col <= row)[None, None]
    s = jnp.where(valid, s, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    # m_new == -inf means no valid column seen yet for that row: use 0 as the
    # subtraction point so exp(-inf - 0) = 0 and nothing accumulates.
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(s - m_safe)
    corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v_blk).astype(jnp.float32)
    acc_new = acc * corr + pv
    return m_new, l_new, acc_new


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh, axis: str = "tp"
) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over ``axis``, k/v streamed
    around the ring — same signature and semantics as
    `sequence_parallel_attention`, O(T/n) per-device memory.

    Args:
      q, k, v: ``(B, n_head, T, head_dim)`` with T divisible by the axis size.
    Returns the attention output in the same (sequence-sharded) layout.
    """
    n = mesh.shape[axis]
    T = q.shape[2]
    assert T % n == 0, (T, n)
    perm = [(j, (j + 1) % n) for j in range(n)]

    spec = P(None, None, axis, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def inner(q_loc, k_loc, v_loc):
        B, nh, Tb, hd = q_loc.shape
        i = jax.lax.axis_index(axis)
        row_offset = i * Tb
        m = jnp.full((B, nh, Tb, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((B, nh, Tb, 1), jnp.float32)
        acc = jnp.zeros((B, nh, Tb, hd), jnp.float32)

        def step(s, carry):
            k_blk, v_blk, m, l, acc = carry
            src = (i - s) % n  # originating device of the block we now hold
            m, l, acc = _fold_block(
                m, l, acc, q_loc, k_blk, v_blk, src * Tb, row_offset
            )
            # pass our current block to the next device (last rotation feeds an
            # unused carry; XLA overlaps the DMA with this step's matmuls)
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return k_blk, v_blk, m, l, acc

        _, _, m, l, acc = jax.lax.fori_loop(
            0, n, step, (k_loc, v_loc, m, l, acc)
        )
        return (acc / l).astype(q_loc.dtype)

    return inner(q, k, v)
