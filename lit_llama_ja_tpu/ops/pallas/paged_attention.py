"""Pallas paged decode-attention kernel (INT8 KV pages, per-slot masks).

The serving hot loop's attention reads each slot's pages through an XLA gather
(`infer/paged._gathered`); that path materializes the gathered view in HBM —
an extra write+read of the whole attended KV per step. This kernel reads pages
DIRECTLY from the pool: the per-slot page table is a **scalar-prefetch**
argument, so each grid step's BlockSpec index_map points the DMA at
``tables[b, j]`` and the page streams HBM→VMEM exactly once, already dequantized
and folded into an online-softmax accumulator (the flash recurrence, f32 stats).

This is ROADMAP item 2 revisited under its stated conditions (batched serving
with per-slot masks, where XLA's fusion is weaker): one (nh, page) score tile
and one (nh, hd) accumulator live in VMEM per slot; k/v bytes stream at int8
width; per-token scales fold into the score tile / the probability row exactly
as `ops/attention.decode_attention_quant` does.

Layout contract (shared with `infer/paged.init_page_pool`): pages are
``(n_pages, nh, page, hd)`` int8 with scales ``(n_pages, nh, page)`` f32 —
heads-major, so neither the kernel nor the XLA path relayouts anything.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    tables_ref,  # (B, AP) int32  [scalar prefetch]
    pos_ref,  # (B,) int32     [scalar prefetch]
    q_ref,  # (1, nh, hd)
    k_ref,  # (1, nh, page, hd) int8
    ks_ref,  # (1, nh, page) f32
    v_ref,  # (1, nh, page, hd) int8
    vs_ref,  # (1, nh, page) f32
    o_ref,  # (1, nh, hd)
    m_ref,  # (nh, 1) f32 scratch
    l_ref,  # (nh, 1) f32 scratch
    acc_ref,  # (nh, hd) f32 scratch
    *,
    page: int,
    scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p_b = pos_ref[b]

    @pl.when(j * page <= p_b)
    def _():
        q = q_ref[0].astype(jnp.float32)  # (nh, hd)
        # int8 -> f32 via int32 (Mosaic has no direct small-int -> float path)
        k = k_ref[0].astype(jnp.int32).astype(jnp.float32)  # (nh, page, hd)
        # scores per head: one decode query is a batched matvec — Mosaic rejects
        # dot_general with no lhs non-contracting dims, so run it on the VPU as
        # multiply + lane-reduction (the kernel is HBM-bound, not FLOP-bound)
        s = jnp.sum(q[:, None, :] * k, axis=-1)  # (nh, page)
        s = s * ks_ref[0] * scale
        tok = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1) + j * page
        s = jnp.where(tok <= p_b, s, NEG_INF)

        m_prev = m_ref[:]  # (nh, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # (nh, page)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vs_ref[0]  # fold v dequant scales into the probability row
        v = v_ref[0].astype(jnp.int32).astype(jnp.float32)  # (nh, page, hd)
        # weighted sum over the page axis: sublane reduction on the VPU
        acc_ref[:] = acc_ref[:] * alpha + jnp.sum(pv[:, :, None] * v, axis=1)
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(
    q: jax.Array,  # (B, nh, hd)
    k_pages: jax.Array,  # (P, nh, page, hd) int8
    k_scale: jax.Array,  # (P, nh, page) f32
    v_pages: jax.Array,
    v_scale: jax.Array,
    tables: jax.Array,  # (B, AP) int32 page indices
    pos: jax.Array,  # (B,) int32 current position per slot (inclusive)
    interpret: bool = False,
) -> jax.Array:
    """One decode token per slot against its paged INT8 KV; returns (B, nh, hd).

    Pages past ``pos[b]`` are masked (entries within the page) or skipped
    (whole page, via `pl.when`); table entries for unallocated pages point at
    the trash page and are never unmasked.
    """
    B, nh, hd = q.shape
    page = k_pages.shape[2]
    AP = tables.shape[1]
    scale = 1.0 / (hd**0.5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, AP),
        in_specs=[
            pl.BlockSpec((1, nh, hd), lambda b, j, tbl, pos: (b, 0, 0)),
            pl.BlockSpec(
                (1, nh, page, hd), lambda b, j, tbl, pos: (tbl[b, j], 0, 0, 0)
            ),
            pl.BlockSpec((1, nh, page), lambda b, j, tbl, pos: (tbl[b, j], 0, 0)),
            pl.BlockSpec(
                (1, nh, page, hd), lambda b, j, tbl, pos: (tbl[b, j], 0, 0, 0)
            ),
            pl.BlockSpec((1, nh, page), lambda b, j, tbl, pos: (tbl[b, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nh, hd), lambda b, j, tbl, pos: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nh, 1), jnp.float32),
            pltpu.VMEM((nh, 1), jnp.float32),
            pltpu.VMEM((nh, hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, page=page, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nh, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nh * AP * page * hd,
            bytes_accessed=2 * B * AP * nh * page * hd + B * AP * nh * page * 8,
            transcendentals=B * nh * AP * page,
        ),
    )(tables, pos, q, k_pages, k_scale, v_pages, v_scale)
