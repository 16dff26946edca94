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

Measured verdict (PERF.md "Pallas paged-attention kernel"): on the current
toolchain BOTH variants — the grid kernel below and the manually
double-buffered `paged_decode_attention_db` — run 14-16% slower than the XLA
gather path inside the real decode step; an in-step ablation shows the XLA
path already streams the KV at ~236 GB/s effective (materialization included),
i.e. at the platform ceiling. Both kernels stay parity-tested and selectable;
`_db` additionally requires ``page_size`` a multiple of 128 (Mosaic cannot
slice the f32 scale planes on a sub-lane-width last dim).
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


def _db_kernel(
    tables_ref,  # (B, AP) int32 [scalar prefetch]
    pos_ref,  # (B,) int32 [scalar prefetch]
    q_ref,  # (1, nh, hd)
    k_hbm,  # (P, nh, page, hd) int8, resident in HBM
    ks_hbm,  # (P, nh, page) f32
    v_hbm,
    vs_hbm,
    o_ref,  # (1, nh, hd)
    kb, ksb, vb, vsb,  # (2, ...) VMEM double buffers
    sems,  # DMA sems (2, 4)
    *,
    page: int,
    AP: int,
    scale: float,
):
    """One slot per grid program; pages stream through a 2-deep manual DMA
    pipeline (next page's 4 copies start before the current page's fold)."""
    b = pl.program_id(0)
    p_b = pos_ref[b]

    def dmas(slot, j):
        idx = tables_ref[b, j]
        return (
            pltpu.make_async_copy(k_hbm.at[idx], kb.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(ks_hbm.at[idx], ksb.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(v_hbm.at[idx], vb.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[idx], vsb.at[slot], sems.at[slot, 3]),
        )

    def start(slot, j):
        for d in dmas(slot, j):
            d.start()

    def wait(slot, j):
        for d in dmas(slot, j):
            d.wait()

    start(0, 0)
    nh, hd = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(jnp.logical_and(j + 1 < AP, (j + 1) * page <= p_b))
        def _():
            start(nxt, j + 1)

        wait(slot, j)
        k = kb[slot].astype(jnp.int32).astype(jnp.float32)  # (nh, page, hd)
        s = jnp.sum(q[:, None, :] * k, axis=-1) * ksb[slot] * scale  # (nh, page)
        tok = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1) + j * page
        s = jnp.where(tok <= p_b, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vsb[slot]
        v = vb[slot].astype(jnp.int32).astype(jnp.float32)
        acc = acc * alpha + jnp.sum(pv[:, :, None] * v, axis=1)
        return m_new, l, acc

    n_valid = p_b // page + 1  # pages that contain any attendable token
    m0 = jnp.full((nh, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((nh, 1), jnp.float32)
    a0 = jnp.zeros((nh, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_db(
    q: jax.Array,  # (B, nh, hd)
    k_pages: jax.Array,  # (P, nh, page, hd) int8
    k_scale: jax.Array,  # (P, nh, page) f32
    v_pages: jax.Array,
    v_scale: jax.Array,
    tables: jax.Array,  # (B, AP) int32
    pos: jax.Array,  # (B,) int32
    interpret: bool = False,
) -> jax.Array:
    """Double-buffered variant of `paged_decode_attention`: pools stay in HBM
    (`memory_space=ANY`) and each slot's pages stream through a manual 2-deep
    DMA pipeline, so only the pages below ``pos[b]`` are ever fetched (the
    grid variant DMAs the full bucketed width)."""
    B, nh, hd = q.shape
    page = k_pages.shape[2]
    AP = tables.shape[1]
    scale = 1.0 / (hd**0.5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nh, hd), lambda b, tbl, pos: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nh, hd), lambda b, tbl, pos: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, nh, page, hd), jnp.int8),
            pltpu.VMEM((2, nh, page), jnp.float32),
            pltpu.VMEM((2, nh, page, hd), jnp.int8),
            pltpu.VMEM((2, nh, page), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_db_kernel, page=page, AP=AP, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nh, hd), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tables, pos, q, k_pages, k_scale, v_pages, v_scale)
