"""Pallas causal flash attention for TPU (prefill / full-sequence path).

Replaces `F.scaled_dot_product_attention` (reference `lit_llama/model.py:237`) for
long sequences: O(T) memory via online softmax — no (T, T) score materialization.

Design:
  * Grid (batch*heads, q-blocks, k-blocks), k innermost; running (max, sum, acc)
    live in VMEM scratch across the k axis.
  * Causality block-skipped: k-blocks strictly above the diagonal do no work
    (`pl.when`), the diagonal block applies the per-element triangle mask.
  * Softmax statistics in f32; q·k^T and p·v on the MXU with f32 accumulation.

Gradients: `flash_attention` carries a custom VJP whose backward is ALSO
blockwise Pallas (FlashAttention-2 style): the forward additionally emits the
per-row logsumexp, and two kernels recompute probabilities block-by-block from
it — `dq` accumulating over k-blocks, `dk`/`dv` accumulating over q-blocks —
so the backward never materializes (T, T) either. This is what lifts training
MFU at long T: the previous XLA-recompute backward built the full score matrix
and dominated the train step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                  *, scale, n_kb):
    """One (bq, hd) output block; online softmax over the k grid axis."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(ki <= qi)
    def _():
        q = q_ref[0]  # (bq, hd)
        k = k_ref[0]  # (bk, hd)
        v = v_ref[0]  # (bk, hd)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (bq, bk)

        bq, bk = s.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qi * bq
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
        s = jnp.where(col <= row, s, NEG_INF)

        m_prev = m_ref[:]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)  # (bq, 1)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    # the diagonal block is the last *contributing* k-block for a causal row
    @pl.when(ki == qi)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # per-row logsumexp, consumed by the backward kernels (causal rows
        # always see their own diagonal, so l > 0). Stored (T, 1): Mosaic
        # requires the trailing block dims be (8k, 128m) or the full axis.
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_q: int, block_k: int, interpret: bool,
) -> jax.Array:
    B, nh, T, hd = q.shape
    scale = 1.0 / (hd**0.5)
    bq = min(block_q, T)
    bk = min(block_k, T)
    assert T % bq == 0 and T % bk == 0, (T, bq, bk)
    assert bq == bk, "equal q/k blocks keep the diagonal mask one block wide"
    n_kb = T // bk

    qf = q.reshape(B * nh, T, hd)
    kf = k.reshape(B * nh, T, hd)
    vf = v.reshape(B * nh, T, hd)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_kb=n_kb),
        grid=(B * nh, T // bq, n_kb),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * nh, T, hd), q.dtype),
            jax.ShapeDtypeStruct((B * nh, T, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nh * T * T * hd // 2,  # causal ~half
            bytes_accessed=3 * B * nh * T * hd * 2 + B * nh * T * hd * 2,
            transcendentals=B * nh * T * T // 2,
        ),
    )(qf, kf, vf)
    return out.reshape(B, nh, T, hd), lse.reshape(B, nh, T)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref, acc_ref, *, scale
):
    """dq for one (bq, hd) block, accumulating over the k grid axis:
    p = exp(s − lse); ds = p·(dOᵀv − D)·scale; dq = Σ ds·k."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ki <= qi)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        bq, bk = s.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qi * bq
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
        s = jnp.where(col <= row, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0])  # (bq, bk) f32; masked cols -> 0
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dd_ref[0]) * scale
        acc_ref[:] += jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(ki == qi)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, n_qb,
):
    """dk/dv for one (bk, hd) block, accumulating over the q grid axis:
    dv = Σ pᵀ·dO; dk = Σ dsᵀ·q. The first contributing q-block for column
    block j is q-block j (causality), the last is always the final one."""
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == kj)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(qi >= kj)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        bq, bk = s.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qi * bq
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + kj * bk
        s = jnp.where(col <= row, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0])  # (bq, bk)
        dv_acc[:] += jnp.dot(
            p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dd_ref[0]) * scale
        dk_acc[:] += jnp.dot(
            ds.astype(q.dtype).T, q, preferred_element_type=jnp.float32
        )

    @pl.when(qi == n_qb - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, g, block_q, block_k, interpret):
    B, nh, T, hd = q.shape
    scale = 1.0 / (hd**0.5)
    bq = min(block_q, T)
    bk = min(block_k, T)
    n_qb, n_kb = T // bq, T // bk
    BH = B * nh
    qf = q.reshape(BH, T, hd)
    kf = k.reshape(BH, T, hd)
    vf = v.reshape(BH, T, hd)
    gf = g.reshape(BH, T, hd).astype(q.dtype)
    lsef = lse.reshape(BH, T, 1)
    # D_i = Σ_d dO·O per row (the softmax-normalization term of ds)
    dd = jnp.sum(
        gf.astype(jnp.float32) * o.reshape(BH, T, hd).astype(jnp.float32),
        axis=-1, keepdims=True,
    )

    qspec = pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(BH, n_qb, n_kb),
        interpret=interpret,
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * BH * T * T * hd // 2,
            bytes_accessed=5 * BH * T * hd * 2,
            transcendentals=BH * T * T // 2,
        ),
    )(qf, kf, vf, gf, lsef, dd)

    # dkv grid: k-blocks outer, q-blocks inner (accumulate down the column)
    qspec2 = pl.BlockSpec((1, bq, hd), lambda b, j, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk, hd), lambda b, j, i: (b, j, 0),
                          memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, n_qb=n_qb),
        grid=(BH, n_kb, n_qb),
        interpret=interpret,
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2],
        out_specs=[
            pl.BlockSpec((1, bk, hd), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, hd), k.dtype),
            jax.ShapeDtypeStruct((BH, T, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * BH * T * T * hd // 2,
            bytes_accessed=5 * BH * T * hd * 2,
            transcendentals=BH * T * T // 2,
        ),
    )(qf, kf, vf, gf, lsef, dd)
    shape = (B, nh, T, hd)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_q: int = 256, block_k: int = 256, interpret: bool = False,
) -> jax.Array:
    """Causal flash attention; q/k/v ``(B, n_head, T, head_dim)``."""
    return _flash_forward(q, k, v, block_q, block_k, interpret)[0]


def _fwd(q, k, v, block_q, block_k, interpret):
    o, lse = _flash_forward(q, k, v, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _bwd(block_q, block_k, interpret, residuals, g):
    q, k, v, o, lse = residuals
    return _flash_backward(q, k, v, o, lse, g, block_q, block_k, interpret)


flash_attention.defvjp(_fwd, _bwd)
