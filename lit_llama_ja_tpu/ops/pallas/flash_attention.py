"""Pallas causal flash attention for TPU (prefill / full-sequence path).

Replaces `F.scaled_dot_product_attention` (reference `lit_llama/model.py:237`) for
long sequences: O(T) memory via online softmax — no (T, T) score materialization.

Design:
  * Grid (batch*heads, q-blocks, k-blocks), k innermost; running (max, sum, acc)
    live in VMEM scratch across the k axis.
  * Causality block-skipped: k-blocks strictly above the diagonal do no work
    (`pl.when`), the diagonal block applies the per-element triangle mask.
  * Softmax statistics in f32; q·k^T and p·v on the MXU with f32 accumulation.

Gradients: `flash_attention` carries a custom VJP whose backward recomputes
attention with the XLA reference implementation (correct, O(T^2) only inside the
backward pass) — training works today, and a fused backward kernel can slot in
behind the same signature later.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, n_kb):
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

    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nh, T, hd), q.dtype),
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
    return out.reshape(B, nh, T, hd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_q: int = 256, block_k: int = 256, interpret: bool = False,
) -> jax.Array:
    """Causal flash attention; q/k/v ``(B, n_head, T, head_dim)``."""
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _fwd(q, k, v, block_q, block_k, interpret):
    return _flash_forward(q, k, v, block_q, block_k, interpret), (q, k, v)


def _bwd(block_q, block_k, interpret, residuals, g):
    # Recompute-based backward through the XLA reference attention. MUST call
    # the _sdpa primitive directly: going through `ops.attention.causal_attention`
    # would re-dispatch to flash_attention on TPU and recurse into this very
    # function at trace time.
    from lit_llama_ja_tpu.ops.attention import _sdpa

    q, k, v = residuals
    T = q.shape[2]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
    _, vjp = jax.vjp(lambda q, k, v: _sdpa(q, k, v, mask, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
