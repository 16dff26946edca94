"""GPTQ solver in JAX (reference `lit_llama/quantization.py:424-614`, after
E. Frantar et al., "GPTQ: Accurate Post-training Compression for GPT", arXiv:2210.17323).

Redesign notes (TPU-first):
  * Hessian accumulation is a jitted rank-k update over calibration batches — the
    forward-hook machinery of the reference becomes explicit activation capture
    (see `quant/pipeline.py`).
  * The column-sequential error-feedback loop keeps the reference's exact blocked
    structure (`quantization.py:557-592`): a `lax.scan` over columns inside each
    block (rank-1 updates on an (N, blocksize) tile in VMEM-sized working set),
    then one level-3 matmul pushes the block's accumulated error into the remaining
    columns. Everything is one jit per (N, K) shape.
  * Orientation follows the reference internally — W is (out=N, in=K), H is (K, K) —
    and `pack_prequantized` transposes to this framework's (K, N) layout at the end.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.quant.linear import pack_prequantized


# ---------------------------------------------------------------------------
# Hessian accumulation (reference `collect_input_stats`, quantization.py:513-527)
# ---------------------------------------------------------------------------

@jax.jit
def hessian_update(H: jax.Array, nsamples: jax.Array, x: jax.Array):
    """Online update ``H <- H * n/(n+b) + 2/(n+b) * X^T X``.

    x: ``(..., K)`` activations feeding one linear; batch dim(s) flattened. The
    *sample* count increments by the leading-dim size (matching the reference's
    per-forward `tmp = inp.shape[0]`).
    """
    b = x.shape[0]
    x2d = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    new_n = nsamples + b
    H = H * (nsamples / new_n)
    coef = 2.0 / new_n
    H = H + coef * (x2d.T @ x2d)
    return H, new_n


def init_hessian(K: int) -> Tuple[jax.Array, jax.Array]:
    return jnp.zeros((K, K), jnp.float32), jnp.float32(0.0)


# ---------------------------------------------------------------------------
# Scale/zero search (reference `find_params_weight`, quantization.py:475-511)
# ---------------------------------------------------------------------------

def _find_params_rows(w: jax.Array, maxq: int, sym: bool):
    """Per-row (out-channel) scale/zero of ``w`` (N, k_window). Returns (N,), (N,)."""
    xmin = jnp.minimum(w.min(axis=1), 0.0)
    xmax = jnp.maximum(w.max(axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
    return scale, zero


def _quantize_col(w, scale, zero, maxq):
    """Round a column to levels and reconstruct (reference `quantize_weight`)."""
    q = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
    return q, scale * (q - zero)


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("bits", "blocksize", "groupsize", "actorder", "sym"),
)
def gptq_solve(
    W: jax.Array,  # (N, K) float — torch/reference orientation (out, in)
    H: jax.Array,  # (K, K) float32
    *,
    bits: int = 4,
    blocksize: int = 128,
    percdamp: float = 0.01,
    groupsize: int = -1,
    actorder: bool = False,
    sym: bool = False,
):
    """Run GPTQ. Returns (q_levels (N, K) float levels in [0, maxq],
    scales (N, n_tiles), zeros (N, n_tiles), total_error scalar).

    Faithful to `GPTQQuantizer.quantize` (`lit_llama/quantization.py:529-614`):
    dead-column handling, optional actorder permutation, damped Cholesky inverse,
    column-block loop with error feedback, per-group scale recomputation.
    """
    assert not (actorder and groupsize != -1), \
        "the permutation trick does not work for grouped quantization"
    N, K = W.shape
    maxq = 2**bits - 1
    W = W.astype(jnp.float32)

    dead = jnp.diag(H) == 0
    H = jnp.where(jnp.diag(dead), 1.0, H)
    W = jnp.where(dead[None, :], 0.0, W)

    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]

    # initial whole-row params (used when groupsize == -1)
    scale0, zero0 = _find_params_rows(W, maxq, sym)
    n_tiles = 1 if groupsize == -1 else (K + groupsize - 1) // groupsize
    scales = jnp.tile(scale0[:, None], (1, n_tiles))
    zeros = jnp.tile(zero0[:, None], (1, n_tiles))

    # damped Cholesky chain (quantization.py:549-555):
    # Hinv_chol = cholesky(inv(H + damp I), upper=True)
    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(K, dtype=H.dtype)
    L = jnp.linalg.cholesky(H)
    Hinv_full = jax.scipy.linalg.cho_solve((L, True), jnp.eye(K, dtype=H.dtype))
    Hinv = jax.scipy.linalg.cholesky(Hinv_full, lower=False)  # upper

    Q = jnp.zeros_like(W)
    total_err = jnp.float32(0.0)

    for i1 in range(0, K, blocksize):
        i2 = min(i1 + blocksize, K)
        count = i2 - i1
        W1 = jax.lax.dynamic_slice(W, (0, i1), (N, count))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (i1, i1), (count, count))

        def col_body(carry, i):
            W1, Err1, Q1, scales, zeros, loss = carry
            w = jax.lax.dynamic_slice(W1, (0, i), (N, 1))[:, 0]
            d = Hinv1[i, i]

            if groupsize != -1:
                # recompute group params at group starts, from the error-updated W1
                gstart_rel = i  # group windows are blocksize-aligned (asserted below)
                def recompute(args):
                    scales, zeros = args
                    win = jax.lax.dynamic_slice(W1, (0, i), (N, min(groupsize, count)))
                    s, z = _find_params_rows(win, maxq, sym)
                    g_idx = (i1 + i) // groupsize
                    scales = jax.lax.dynamic_update_slice(
                        scales, s[:, None], (0, g_idx)
                    )
                    zeros = jax.lax.dynamic_update_slice(zeros, z[:, None], (0, g_idx))
                    return scales, zeros

                scales, zeros = jax.lax.cond(
                    (i1 + i) % groupsize == 0, recompute, lambda a: a, (scales, zeros)
                )
                g_idx = (i1 + i) // groupsize
                scale = jax.lax.dynamic_slice(scales, (0, g_idx), (N, 1))[:, 0]
                zero = jax.lax.dynamic_slice(zeros, (0, g_idx), (N, 1))[:, 0]
            else:
                scale, zero = scale0, zero0

            q, w_rec = _quantize_col(w, scale, zero, maxq)
            err = (w - w_rec) / d
            loss = loss + jnp.sum((w - w_rec) ** 2 / d**2) / 2

            # rank-1 error feedback into the remaining columns of this block
            row = Hinv1[i, :]  # (count,)
            cols = jnp.arange(count)
            upd = jnp.where(cols[None, :] >= i, err[:, None] * row[None, :], 0.0)
            W1 = W1 - upd
            Err1 = jax.lax.dynamic_update_slice(Err1, err[:, None], (0, i))
            Q1 = jax.lax.dynamic_update_slice(Q1, q[:, None], (0, i))
            return (W1, Err1, Q1, scales, zeros, loss), None

        init = (
            W1,
            jnp.zeros((N, count), jnp.float32),
            jnp.zeros((N, count), jnp.float32),
            scales,
            zeros,
            total_err,
        )
        (W1, Err1, Q1, scales, zeros, total_err), _ = jax.lax.scan(
            col_body, init, jnp.arange(count)
        )

        Q = jax.lax.dynamic_update_slice(Q, Q1, (0, i1))
        # level-3 push of the block's error into all remaining columns
        if i2 < K:
            rest = jax.lax.dynamic_slice(W, (0, i2), (N, K - i2))
            Hrest = jax.lax.dynamic_slice(Hinv, (i1, i2), (count, K - i2))
            rest = rest - Err1 @ Hrest
            W = jax.lax.dynamic_update_slice(W, rest, (0, i2))

    if actorder:
        invperm = jnp.argsort(perm)
        Q = Q[:, invperm]

    return Q, scales, zeros, total_err


def gptq_quantize_linear(
    w_kn: jax.Array,  # (K, N) — this framework's layout
    H: jax.Array,
    *,
    bits: int = 4,
    blocksize: int = 128,
    percdamp: float = 0.01,
    groupsize: int = -1,
    actorder: bool = False,
    sym: bool = False,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """GPTQ-quantize a (K, N) weight given its input Hessian; returns the packed
    quantized leaf dict (layout of `quant/linear.py`) and the solver error."""
    if groupsize != -1:
        assert blocksize % groupsize == 0 or groupsize % blocksize == 0, (
            "group windows must not straddle solver blocks"
        )
    Q, scales, zeros, err = gptq_solve(
        w_kn.T,
        H,
        bits=bits,
        blocksize=blocksize,
        percdamp=percdamp,
        groupsize=groupsize,
        actorder=actorder,
        sym=sym,
    )
    params = pack_prequantized(Q.T, scales.T, zeros.T, bits, groupsize=groupsize)
    return params, err
