"""Scaled dot-product attention (reference `lit_llama/model.py:230-237`).

XLA implementations. On TPU, XLA fuses the softmax chain well for moderate sequence
lengths; the Pallas flash-attention kernel in `ops/pallas/flash_attention.py` takes over
for long-sequence prefill where O(T^2) materialization would blow HBM.

Two entry points:
  * `causal_attention`  — full-sequence training/prefill path (no cache).
  * `decode_attention`  — query of T tokens against a fixed-size KV cache with an
    explicit validity mask derived from positions (the KV-cache decode path).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sdpa(q, k, v, mask, scale):
    # q: (B, nh, Tq, hd), k/v: (B, nh, Tk, hd), mask: broadcastable to (B, nh, Tq, Tk)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    att = jnp.where(mask, att.astype(jnp.float32), -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def causal_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Causal self-attention over a full sequence.

    On TPU, long aligned sequences dispatch to the Pallas flash-attention kernel
    (O(T) memory, `ops/pallas/flash_attention.py`); otherwise the XLA softmax chain
    runs (which XLA fuses well at short T).

    Args:
      q, k, v: ``(B, n_head, T, head_dim)``.
    Returns:
      ``(B, n_head, T, head_dim)``.
    """
    T, hd = q.shape[2], q.shape[3]
    # Sub-128 head dims run zero-padded to the lane width: the kernel stays in
    # its native hd=128 shape (compiling an hd=64 kernel variant triggers a
    # Mosaic train-step compile pathology, ROADMAP item 6), the true softmax
    # scale 1/sqrt(hd) is folded into q, and padded output columns are sliced
    # off. Despite the bandwidth waste this measures 1.6x FASTER than the XLA
    # softmax chain at hd=64, T=2048 (PERF.md) — and it covers every ja config
    # (hd 64/78) for long-context training.
    use_flash = (
        jax.default_backend() == "tpu"
        and T >= 1024
        and T % 256 == 0
        and hd <= 128
    )
    if use_flash:
        from lit_llama_ja_tpu.ops.pallas.flash_attention import flash_attention

        if hd < 128:
            pad = ((0, 0), (0, 0), (0, 0), (0, 128 - hd))
            qp = jnp.pad(q * jnp.asarray((128.0 / hd) ** 0.5, q.dtype), pad)
            return flash_attention(qp, jnp.pad(k, pad), jnp.pad(v, pad))[..., :hd]
        return flash_attention(q, k, v)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))[None, None]
    return _sdpa(q, k, v, mask, scale)


def decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    input_pos: jax.Array,
) -> jax.Array:
    """Attention of T query tokens at positions ``input_pos`` against a full KV cache.

    The cache holds ``S`` slots; slot ``j`` is attendable by query ``i`` iff
    ``j <= input_pos[i]`` (strictly causal over absolute positions, matching the
    reference's mask gather at `lit_llama/model.py:103-104`).

    Args:
      q: ``(B, n_head, T, head_dim)`` — the new tokens' queries.
      k, v: ``(B, n_head, S, head_dim)`` — the updated cache.
      input_pos: ``(T,)`` int32 absolute positions of the query tokens.
    """
    S = k.shape[2]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    slot = jnp.arange(S, dtype=input_pos.dtype)
    mask = slot[None, :] <= input_pos[:, None]  # (T, S)
    return _sdpa(q, k, v, mask[None, None], scale)


def decode_attention_quant(
    q: jax.Array,
    k_q: jax.Array,  # (B, nh, S, hd) int8
    k_scale: jax.Array,  # (B, nh, S, 1) f32
    v_q: jax.Array,
    v_scale: jax.Array,
    input_pos: jax.Array,
) -> jax.Array:
    """Decode attention against an INT8-quantized KV cache (per-slot absmax scales).

    The dequant never materializes a bf16 cache: the k scale factors out of the
    dot onto the (Tq, S) score matrix (``q·(k_j s_j) = (q·k_j) s_j``) and the v
    scale folds into the attention weights (``Σ_j p_j v_j s_j = Σ_j (p_j s_j) v_j``),
    so the cache streams from HBM at int8 width and only O(Tq·S) corrections run
    on the VPU.
    """
    S = k_q.shape[2]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    slot = jnp.arange(S, dtype=input_pos.dtype)
    mask = (slot[None, :] <= input_pos[:, None])[None, None]  # (1, 1, T, S)
    att = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k_q.astype(q.dtype)
    ) * k_scale[..., 0][:, :, None, :].astype(jnp.float32)
    att = jnp.where(mask, att * scale, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    att = att * v_scale[..., 0][:, :, None, :]
    return jnp.einsum(
        "bhqk,bhkd->bhqd", att.astype(q.dtype), v_q.astype(q.dtype)
    )


def quantize_kv(k: jax.Array, v: jax.Array):
    """Per-slot (token, head) absmax INT8 quantization of new k/v entries.

    k, v: (B, nh, T, hd) -> (int8 values, f32 scales (B, nh, T, 1)).
    """
    def one(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
            jnp.int8
        )
        return q, scale

    kq, ks = one(k)
    vq, vs = one(v)
    return kq, ks, vq, vs


def prefix_attention(q: jax.Array, ak: jax.Array, av: jax.Array) -> jax.Array:
    """Unmasked cross-attention against an adapter prefix (reference
    `lit_llama/adapter.py:160-164`): every query sees every prefix slot.

    Args:
      q: ``(B, n_head, T, head_dim)``; ak/av: ``(B, n_head, aT, head_dim)``.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    mask = jnp.ones((1, 1, 1, ak.shape[2]), dtype=bool)
    return _sdpa(q, ak, av, mask, scale)


def quantize_kv4(k: jax.Array, v: jax.Array):
    """Per-(token, head) absmax INT4 quantization, packed 2 values/byte along
    head_dim (even indices in the low nibble, odd in the high — the same
    even/odd split the int4 weight kernel uses, so the attention contraction
    never materializes an unpacked cache; see `decode_attention_quant4`).

    k, v: (..., hd) with hd even -> (uint8 (..., hd/2), f32 scales (..., 1)).
    """

    def one(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7) + 8
        q = q.astype(jnp.uint8)
        lo = q[..., 0::2]
        hi = q[..., 1::2]
        return (lo | (hi << 4)).astype(jnp.uint8), scale

    kq, ks = one(k)
    vq, vs = one(v)
    return kq, ks, vq, vs


def _unpack4(packed: jax.Array):
    """(..., hd/2) uint8 -> centered int8 nibbles (lo=even dims, hi=odd).

    Stays in 8-bit arithmetic end to end: an int32 intermediate made XLA
    materialize two full-width planes after the page gather (4x the int8
    path's HBM traffic — PERF.md "INT4 KV cache"); int8 nibbles keep the
    unpack in the same fused convert-into-dot regime as the int8 KV path.
    """
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8) - jnp.int8(8)
    hi = (packed >> jnp.uint8(4)).astype(jnp.int8) - jnp.int8(8)
    return lo, hi


def decode_attention_quant4(
    q: jax.Array,  # (B, nh, T, hd)
    k_q: jax.Array,  # (B, nh, S, hd/2) uint8 packed
    k_scale: jax.Array,  # (B, nh, S, 1) f32
    v_q: jax.Array,
    v_scale: jax.Array,
    input_pos: jax.Array,
) -> jax.Array:
    """Decode attention against an INT4-packed KV cache.

    The packed bytes stream from HBM at nibble width; the q·k contraction
    splits into even/odd halves (``q·k = q_even·lo + q_odd·hi``) and the p·v
    output re-interleaves at the end — scales fold exactly as in
    `decode_attention_quant`.
    """
    B, nh, T, hd = q.shape
    S = k_q.shape[2]
    scale = 1.0 / (hd**0.5)
    slot = jnp.arange(S, dtype=input_pos.dtype)
    mask = (slot[None, :] <= input_pos[:, None])[None, None]
    lo, hi = _unpack4(k_q)
    att = jnp.einsum("bhqd,bhsd->bhqs", q[..., 0::2], lo.astype(q.dtype)) + jnp.einsum(
        "bhqd,bhsd->bhqs", q[..., 1::2], hi.astype(q.dtype)
    )
    att = att * k_scale[..., 0][:, :, None, :].astype(jnp.float32)
    att = jnp.where(mask, att * scale, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    att = (att * v_scale[..., 0][:, :, None, :]).astype(q.dtype)
    vlo, vhi = _unpack4(v_q)
    ye = jnp.einsum("bhqs,bhsd->bhqd", att, vlo.astype(q.dtype))
    yo = jnp.einsum("bhqs,bhsd->bhqd", att, vhi.astype(q.dtype))
    return jnp.stack([ye, yo], axis=-1).reshape(B, nh, T, hd)
