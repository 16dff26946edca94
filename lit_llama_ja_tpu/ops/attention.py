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


def quantize_kv4(k: jax.Array, v: jax.Array, head_axis: int = -2):
    """Per-(token, head) absmax INT4 quantization, packed 2 values/byte across
    ADJACENT HEAD PAIRS (head 2j in the low nibble, 2j+1 in the high), keeping
    the full head_dim as the trailing axis.

    Why head pairs, not adjacent hd elements: a trailing hd/2 = 64-byte dim
    pads to 128 TPU lanes, silently DOUBLING the packed cache's real HBM
    footprint and traffic — which is why the element-packed int4 cache never
    beat int8 on throughput and why large batches stopped fitting (PERF.md
    round 2, "int4 KV lane padding"). Head-pair planes keep 128 lanes, a
    token's write still produces both nibbles of every byte (no
    read-modify-write — the write-only commit dispatch survives), and the
    attention contraction splits over even/odd HEADS instead of hd elements
    (`int4_scores`/`int4_values`) so no unpacked cache materializes.

    k, v: (..., nh at ``head_axis``, ..., hd) with nh even ->
    (uint8 with nh/2 at ``head_axis``, f32 scales (..., 1) in the ORIGINAL
    per-head layout).
    """

    def one(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7) + 8
        q = jnp.moveaxis(q.astype(jnp.uint8), head_axis, -2)
        assert q.shape[-2] % 2 == 0, "int4 KV needs an even head count"
        packed = q[..., 0::2, :] | (q[..., 1::2, :] << 4)
        return jnp.moveaxis(packed.astype(jnp.uint8), -2, head_axis), scale

    kq, ks = one(k)
    vq, vs = one(v)
    return kq, ks, vq, vs


def int4_scores(q: jax.Array, packed: jax.Array) -> jax.Array:
    """q (B, nh, T, hd) · head-pair-packed keys (B, nh/2, S, hd) →
    scores (B, nh, T, S). Even heads read the low nibbles, odd the high;
    int8 nibble planes fuse into the dots (no unpacked cache)."""
    lo, hi = _unpack4(packed)
    ae = jnp.einsum("bhqd,bhsd->bhqs", q[:, 0::2], lo.astype(q.dtype))
    ao = jnp.einsum("bhqd,bhsd->bhqs", q[:, 1::2], hi.astype(q.dtype))
    B, nh2, T, S = ae.shape
    return jnp.stack([ae, ao], axis=2).reshape(B, 2 * nh2, T, S)


def int4_values(att: jax.Array, packed: jax.Array) -> jax.Array:
    """att (B, nh, T, S) · head-pair-packed values (B, nh/2, S, hd) →
    y (B, nh, T, hd)."""
    vlo, vhi = _unpack4(packed)
    ye = jnp.einsum("bhqs,bhsd->bhqd", att[:, 0::2], vlo.astype(att.dtype))
    yo = jnp.einsum("bhqs,bhsd->bhqd", att[:, 1::2], vhi.astype(att.dtype))
    B, nh2, T, hd = ye.shape
    return jnp.stack([ye, yo], axis=2).reshape(B, 2 * nh2, T, hd)


def _unpack4(packed: jax.Array):
    """(..., hd) uint8 head-pair planes -> centered int8 nibbles
    (lo = even heads, hi = odd heads).

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
    k_q: jax.Array,  # (B, nh/2, S, hd) uint8 head-pair packed
    k_scale: jax.Array,  # (B, nh, S, 1) f32
    v_q: jax.Array,
    v_scale: jax.Array,
    input_pos: jax.Array,
) -> jax.Array:
    """Decode attention against an INT4 head-pair-packed KV cache.

    The packed bytes stream from HBM at true nibble width (the trailing dim
    stays hd = 128 lanes — no padding); the contraction splits over even/odd
    HEADS (`int4_scores`/`int4_values`) and scales fold exactly as in
    `decode_attention_quant`.
    """
    B, nh, T, hd = q.shape
    S = k_q.shape[2]
    scale = 1.0 / (hd**0.5)
    slot = jnp.arange(S, dtype=input_pos.dtype)
    mask = (slot[None, :] <= input_pos[:, None])[None, None]
    att = int4_scores(q, k_q)
    att = att * k_scale[..., 0][:, :, None, :].astype(jnp.float32)
    att = jnp.where(mask, att * scale, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    att = (att * v_scale[..., 0][:, :, None, :]).astype(q.dtype)
    return int4_values(att, v_q)
