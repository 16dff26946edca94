"""Paged KV cache + paged continuous-batching engine.

`infer/serving.py`'s Engine reserves a full ``max_seq`` stripe of cache per slot —
the reference's own semantics (prompts capped at block_size, `lit_llama/model.py:92-94`)
but wasteful under mixed-length serving. Here the cache is a **page pool**:

  * Pool: ``(L, n_pages, nh, page_size, hd)`` (bf16 or INT8+scales, heads-major)
    — KV memory is a shared budget, not a per-slot reservation.
  * Each slot holds a **page table** ``(maxP,)`` of pool indices; position ``p``
    lives at ``(table[p // page], p % page)``. Tables are tiny int32 arrays the
    host updates only when a slot crosses a page boundary.
  * **Page 0 is the trash page**: prefill padding and unallocated table entries
    point at it; writes land harmlessly and reads of it are position-masked.
  * Attention gathers a slot's pages back into a contiguous view — the gather IS
    the cache read (same HBM bytes as the dense layout), with the attended width
    bucketed per step (power-of-two pages) so short sequences never stream the
    whole table width.
  * **Prefix sharing**: a registered prompt prefix's *full* pages are inserted
    into any request's table by reference (refcounted, read-only — per-slot
    writes always target positions past the shared span); only the remainder
    re-prefills. N requests over a common system prompt hold ONE copy of its KV.

The prompt-length cap becomes ``maxP·page − 1`` (table width, default well past
block_size) instead of the slot stripe; admission simply waits when the pool has
no free pages (real memory backpressure instead of OOM).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import bucket_length
from lit_llama_ja_tpu.models.llama import apply_linear, mlp_block
from lit_llama_ja_tpu.ops.attention import quantize_kv
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import build_rope_cache
from lit_llama_ja_tpu.ops.sampling import sample_token

PagePool = Dict[str, jax.Array]


def init_page_pool(
    config: LLaMAConfig,
    n_pages: int,
    page_size: int,
    dtype=jnp.bfloat16,
    quantized=False,
) -> PagePool:
    """Zero page pool ``(L, n_pages, nh, page_size, hd)`` (+ per-token scales
    ``(L, n_pages, nh, page_size)`` when quantized).

    ``quantized``: False | True/"int8" | "int4" (packed 2/byte across head
    pairs — half the int8 pool bytes with NO lane padding; see
    `ops/attention.quantize_kv4`).

    Heads-major layout: a page block ``(nh, page, hd)`` feeds both the XLA
    einsum path (matches `decode_attention`'s ``bhsd``) and the Pallas decode
    kernel (`ops/pallas/paged_attention.py`) without any relayout.

    ``n_pages`` includes the reserved trash page 0; usable KV budget is
    ``(n_pages − 1) · page_size`` tokens across all slots.
    """
    shape = (
        config.n_layer, n_pages, config.n_head, page_size, config.head_dim
    )
    sshape = shape[:-1]
    if quantized == "int4":
        # head-pair packed: nh/2 byte planes of FULL head_dim (128 lanes; an
        # hd/2 trailing dim would pad 64→128 and double real HBM use)
        pshape = (
            config.n_layer, n_pages, config.n_head // 2,
            page_size, config.head_dim,
        )
        return {
            "k": jnp.zeros(pshape, jnp.uint8),
            "v": jnp.zeros(pshape, jnp.uint8),
            "k_scale": jnp.ones(sshape, jnp.float32),
            "v_scale": jnp.ones(sshape, jnp.float32),
        }
    if quantized:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.ones(sshape, jnp.float32),
            "v_scale": jnp.ones(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _gathered(cache_l: Dict[str, jax.Array], tables: jax.Array):
    """Gather pages into per-slot contiguous ``bhsd`` views.

    cache_l leaves ``(n_pages, nh, page, ...)``; tables ``(B, AP)`` →
    ``(B, nh, AP·page, ...)``.
    """
    B, AP = tables.shape
    out = {}
    for key, val in cache_l.items():
        nh, page = val.shape[1], val.shape[2]
        g = val[tables]  # (B, AP, nh, page, x)
        g = jnp.moveaxis(g, 2, 1)  # (B, nh, AP, page, x)
        out[key] = g.reshape(B, nh, AP * page, *val.shape[3:])
    return out


def _masked_softmax(att: jax.Array, mask: jax.Array) -> jax.Array:
    """Softmax over masked scores that is NaN-proof in BOTH directions:

    - an all-masked row (e.g. an idle slot whose query position is clamped
      out of range) yields zero weights, not NaN (``jax.nn.softmax`` of an
      all ``-inf`` row is NaN);
    - masked slots get an EXACT 0.0 weight, so junk in the shared trash page
      (page 0, written by idle slots) can never reach active slots through
      the value einsum — IEEE ``0 * NaN = NaN`` would otherwise leak row-to-
      row via shared pages. Observed: one idle slot NaN-poisoned the whole
      batch's logits (the draft path of the speculative engine)."""
    att = jnp.where(mask, att, -jnp.inf)
    m = jnp.max(att, axis=-1, keepdims=True)
    e = jnp.exp(att - jnp.where(jnp.isfinite(m), m, 0.0))
    e = jnp.where(mask, e, 0.0)
    return e / jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)


def _paged_attention(q, gath, pos, quantized):
    """q: (B, nh, T, hd); gath leaves (B, nh, S, hd) (S = AP·page);
    pos: (B, T) absolute positions of the query tokens. Same masked-softmax /
    folded-scale math as `ops/attention.decode_attention_quant`(`4`),
    generalized to T query tokens (prefill) and per-(slot, token) positions."""
    S = gath["k"].shape[2]
    slot = jnp.arange(S, dtype=pos.dtype)
    mask = (slot[None, None, :] <= pos[:, :, None])[:, None]  # (B, 1, T, S)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if quantized and gath["k"].dtype == jnp.uint8:  # int4 head-pair packed
        from lit_llama_ja_tpu.ops.attention import int4_scores, int4_values

        att = int4_scores(q, gath["k"])
        att = att * gath["k_scale"][:, :, None, :].astype(jnp.float32)
        att = _masked_softmax(att * scale, mask)
        att = (att * gath["v_scale"][:, :, None, :]).astype(q.dtype)
        return int4_values(att, gath["v"])
    if quantized:
        att = jnp.einsum("bhqd,bhsd->bhqs", q, gath["k"].astype(q.dtype))
        att = att * gath["k_scale"][:, :, None, :].astype(jnp.float32)
        att = _masked_softmax(att * scale, mask)
        att = att * gath["v_scale"][:, :, None, :]
        return jnp.einsum(
            "bhqs,bhsd->bhqd", att.astype(q.dtype), gath["v"].astype(q.dtype)
        )
    att = jnp.einsum("bhqd,bhsd->bhqs", q, gath["k"].astype(q.dtype)) * scale
    att = _masked_softmax(att.astype(jnp.float32), mask).astype(q.dtype)
    return jnp.einsum("bhqs,bhsd->bhqd", att, gath["v"].astype(q.dtype))


def _span_attention(q, gath, fresh, pos0, quantized):
    """Attention of a contiguous (B, T) token span against
    ``[stale paged cache | the span's own fresh K/V]``.

    q: (B, nh, T, hd); gath: page-cache views (B, nh, S, ...) that do NOT yet
    contain the span (masked strictly below ``pos0`` (B,), the span's start
    position); fresh: the layer's write dict in write layout — k/v
    (B, T, nh, hd) (head-pair packed (B, T, nh/2, hd) for int4) + scales (B, T, nh) — quantized with
    the same math as the cache write, so results match write-then-attend; the
    span attends to itself causally. Used by the deferred-write
    `paged_block_chain` so the pool can stay a loop invariant."""
    B, nh, T, hd = q.shape
    S = gath["k"].shape[2]
    scale = 1.0 / (hd**0.5)
    slot = jnp.arange(S, dtype=pos0.dtype)
    cmask = jnp.broadcast_to(
        (slot[None, :] < pos0[:, None])[:, None, None, :], (B, 1, T, S)
    )
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = jnp.concatenate(
        [cmask, jnp.broadcast_to(causal[None, None], (B, 1, T, T))], axis=-1
    )
    fk = jnp.swapaxes(fresh["k"], 1, 2)  # (B, nh[/2], T, hd)
    fv = jnp.swapaxes(fresh["v"], 1, 2)
    if quantized and gath["k"].dtype == jnp.uint8:  # int4 head-pair packed
        from lit_llama_ja_tpu.ops.attention import int4_scores, int4_values

        fks = jnp.swapaxes(fresh["k_scale"], 1, 2)  # (B, nh, T)
        fvs = jnp.swapaxes(fresh["v_scale"], 1, 2)
        att_c = int4_scores(q, gath["k"])
        att_c = att_c * gath["k_scale"][:, :, None, :].astype(jnp.float32)
        att_f = int4_scores(q, fk)
        att_f = att_f * fks[:, :, None, :].astype(jnp.float32)
        att = _masked_softmax(
            jnp.concatenate([att_c, att_f], -1) * scale, mask
        )
        ac = (att[..., :S] * gath["v_scale"][:, :, None, :]).astype(q.dtype)
        af = (att[..., S:] * fvs[:, :, None, :]).astype(q.dtype)
        return int4_values(ac, gath["v"]) + int4_values(af, fv)
    if quantized:
        fks = jnp.swapaxes(fresh["k_scale"], 1, 2)
        fvs = jnp.swapaxes(fresh["v_scale"], 1, 2)
        att_c = jnp.einsum("bhqd,bhsd->bhqs", q, gath["k"].astype(q.dtype))
        att_c = att_c * gath["k_scale"][:, :, None, :].astype(jnp.float32)
        att_f = jnp.einsum("bhqd,bhsd->bhqs", q, fk.astype(q.dtype))
        att_f = att_f * fks[:, :, None, :].astype(jnp.float32)
        att = _masked_softmax(
            jnp.concatenate([att_c, att_f], -1) * scale, mask
        )
        ac = (att[..., :S] * gath["v_scale"][:, :, None, :]).astype(q.dtype)
        af = (att[..., S:] * fvs[:, :, None, :]).astype(q.dtype)
        return jnp.einsum(
            "bhqs,bhsd->bhqd", ac, gath["v"].astype(q.dtype)
        ) + jnp.einsum("bhqs,bhsd->bhqd", af, fv.astype(q.dtype))
    att_c = jnp.einsum("bhqd,bhsd->bhqs", q, gath["k"].astype(q.dtype))
    att_f = jnp.einsum("bhqd,bhsd->bhqs", q, fk.astype(q.dtype))
    att = _masked_softmax(
        (jnp.concatenate([att_c, att_f], -1) * scale).astype(jnp.float32), mask
    ).astype(q.dtype)
    return jnp.einsum(
        "bhqs,bhsd->bhqd", att[..., :S], gath["v"].astype(q.dtype)
    ) + jnp.einsum("bhqs,bhsd->bhqd", att[..., S:], fv.astype(q.dtype))


@partial(
    jax.jit,
    static_argnames=("config", "quantized", "use_kernel", "attn_chunk"),
    donate_argnums=(4,),
)
def paged_forward(
    params,
    toks: jax.Array,  # (B, T) int32 tokens (T=1 decode, T=P prefill)
    pos: jax.Array,  # (B, T) int32 absolute positions of those tokens
    tables: jax.Array,  # (B, AP) int32 page indices (attend width AP·page)
    pool: PagePool,
    config: LLaMAConfig,
    quantized: bool,
    use_kernel: bool = False,
    attn_chunk: Optional[int] = None,
) -> Tuple[jax.Array, PagePool]:
    """One paged forward: write each token's k/v at ``(table[pos//page], pos%page)``,
    attend against the gathered pages (write-then-attend, so a slot's own new
    tokens are visible to themselves), return (logits (B, T, V), pool).

    Unifies batched decode (T=1, B slots) and prefill (B=1, T tokens) — one
    compiled body for the whole serving engine.

    ``attn_chunk``: process the decode attention ``attn_chunk`` slots at a time
    (sequential `lax.map`). Above ~8 slots XLA stops fusing the page gather
    into the attention einsum and materializes it — chunking keeps each piece
    in the fused regime (measured: B=16 80.9 → 59.1 ms/step, PERF.md).
    """
    x = params["wte"]["weight"][toks]  # (B, T, D)
    x, new_pool = paged_block_chain(
        params["blocks"], pool, x, pos, tables, config, quantized,
        use_kernel=use_kernel, attn_chunk=attn_chunk,
    )
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    logits = apply_linear(params["lm_head"], x)
    return logits, new_pool


def paged_block_chain(
    blocks,
    pool: PagePool,
    x: jax.Array,  # (B, T, D) embedded inputs
    pos: jax.Array,  # (B, T)
    tables: jax.Array,  # (B, AP)
    config: LLaMAConfig,
    quantized,
    use_kernel: bool = False,
    attn_chunk: Optional[int] = None,
    defer_commit: bool = False,
    prefill_attn: bool = False,
    _ablate: Optional[str] = None,
) -> Tuple[jax.Array, PagePool]:
    """The transformer-block chain of `paged_forward` (everything between the
    embedding and the final norm), factored out so pipeline-parallel decode
    (`parallel/pp_decode.py`) can run it on a stage's LOCAL layer shard: the
    ``blocks``/``pool`` leading L axis may be any contiguous layer slice.

    ``defer_commit=True`` keeps the pool strictly read-only and returns
    ``(x, writes, page_idx, offs)`` for a separate `commit_writes_jit`
    dispatch (see the two-dispatch rationale at `commit_writes_jit`).

    ``_ablate`` (measurement-only, `tools/bench_serving_account.py`): replace
    a phase of the step with a shape-preserving cheap stand-in so the OTHER
    phase can be timed in situ — "no_attn" (attention+gather → y = q),
    "no_matmul" (weight matmuls → tile/slice ops; gather+attention intact),
    "skeleton" (both). Never set on serving paths; results are numerically
    meaningless by construction."""
    B, T = x.shape[:2]
    page = pool["k"].shape[3]  # leaves are (L, n_pages, nh, page, hd)
    nh, hd = config.n_head, config.head_dim
    # rope table extends to the table capacity (beyond block_size = position
    # extrapolation, same policy as parallel/sp_forward)
    rope_len = max(config.block_size, tables.shape[1] * page)
    rope_full = build_rope_cache(rope_len, config.head_dim, config.rope_base)
    rope_t = rope_full[jnp.clip(pos, 0, rope_len - 1)]  # (B, T, hd/2, 2)

    page_idx = jnp.take_along_axis(tables, pos // page, axis=1)  # (B, T)
    offs = pos % page

    def rot(t):
        # per-(slot, token) rope rotation: t (B, T, nh, hd), rope_t (B, T, hd/2, 2)
        t32 = t.astype(jnp.float32).reshape(B, T, nh, hd // 2, 2)
        rc = rope_t.astype(jnp.float32)[:, :, None]  # (B, T, 1, hd/2, 2)
        cos, sin = rc[..., 0], rc[..., 1]
        x0, x1 = t32[..., 0], t32[..., 1]
        out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
        return out.reshape(B, T, nh, hd).astype(t.dtype)

    def qkv_writes(x, block_params):
        h = rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps)
        if _ablate in ("no_matmul", "skeleton"):
            qkv = jnp.concatenate([h, h, h], axis=-1)  # shape stand-in
        else:
            qkv = apply_linear(block_params["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rot(q.reshape(B, T, nh, hd))
        k = rot(k.reshape(B, T, nh, hd))
        v = v.reshape(B, T, nh, hd)
        raw_kv = (k, v) if prefill_attn else None
        if quantized == "int4":
            from lit_llama_ja_tpu.ops.attention import quantize_kv4

            kq, ks, vq, vs = quantize_kv4(k, v)
            writes = {"k": kq, "v": vq,
                      "k_scale": ks[..., 0], "v_scale": vs[..., 0]}
        elif quantized:
            # quantize_kv reduces over the trailing hd axis only — works on the
            # (B, T, nh, hd) layout directly
            kq, ks, vq, vs = quantize_kv(k, v)
            writes = {"k": kq, "v": vq,
                      "k_scale": ks[..., 0], "v_scale": vs[..., 0]}
        else:
            writes = {"k": k.astype(pool["k"].dtype),
                      "v": v.astype(pool["v"].dtype)}
        return q, writes, raw_kv

    def finish(x, block_params, y):
        y = y.transpose(0, 2, 1, 3).reshape(B, T, config.n_embd)
        if _ablate in ("no_matmul", "skeleton"):
            x = x + y
            h = rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps)
            return x + h
        x = x + apply_linear(block_params["attn"]["c_proj"], y)
        h = rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps)
        if "moe" in block_params:
            # MoE serving: sparse-MLP blocks (models/moe.py) drop into the
            # paged engine unchanged — routing is per-token and orthogonal to
            # the KV pool. Capacity covers every (slot, token) assignment so
            # serving output is exact (no congestion drops), matching
            # forward_moe_with_cache's decode policy.
            from lit_llama_ja_tpu.core.config import find_multiple
            from lit_llama_ja_tpu.models.moe import moe_mlp

            cap = find_multiple(B * T * config.n_expert_active, 8)
            y2, _ = moe_mlp(block_params["moe"], h, config, capacity=cap)
            return x + y2
        return x + mlp_block(block_params["mlp"], h)

    L = jax.tree.leaves(blocks)[0].shape[0]

    if use_kernel:
        assert not defer_commit, "kernel path writes per-layer (no defer)"
        # The kernel path reads the span's K/V back from the pool, so the
        # in-flight raw_kv branch would be silently dropped — refuse rather
        # than quietly lose the caller's prefill_attn promise.
        assert not prefill_attn, "use_kernel does not implement prefill_attn"
        # Legacy write-then-attend path: the Pallas kernel reads the current
        # token's K/V from the pool, so each layer must scatter BEFORE
        # attending. The pool rides the scan carry (in-place per-layer
        # scatter). Kept only for the kernel variant — default OFF.
        def kbody(carry, layer_in):
            x, pool = carry
            block_params, l = layer_in
            q, writes, _ = qkv_writes(x, block_params)
            pool = {
                key: pool[key].at[l, page_idx, :, offs].set(val)
                for key, val in writes.items()
            }
            cache_l = {key: val[l] for key, val in pool.items()}
            if T == 1 and quantized and quantized != "int4":
                from lit_llama_ja_tpu.ops.pallas.paged_attention import (
                    paged_decode_attention,
                )

                y = paged_decode_attention(
                    q[:, 0].astype(jnp.bfloat16),
                    cache_l["k"], cache_l["k_scale"],
                    cache_l["v"], cache_l["v_scale"],
                    tables, pos[:, 0],
                )[:, :, None].astype(x.dtype)  # (B, nh, 1, hd)
            else:
                gath = _gathered(cache_l, tables)
                y = _paged_attention(
                    q.transpose(0, 2, 1, 3), gath, pos, quantized
                )
            return (finish(x, block_params, y), pool), None

        (x, pool), _ = jax.lax.scan(
            kbody, (x, pool), (blocks, jnp.arange(L, dtype=jnp.int32))
        )
        return x, pool

    # Deferred-write path (default): the pool is a loop-INVARIANT operand —
    # each layer gathers the stale cache (masked strictly below the span
    # start) and attends to the span's own tokens through explicit fresh
    # columns (quantized with the same math as the write, so numerics match
    # write-then-attend); the layer writes come out as tiny scan ys and ONE
    # batched scatter applies them all after the scan. Rationale (device
    # trace, 7B B=16): carrying the 2.15 GB k/v pools through the scan made
    # XLA relayout-copy each of them on while-entry AND while-exit — 4 × ~6 ms
    # = 30% of the decode step; an invariant pool + donated-input scatter
    # aliases cleanly and eliminates all four copies.
    def body(x, layer_in):
        block_params, l = layer_in
        q, writes, raw_kv = qkv_writes(x, block_params)
        cache_l = {key: val[l] for key, val in pool.items()}
        if _ablate in ("no_attn", "skeleton"):
            y = q.transpose(0, 2, 1, 3)  # skip gather+attention (measurement)
        elif prefill_attn:
            # Prefill-from-empty (static caller promise: the span starts at
            # position 0 on freshly allocated pages): the gathered pool is
            # entirely masked, so skip the (B, nh, AP*page, hd) gather +
            # dequant per layer and attend causally over the in-flight bf16
            # k/v (round-4 TTFT change, same contract as llama.forward_with_
            # cache(prefill_attn=True); exact for fp pools, sharper than the
            # quantized round-trip otherwise).
            from lit_llama_ja_tpu.ops.attention import causal_attention

            k_raw, v_raw = raw_kv
            y = causal_attention(
                q.transpose(0, 2, 1, 3),
                k_raw.transpose(0, 2, 1, 3),
                v_raw.transpose(0, 2, 1, 3),
            )
        elif T == 1 and attn_chunk and attn_chunk < B and B % attn_chunk == 0:
            nc = B // attn_chunk
            qc = q.transpose(0, 2, 1, 3).reshape(nc, attn_chunk, nh, 1, hd)
            tc = tables.reshape(nc, attn_chunk, tables.shape[1])
            p0c = pos[:, 0].reshape(nc, attn_chunk)
            frc = jax.tree.map(
                lambda w: w.reshape(nc, attn_chunk, *w.shape[1:]), writes
            )

            def one(args):
                qq, tt, pp0, fr = args
                return _span_attention(
                    qq, _gathered(cache_l, tt), fr, pp0, quantized
                )

            y = jax.lax.map(one, (qc, tc, p0c, frc)).reshape(B, nh, 1, hd)
        else:
            gath = _gathered(cache_l, tables)
            y = _span_attention(
                q.transpose(0, 2, 1, 3), gath, writes, pos[:, 0], quantized
            )
        return finish(x, block_params, y), writes

    x, all_writes = jax.lax.scan(
        body, x, (blocks, jnp.arange(L, dtype=jnp.int32))
    )
    if defer_commit:
        return x, all_writes, page_idx, offs
    # In-jit commit for callers that keep the round in one program (spec/tree
    # rounds, pp stages): one dynamic-update-slice per (slot, token), covering
    # ALL layers at once (page/offset do not depend on the layer). Trash-page
    # routing for padding/idle slots is unchanged (their page_idx is 0; last
    # duplicate write wins).
    return x, commit_writes(pool, all_writes, page_idx, offs)


def commit_writes(
    pool: PagePool,
    all_writes: Dict[str, jax.Array],  # leaves (L, B, T, nh, ...)
    page_idx: jax.Array,  # (B, T)
    offs: jax.Array,  # (B, T)
) -> PagePool:
    """Write per-(slot, token) KV entries for all layers into the pool via a
    chain of in-place dynamic-update-slices on the donated buffers.

    The chain is UNROLLED for decode-sized writes (BT ≤ 64): a
    ``lax.fori_loop`` carries the multi-GB pool leaves through the while
    loop, and XLA relayout-copies every carried leaf at while-entry AND
    while-exit — measured 33 ms/step for a B=24 7B int4 pool (~3.4 GB × 2
    copies) vs **1.7 ms** unrolled (dispatch floor; the same while-carry
    copy effect that motivated the loop-invariant pool in
    `paged_block_chain`). Prefill-sized commits (BT up to thousands) keep
    the fori_loop — unrolling would explode compile time, and the one-time
    ~30 ms is amortized over the whole span."""
    BT = page_idx.size
    flat = {
        key: val.reshape(val.shape[0], BT, *val.shape[3:])
        for key, val in all_writes.items()
    }
    pflat = page_idx.reshape(BT)
    oflat = offs.reshape(BT)

    def write_one(i, pool):
        p, o = pflat[i], oflat[i]
        new = {}
        for key, leaf in pool.items():
            upd = jax.lax.dynamic_slice_in_dim(flat[key], i, 1, axis=1)
            upd = jnp.expand_dims(upd, 3)  # (L, 1, nh, 1[, hd])
            new[key] = jax.lax.dynamic_update_slice(
                leaf, upd.astype(leaf.dtype), (0, p, 0, o, 0)[: leaf.ndim]
            )
        return new

    if BT <= 64:
        for i in range(BT):
            pool = write_one(i, pool)
        return pool
    return jax.lax.fori_loop(0, BT, write_one, pool)


# Write-only commit program: donated pool, no reads → XLA updates in place
# (~0.05 ms measured for a B=16 step at 7B). Any program that BOTH gathers
# from and writes to the multi-GB pool pays full pool copies instead (XLA's
# copy insertion cannot prove the read-before-write safe: measured ~25 ms/step
# of copy thunks at B=16 whether the write was a scan-carry scatter, a batched
# scatter, or a DUS chain) — hence the two-dispatch split below.
commit_writes_jit = jax.jit(commit_writes, donate_argnums=(0,))


@partial(
    jax.jit,
    static_argnames=(
        "config", "quantized", "attn_chunk", "prefill_attn", "_ablate"
    ),
)
def paged_forward_read(
    params,
    toks: jax.Array,  # (B, T)
    pos: jax.Array,  # (B, T)
    tables: jax.Array,  # (B, AP)
    pool: PagePool,
    config: LLaMAConfig,
    quantized: bool,
    attn_chunk: Optional[int] = None,
    prefill_attn: bool = False,
    _ablate: Optional[str] = None,
):
    """Read-only half of `paged_forward`: the pool is NOT donated and never
    written — the span's K/V comes back as ``writes`` for a separate
    `commit_writes_jit` dispatch. Returns (logits, writes, page_idx, offs).

    ``prefill_attn``: static caller promise that the span starts at position
    0 on fresh pages — attention runs causally over the in-flight k/v and the
    per-layer pool gather is skipped entirely (admission-prefill TTFT)."""
    x = params["wte"]["weight"][toks]
    x, writes, page_idx, offs = paged_block_chain(
        params["blocks"], pool, x, pos, tables, config, quantized,
        attn_chunk=attn_chunk, defer_commit=True, prefill_attn=prefill_attn,
        _ablate=_ablate,
    )
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    if _ablate in ("no_matmul", "skeleton"):
        # V-wide logits without streaming the lm_head weight (measurement)
        V = params["lm_head"]["qweight"].shape[-1] if "qweight" in \
            params["lm_head"] else params["lm_head"]["weight"].shape[-1]
        return jnp.broadcast_to(x[..., :1], (*x.shape[:-1], V)), \
            writes, page_idx, offs
    return apply_linear(params["lm_head"], x), writes, page_idx, offs


@partial(
    jax.jit,
    static_argnames=(
        "config", "quantized", "top_k", "top_p", "attn_chunk", "_ablate"
    ),
)
def _paged_decode_read_and_sample(
    params,
    toks: jax.Array,  # (B,)
    pos: jax.Array,  # (B,)
    tables: jax.Array,  # (B, AP)
    pool: PagePool,
    key: jax.Array,
    temps: jax.Array,
    config: LLaMAConfig,
    quantized: bool,
    top_k: Optional[int],
    top_p: Optional[float] = None,
    attn_chunk: Optional[int] = None,
    _ablate: Optional[str] = None,
):
    """Two-dispatch decode, read half: like `_paged_decode_and_sample` but the
    pool stays read-only; pair with `commit_writes_jit`."""
    logits, writes, page_idx, offs = paged_forward_read(
        params, toks[:, None], pos[:, None], tables, pool, config, quantized,
        attn_chunk, _ablate=_ablate,
    )
    nxt = sample_next_token(logits[:, 0], key, temps, top_k, top_p)
    return nxt, writes, page_idx, offs


@partial(
    jax.jit,
    static_argnames=("config", "quantized", "top_k", "top_p", "attn_chunk"),
    donate_argnums=(4,),
)
def _paged_decode_step_pipelined(
    params,
    toks: jax.Array,  # (B,)
    pos: jax.Array,  # (B,)
    tables: jax.Array,  # (B, AP)
    pool: PagePool,  # donated
    pending_writes: Dict[str, jax.Array],  # PREVIOUS step's writes (L, B, 1, ...)
    pending_pi: jax.Array,
    pending_of: jax.Array,
    key: jax.Array,
    temps: jax.Array,
    config: LLaMAConfig,
    quantized: bool,
    top_k: Optional[int],
    top_p: Optional[float] = None,
    attn_chunk: Optional[int] = None,
):
    """One-dispatch decode with a LAG-1 commit: apply the *previous* step's
    writes to the donated pool first (unrolled in-place DUS chain — all
    writes strictly precede all reads, so XLA's copy insertion keeps the
    donated buffers in place), then run the read-only forward on the updated
    pool. Semantically identical to read-then-commit: step t's attention must
    see tokens through pos_t − 1, which are exactly step t−1's writes.

    Why not a separate commit dispatch: on this platform a donated buffer
    that any OTHER executable has consumed never aliases — the commit pays a
    full pool copy (~29 ms for the B=24 7B int4 pool) every step. Donation
    across THIS program chains producer→consumer (pool_out(t) = pool_in(t+1))
    and aliases cleanly (measured: 103 → ~70 ms/step, tools/
    bench_serving_account.py). The engine flushes the pending writes through
    `commit_writes_jit` whenever the slot set changes (admission, retirement,
    prefill) — see `PagedEngine._flush_pending`."""
    pool = commit_writes(pool, pending_writes, pending_pi, pending_of)
    logits, writes, page_idx, offs = paged_forward_read(
        params, toks[:, None], pos[:, None], tables, pool, config, quantized,
        attn_chunk,
    )
    nxt = sample_next_token(logits[:, 0], key, temps, top_k, top_p)
    return nxt, writes, page_idx, offs, pool


@partial(
    jax.jit,
    static_argnames=("config", "quantized", "top_k", "top_p", "use_kernel",
                     "attn_chunk"),
    donate_argnums=(4,),
)
def _paged_decode_and_sample(
    params,
    toks: jax.Array,  # (B,)
    pos: jax.Array,  # (B,)
    tables: jax.Array,  # (B, AP)
    pool: PagePool,
    key: jax.Array,
    temps: jax.Array,  # (B,)
    config: LLaMAConfig,
    quantized: bool,
    top_k: Optional[int],
    top_p: Optional[float] = None,
    use_kernel: bool = False,
    attn_chunk: Optional[int] = None,
) -> Tuple[jax.Array, PagePool]:
    """Batched decode step + per-slot sampling in ONE device program (the host
    moves only B int32 tokens per step — PERF.md's ~50 ms host-gap lesson)."""
    logits, pool = paged_forward(
        params, toks[:, None], pos[:, None], tables, pool, config, quantized,
        use_kernel, attn_chunk,
    )
    nxt = sample_next_token(logits[:, 0], key, temps, top_k, top_p)
    return nxt, pool


def sample_next_token(
    logits: jax.Array,  # (B, V)
    key: jax.Array,
    temps: jax.Array,  # (B,) 0 = greedy
    top_k: Optional[int],
    top_p: Optional[float] = None,
) -> jax.Array:
    """Per-slot temperature/top-k/top-p sampling (B,) — the in-jit tail shared
    by the single-mesh and pipeline-parallel decode programs."""
    logits = logits.astype(jnp.float32)
    if top_k is not None:
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1:]
        sample_logits = jnp.where(logits < kth, -jnp.inf, logits)
    else:
        sample_logits = logits
    if top_p is not None and top_p < 1.0:
        from lit_llama_ja_tpu.ops.sampling import top_p_filter

        sample_logits = top_p_filter(sample_logits, top_p)
    safe_t = jnp.where(temps > 0, temps, 1.0)[:, None]
    sampled = jax.random.categorical(key, sample_logits / safe_t, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)


@dataclasses.dataclass
class _PagedRequest:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float
    top_k: Optional[int]
    prefix_id: Optional[int] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    preempts: int = 0


class PagedEngine:
    """Continuous-batching engine over a paged KV pool with prefix sharing."""

    def __init__(
        self,
        params,
        config: LLaMAConfig,
        *,
        max_batch: int = 8,
        n_pages: int = 256,
        page_size: int = 16,
        max_pages_per_slot: Optional[int] = None,
        quantize_kv: bool = False,
        eos_id: Optional[int] = None,
        prefill_chunk: Optional[int] = None,
        seed: int = 0,
        pp_mesh=None,
        pp_microbatches: int = 1,
        pp_split: bool = True,
        pipelined_commit: bool = False,
    ):
        """``prefill_chunk``: process prompts in chunks of at most this many
        tokens, interleaved with decode steps — a long prompt no longer stalls
        the active streams for its whole prefill (per-step latency is bounded
        by one chunk + one decode). None = whole-prompt prefill at admit.

        ``pp_mesh``: run the decode/prefill programs pipeline-parallel over
        this mesh's 'pp' axis (`parallel/pp_decode.py`) — params' blocks and
        the page pool shard their layer axis across stages; all allocator /
        prefix-sharing / preemption bookkeeping is layer-oblivious and works
        unchanged. ``pp_microbatches``: GPipe wavefront width for the decode
        step (must divide max_batch; M ≥ pp keeps stages busy).
        ``pp_split``: run the pp decode/prefill as two dispatches (read-only
        forward + write-only in-place commit) like the single-mesh path —
        bitwise-identical, avoids the donated-pool copies a fused read+write
        program pays. False = fused single-program step (lower dispatch count;
        the memory-pressure fallback, cf. the single-chip B=32 note in
        PERF.md)."""
        self.params = params
        self.config = config
        self.B = max_batch
        self.page = page_size
        self.n_pages = n_pages
        self.maxP = max_pages_per_slot or max(
            1, (2 * config.block_size) // page_size
        )
        self.quantized = quantize_kv
        self.eos_id = eos_id
        self.pool = init_page_pool(
            config, n_pages, page_size, jnp.bfloat16, quantize_kv
        )
        # LAG-1 commit pipeline (single-chip two-dispatch path only): the
        # decode step's writes are held and applied at the START of the next
        # decode program (`_paged_decode_step_pipelined`). In dispatch-
        # pattern microbenches the separate commit pays a full pool copy
        # (donated buffer with a prior consumer never aliases on this
        # platform) and the one-dispatch form wins 103 → 65 ms/step; through
        # the REAL engine loop (whose per-step host token download retires
        # the read before the commit executes) the two forms measure within
        # ±5% (tools/bench_engine_steady.py), so the simpler two-dispatch
        # path stays the default. Flushed on any structural event.
        self._pipelined = pipelined_commit and pp_mesh is None
        self._pending: Optional[tuple] = None
        self._pp_step = self._pp_prefill = self._pp_commit = None
        if pp_mesh is not None:
            from lit_llama_ja_tpu.parallel.pipeline import shard_params_pp
            from lit_llama_ja_tpu.parallel.pp_decode import (
                make_pp_commit,
                make_pp_decode_read,
                make_pp_decode_step,
                make_pp_prefill,
                make_pp_prefill_read,
                mesh_has_auto_axes,
                pp_auto_param_shardings,
                pp_auto_pool_shardings,
                shard_pool_pp,
            )

            assert max_batch % pp_microbatches == 0
            if pp_split:
                self._pp_step = make_pp_decode_read(
                    config, pp_mesh, params, self.pool,
                    n_micro=pp_microbatches, quantized=quantize_kv,
                )
                self._pp_prefill = make_pp_prefill_read(
                    config, pp_mesh, params, self.pool, quantized=quantize_kv
                )
                self._pp_commit = make_pp_commit(pp_mesh, self.pool)
            else:
                self._pp_step = make_pp_decode_step(
                    config, pp_mesh, params, self.pool,
                    n_micro=pp_microbatches, quantized=quantize_kv,
                )
                self._pp_prefill = make_pp_prefill(
                    config, pp_mesh, params, self.pool, quantized=quantize_kv
                )
            if mesh_has_auto_axes(pp_mesh):
                # pp × tp serving: the wavefronts are manual over 'pp' only;
                # tp/fsdp shard each stage's math under GSPMD from these
                # combined placements (parallel/pp_decode.py)
                self.params = jax.device_put(
                    params, pp_auto_param_shardings(params, pp_mesh)
                )
                self.pool = jax.device_put(
                    self.pool, pp_auto_pool_shardings(self.pool, pp_mesh)
                )
            else:
                self.params = shard_params_pp(params, pp_mesh)
                self.pool = shard_pool_pp(self.pool, pp_mesh)
        # host-side allocator state; page 0 is the reserved trash page
        self.free: List[int] = list(range(n_pages - 1, 0, -1))
        self.page_refs = np.zeros(n_pages, np.int32)
        self.tables = np.zeros((max_batch, self.maxP), np.int32)
        self.n_owned = np.zeros(max_batch, np.int32)  # table entries in use
        self.n_shared = np.zeros(max_batch, np.int32)  # leading shared (read-only)
        self.pos = np.zeros(max_batch, np.int32)
        self.cur = np.zeros(max_batch, np.int32)
        self.temps = np.zeros(max_batch, np.float32)
        self.top_k: Optional[int] = None
        self.top_p: Optional[float] = None
        self.slot_req: List[Optional[_PagedRequest]] = [None] * max_batch
        self.queue: List[_PagedRequest] = []
        self.prefill_chunk = prefill_chunk
        # decode-attention batch chunk: above ~8 slots XLA stops fusing the
        # page gather into the attention (PERF.md); 4-slot chunks keep it fused
        self.attn_chunk = None
        if max_batch > 8:
            for c in (4, 3, 2):
                if max_batch % c == 0:
                    self.attn_chunk = c
                    break
        # slot -> in-progress chunked prefill: the slot's real table row lives
        # here (self.tables row stays all-trash) so interleaved decode writes
        # for other slots can never land in a half-prefilled region
        self.prefilling: Dict[int, dict] = {}
        self._next_id = 0
        self._prefixes: Dict[int, Tuple[List[int], np.ndarray]] = {}
        self._next_prefix = 0
        self.key = jax.random.PRNGKey(seed)
        # observability counters (see stats())
        self._steps = 0
        self._tokens_out = 0
        self._prefill_tokens = 0
        self._preempts = 0
        self._completed = 0

    # -- allocator ---------------------------------------------------------
    def _alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) < n:
            return None
        pages = [self.free.pop() for _ in range(n)]
        self.page_refs[pages] = 1
        return pages

    def _release(self, pages) -> None:
        for p in pages:
            if p == 0:
                continue
            self.page_refs[p] -= 1
            if self.page_refs[p] == 0:
                self.free.append(int(p))

    def free_token_budget(self) -> int:
        return len(self.free) * self.page

    # -- prefix sharing ----------------------------------------------------
    def register_prefix(self, prefix_tokens) -> Optional[int]:
        """Prefill a shared prompt prefix ONCE; returns a prefix_id usable in
        `add_request`. Only full pages are shared (the tail re-prefills per
        request). Returns None if the pool lacks pages for it right now."""
        toks = np.asarray(prefix_tokens, np.int32)
        n_full = len(toks) // self.page
        if n_full == 0:
            pid = self._next_prefix
            self._next_prefix += 1
            self._prefixes[pid] = ([], toks)
            return pid
        pages = self._alloc(n_full)
        if pages is None:
            return None
        shared_len = n_full * self.page
        self._prefill_span(
            toks[:shared_len], start_pos=0, table_pages=pages, want_logits=False
        )
        pid = self._next_prefix
        self._next_prefix += 1
        self._prefixes[pid] = (pages, toks[shared_len:])
        return pid

    def release_prefix(self, prefix_id: int) -> None:
        pages, _ = self._prefixes.pop(prefix_id)
        self._release(pages)

    # -- requests ----------------------------------------------------------
    def add_request(
        self,
        prompt,
        max_new_tokens: int,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        prefix_id: Optional[int] = None,
    ) -> int:
        """Queue a request. With ``prefix_id``, ``prompt`` is the continuation
        AFTER the registered prefix (the engine prepends the prefix tail)."""
        if top_p is not None:
            self.top_p = top_p if self.top_p is None else self.top_p
        req = _PagedRequest(
            self._next_id, np.asarray(prompt, np.int32), max_new_tokens,
            temperature, top_k, prefix_id,
        )
        self._next_id += 1
        self.queue.append(req)
        return req.req_id

    def _prefill_span(self, toks, start_pos, table_pages, want_logits=True):
        """Run prefill for ``toks`` at absolute positions ``start_pos..``, writing
        into ``table_pages`` (plus trailing trash entries for padding)."""
        self._flush_pending()
        T = len(toks)
        P = bucket_length(T)
        # attend width: all pages up to the end of the padded span, power-of-2
        ap = bucket_length(
            (start_pos + P + self.page - 1) // self.page, minimum=1
        )
        table = np.zeros(ap, np.int32)
        usable = min(len(table_pages), ap)
        table[:usable] = table_pages[:usable]
        padded = np.zeros(P, np.int32)
        padded[:T] = toks
        pos = start_pos + np.arange(P, dtype=np.int32)
        # positions of padding tokens beyond the allocated pages go to trash:
        # their table entries are 0 already (trash), and attention masks them.
        self._prefill_tokens += T
        if self._pp_prefill is not None:
            if self._pp_commit is not None:  # two-dispatch pp prefill
                logits, writes, pi, of = self._pp_prefill(
                    self.params,
                    jnp.asarray(padded[None]),
                    jnp.asarray(pos[None]),
                    jnp.asarray(table[None]),
                    self.pool,
                )
                self.pool = self._pp_commit(self.pool, writes, pi, of)
            else:
                logits, self.pool = self._pp_prefill(
                    self.params,
                    jnp.asarray(padded[None]),
                    jnp.asarray(pos[None]),
                    jnp.asarray(table[None]),
                    self.pool,
                )
        else:
            logits, writes, pi, of = paged_forward_read(
                self.params,
                jnp.asarray(padded[None]),
                jnp.asarray(pos[None]),
                jnp.asarray(table[None]),
                self.pool,
                self.config,
                self.quantized,
                # span starts on empty fresh pages → causal in-flight
                # attention, no pool gather (chunked/extending prefills with
                # start_pos > 0 keep the gather path)
                prefill_attn=(start_pos == 0),
            )
            self.pool = commit_writes_jit(self.pool, writes, pi, of)
        if want_logits:
            return np.asarray(logits[0, T - 1])
        return None

    def _admit(self):
        for slot in range(self.B):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue[0]
            resuming = bool(req.tokens)  # preempted request being re-admitted
            shared_pages: List[int] = []
            tail = req.prompt
            if req.prefix_id is not None:
                spages, sprefix_tail = self._prefixes[req.prefix_id]
                shared_pages = list(spages)
                tail = np.concatenate([sprefix_tail, req.prompt])
            if resuming:
                # re-prefill everything written before preemption; the last
                # sampled token becomes `cur` (it was never written to cache)
                tail = np.concatenate(
                    [tail, np.asarray(req.tokens[:-1], np.int32)]
                )
            shared_len = len(shared_pages) * self.page
            total_len = shared_len + len(tail)
            if total_len >= self.maxP * self.page:
                self.queue.pop(0)
                req.done = True
                raise ValueError(
                    f"prompt length {total_len} exceeds the table capacity "
                    f"{self.maxP * self.page - 1}"
                )
            n_tail_pages = max(
                0, (total_len + self.page) // self.page - len(shared_pages)
            )  # pages covering tail tokens + at least 1 decode slot
            own = self._alloc(n_tail_pages)
            if own is None:
                if not any(r is not None for r in self.slot_req):
                    raise RuntimeError(
                        f"page pool too small: request needs {n_tail_pages} pages "
                        f"({total_len} tokens) with the whole pool free "
                        f"({len(self.free)} of {self.n_pages - 1} pages)"
                    )
                return  # pool exhausted — head-of-line request waits (backpressure)
            self.queue.pop(0)
            row = np.zeros(self.maxP, np.int32)
            row[: len(shared_pages)] = shared_pages
            row[len(shared_pages) : len(shared_pages) + len(own)] = own
            for p in shared_pages:
                self.page_refs[p] += 1
            n_owned = len(shared_pages) + len(own)
            req.slot = slot
            self.slot_req[slot] = req
            self.n_shared[slot] = len(shared_pages)
            self.n_owned[slot] = n_owned
            C = self.prefill_chunk
            if C is not None and len(tail) > C:
                # chunked: the table row installs only at activation; until then
                # the slot decodes against trash (pos/cur pinned to 0)
                self.tables[slot] = 0
                self.pos[slot] = 0
                self.cur[slot] = 0
                self.prefilling[slot] = {
                    "req": req, "tail": tail, "off": 0, "row": row,
                    "shared_len": shared_len, "total_len": total_len,
                    "resuming": resuming, "n_owned": n_owned,
                }
                continue
            self.tables[slot] = row
            logits = self._prefill_span(
                tail,
                start_pos=shared_len,
                table_pages=list(row[:n_owned]),
                want_logits=not resuming,
            )
            self._activate(slot, req, logits, resuming, total_len)

    def _activate(self, slot, req, logits, resuming, total_len):
        """Final bookkeeping once a slot's whole prompt is in the cache."""
        self.pos[slot] = total_len
        self.temps[slot] = req.temperature
        if resuming:
            self.cur[slot] = req.tokens[-1]
        else:
            self.key, sub = jax.random.split(self.key)
            tok = int(
                sample_token(sub, jnp.asarray(logits), req.temperature, req.top_k)
            )
            req.tokens.append(tok)
            self.cur[slot] = tok
        if req.top_k is not None:
            self.top_k = req.top_k if self.top_k is None else self.top_k
        self._maybe_finish(req)

    def _advance_prefills(self):
        """Run ONE chunk of prefill per in-progress slot; activate on the last."""
        for slot, st in list(self.prefilling.items()):
            C = self.prefill_chunk
            tail, off = st["tail"], st["off"]
            chunk = tail[off : off + C]
            last = off + len(chunk) >= len(tail)
            logits = self._prefill_span(
                chunk,
                start_pos=st["shared_len"] + off,
                table_pages=list(st["row"][: st["n_owned"]]),
                want_logits=last and not st["resuming"],
            )
            st["off"] = off + len(chunk)
            if last:
                del self.prefilling[slot]
                self.tables[slot] = st["row"]
                self._activate(
                    slot, st["req"], logits, st["resuming"], st["total_len"]
                )

    def _flush_pending(self) -> None:
        """Apply the lag-1 pending decode writes through the standalone
        commit. Must run before anything structural touches the pool or page
        ownership: prefill spans (they read/write the pool), retirement (the
        pending write targets pages about to be freed/reused), preemption."""
        if self._pending is not None:
            w, pi, of = self._pending
            self._pending = None
            self.pool = commit_writes_jit(self.pool, w, pi, of)

    def _retire(self, req: _PagedRequest):
        self._flush_pending()
        slot = req.slot
        # shared pages were ref-bumped at admit; owned pages drop to free
        self._release(self.tables[slot, : self.n_owned[slot]])
        self.tables[slot] = 0
        self.n_owned[slot] = 0
        self.n_shared[slot] = 0
        self.slot_req[slot] = None
        req.slot = None

    def _maybe_finish(self, req: _PagedRequest):
        hit_eos = (
            self.eos_id is not None and req.tokens and req.tokens[-1] == self.eos_id
        )
        out_of_room = (
            req.slot is not None and self.pos[req.slot] >= self.maxP * self.page - 1
        )
        if len(req.tokens) >= req.max_new_tokens or hit_eos or out_of_room:
            req.done = True
            if req.slot is not None:
                self._retire(req)

    def _ensure_capacity(self) -> bool:
        """Make sure every active slot has a page for its next write position.
        Returns False if the pool is exhausted (caller should retire/wait)."""
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            needed = int(self.pos[slot]) // self.page
            if needed >= self.n_owned[slot]:
                got = self._alloc(1)
                if got is None:
                    return False
                self.tables[slot, needed] = got[0]
                self.n_owned[slot] = needed + 1
        return True

    # -- stepping ----------------------------------------------------------
    def _decoding(self) -> List[_PagedRequest]:
        return [
            r for slot, r in enumerate(self.slot_req)
            if r is not None and slot not in self.prefilling
        ]

    def step(self) -> List[Tuple[int, int, bool]]:
        """Admit waiting requests, advance in-progress chunked prefills by one
        chunk each, then run one batched paged decode step."""
        self._admit()
        self._advance_prefills()
        while not self._ensure_capacity():
            # Out of pages mid-decode: preempt the longest request (free its
            # pages, requeue at the head — FIFO admission makes it wait for
            # capacity instead of stealing it back immediately). A request
            # preempted repeatedly (pathologically sized pool) is truncated.
            active = self._decoding()
            if not active:
                return []
            victim = max(active, key=lambda r: self.pos[r.slot])
            self._retire(victim)
            victim.preempts += 1
            self._preempts += 1
            if victim.preempts > 3 or not victim.tokens:
                victim.done = True
            else:
                self.queue.insert(0, victim)
        active = self._decoding()
        if not active:
            return []
        # attend width bucket: pages needed by the longest active slot
        max_pages = max(
            int(self.pos[r.slot]) // self.page + 1 for r in active
        )
        ap = min(bucket_length(max_pages, minimum=1), self.maxP)
        self.key, sub = jax.random.split(self.key)
        if self._pp_step is not None:
            if self._pp_commit is not None:  # two-dispatch pp decode
                nxt, writes, pi, of = self._pp_step(
                    self.params,
                    jnp.asarray(self.cur),
                    jnp.asarray(self.pos),
                    jnp.asarray(self.tables[:, :ap]),
                    self.pool,
                    sub,
                    jnp.asarray(self.temps),
                    self.top_k,
                    self.top_p,
                )
                self.pool = self._pp_commit(self.pool, writes, pi, of)
            else:
                nxt, self.pool = self._pp_step(
                    self.params,
                    jnp.asarray(self.cur),
                    jnp.asarray(self.pos),
                    jnp.asarray(self.tables[:, :ap]),
                    self.pool,
                    sub,
                    jnp.asarray(self.temps),
                    self.top_k,
                    self.top_p,
                )
        elif self._pipelined and self._pending is not None:
            # lag-1 pipelined decode: ONE dispatch applies the previous
            # step's writes in place on the donated pool, then reads — see
            # `_paged_decode_step_pipelined` for why the separate commit
            # dispatch costs a full pool copy on this platform
            pw, ppi, pof = self._pending
            nxt, writes, pi, of, self.pool = _paged_decode_step_pipelined(
                self.params,
                jnp.asarray(self.cur),
                jnp.asarray(self.pos),
                jnp.asarray(self.tables[:, :ap]),
                self.pool,
                pw, ppi, pof,
                sub,
                jnp.asarray(self.temps),
                self.config,
                self.quantized,
                self.top_k,
                self.top_p,
                self.attn_chunk,
            )
            self._pending = (writes, pi, of)
        else:
            # two-dispatch decode: read-only forward+sample, then the
            # write-only in-place commit (see `commit_writes_jit`) — a fused
            # write-then-attend program pays full pool copies (+32% step
            # time at B=16)
            nxt, writes, pi, of = _paged_decode_read_and_sample(
                self.params,
                jnp.asarray(self.cur),
                jnp.asarray(self.pos),
                jnp.asarray(self.tables[:, :ap]),
                self.pool,
                sub,
                jnp.asarray(self.temps),
                self.config,
                self.quantized,
                self.top_k,
                self.top_p,
                self.attn_chunk,
            )
            if self._pipelined:
                # hold the writes for the next decode program (lag-1)
                self._pending = (writes, pi, of)
            else:
                self.pool = commit_writes_jit(self.pool, writes, pi, of)
        nxt = np.asarray(nxt)  # B int32s — the only host transfer per step
        emitted = []
        for slot, req in enumerate(self.slot_req):
            if req is None or slot in self.prefilling:
                continue
            tok = int(nxt[slot])
            req.tokens.append(tok)
            self.pos[slot] += 1
            self.cur[slot] = tok
            self._maybe_finish(req)
            if req.done:
                self._completed += 1
            emitted.append((req.req_id, tok, req.done))
        self._steps += 1
        self._tokens_out += len(emitted)
        return emitted

    def stats(self) -> Dict[str, float]:
        """Engine counters + live pool state (host-side, no device sync)."""
        used = int(self.n_pages - 1 - len(self.free))
        return {
            "steps": self._steps,
            "tokens_out": self._tokens_out,
            "prefill_tokens": self._prefill_tokens,
            "completed_requests": self._completed,
            "preempts": self._preempts,
            "queued": len(self.queue),
            "active_slots": len(self._decoding()),
            "prefilling_slots": len(self.prefilling),
            "pages_used": used,
            "pages_total": self.n_pages - 1,
            "page_utilization": used / max(self.n_pages - 1, 1),
            "kv_token_budget_free": self.free_token_budget(),
        }

    def run(
        self,
        requests: List[Tuple[np.ndarray, int]],
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        prefix_id: Optional[int] = None,
    ) -> Dict[int, np.ndarray]:
        """Submit (prompt, max_new_tokens) pairs and run to completion; returns
        {req_id: prompt+generated} (prompt excludes any shared prefix)."""
        reqs_by_id: Dict[int, _PagedRequest] = {}
        for prompt, mnt in requests:
            rid = self.add_request(
                prompt, mnt, temperature=temperature, top_k=top_k, top_p=top_p,
                prefix_id=prefix_id,
            )
            reqs_by_id[rid] = self.queue[-1]
        finished: Dict[int, np.ndarray] = {}
        while len(finished) < len(reqs_by_id):
            self.step()
            for rid, req in reqs_by_id.items():
                if req.done and rid not in finished:
                    finished[rid] = np.concatenate(
                        [req.prompt, np.asarray(req.tokens, np.int32)]
                    )
        return finished
