"""Continuous-batching serving engine (BASELINE north star: "continuous batching
across hosts with tensor-sharded int4 weights and int8 KV-cache").

The reference has no serving layer at all (single-prompt `generate.py`); this is a
new capability. Design:

  * One shared stacked KV cache in serving layout ``(L, max_batch, S, nh, hd)``
    (optionally INT8) — batch and slot axes leading and adjacent, so per-slot
    writes are clean row scatters (``cache.at[arange(B), pos]``), no relayout.
  * Each slot tracks its own position; attention masks per-slot — no `lax.cond`
    roll-eviction in the hot loop (slots are pre-sized; sequences at the cap
    finish).
  * Per-slot sampling (temperature array, engine-wide top_k) is FUSED into the
    decode program: host-side ops between chained jitted steps cost ~50 ms on
    the remote platform (PERF.md), so only B int32 tokens cross per step.
  * New requests are admitted into free slots and prefilled individually
    (bucketed-length jit, same trick as `infer/generate`); decode then proceeds
    for all active slots in ONE batched step per token.
  * The whole engine state lives in device arrays; the host loop only moves
    sampled tokens (B int32s per step).

Multi-chip: params can be tensor-sharded (`parallel/specs.py`) and the cache
sharded over ('dp','tp'); the same step runs under a mesh unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import (
    _qkv,
    apply_linear,
    init_kv_cache,
    mlp_block,
)
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import build_rope_cache
from lit_llama_ja_tpu.ops.sampling import sample_token


def _slot_attention(q, cache_l, pos, quantized):
    """q: (B, nh, 1, hd); cache_l leaves (B, S, nh, hd) — the serving layout keeps
    the (batch, slot) axes leading and adjacent so per-slot writes are clean
    scatters (no cache relayout); pos: (B,) current slot."""
    S = cache_l["k"].shape[1]
    slot = jnp.arange(S, dtype=pos.dtype)
    mask = (slot[None, :] <= pos[:, None])[:, None, None, :]  # (B, 1, 1, S)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if quantized:
        att = jnp.einsum("bhqd,bshd->bhqs", q, cache_l["k"].astype(q.dtype))
        att = att * cache_l["k_scale"][..., 0].transpose(0, 2, 1)[:, :, None, :].astype(jnp.float32)
        att = jnp.where(mask, att * scale, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        att = att * cache_l["v_scale"][..., 0].transpose(0, 2, 1)[:, :, None, :]
        return jnp.einsum(
            "bhqs,bshd->bhqd", att.astype(q.dtype), cache_l["v"].astype(q.dtype)
        )
    att = jnp.einsum("bhqd,bshd->bhqs", q, cache_l["k"].astype(q.dtype)) * scale
    att = jnp.where(mask, att.astype(jnp.float32), -jnp.inf)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqs,bshd->bhqd", att, cache_l["v"].astype(q.dtype))


@partial(jax.jit, static_argnames=("config", "quantized"), donate_argnums=(3,))
def _batched_decode_step(
    params,
    toks: jax.Array,  # (B,) int32 current tokens (garbage for inactive slots)
    pos: jax.Array,  # (B,) int32 per-slot positions
    cache: Dict[str, jax.Array],  # leaves (L, B, S, nh, hd) — serving layout
    config: LLaMAConfig,
    quantized: bool,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decode step for all slots; returns (logits (B, V), new cache)."""
    B = toks.shape[0]
    rope_full = build_rope_cache(config.block_size, config.head_dim, config.rope_base)
    rope_b = rope_full[jnp.clip(pos, 0, config.block_size - 1)]  # (B, hd/2, 2)
    x = params["wte"]["weight"][toks][:, None, :]  # (B, 1, D)
    barange = jnp.arange(B)

    def body(x, layer_in):
        block_params, cache_l = layer_in
        h = rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps)
        # per-batch rope: apply with per-batch tables via vmap'd rotation
        Bq, T, C = h.shape
        nh, hd = config.n_head, config.head_dim
        qkv = apply_linear(block_params["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def rot(t):  # (B, 1, nh, hd) with per-batch rope rope_b
            t32 = t.reshape(B, nh, hd // 2, 2).astype(jnp.float32)
            rc = rope_b.astype(jnp.float32)[:, None]  # (B, 1, hd/2, 2)
            cos, sin = rc[..., 0], rc[..., 1]
            x0, x1 = t32[..., 0], t32[..., 1]
            out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
            return out.reshape(B, nh, 1, hd).astype(t.dtype)

        q = rot(q.reshape(B, nh, hd))
        k = rot(k.reshape(B, nh, hd))
        v = v.reshape(B, nh, 1, hd)

        if quantized:
            from lit_llama_ja_tpu.ops.attention import quantize_kv

            kq, ks, vq, vs = quantize_kv(k, v)
            writes = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
        else:
            writes = {"k": k.astype(cache_l["k"].dtype),
                      "v": v.astype(cache_l["v"].dtype)}
        # adjacent-leading-index scatter: slot b writes row (b, pos[b]) — no axis
        # movement, so XLA updates rows in place instead of relaying the cache
        cache_l = {
            key: cache_l[key].at[barange, pos].set(val[:, :, 0])
            for key, val in writes.items()
        }
        y = _slot_attention(q, cache_l, pos, quantized)
        y = y.transpose(0, 2, 1, 3).reshape(B, 1, C)
        x = x + apply_linear(block_params["attn"]["c_proj"], y)
        x = x + mlp_block(
            block_params["mlp"],
            rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps),
        )
        return x, cache_l

    x, new_cache = jax.lax.scan(body, x, (params["blocks"], cache))
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    logits = apply_linear(params["lm_head"], x)[:, 0]
    return logits, new_cache


@partial(
    jax.jit,
    static_argnames=("config", "quantized", "top_k", "top_p"),
    donate_argnums=(3,),
)
def _decode_and_sample(
    params,
    toks: jax.Array,  # (B,)
    pos: jax.Array,  # (B,)
    cache: Dict[str, jax.Array],
    key: jax.Array,
    temps: jax.Array,  # (B,) float32; 0.0 -> greedy
    config: LLaMAConfig,
    quantized: bool,
    top_k: Optional[int],
    top_p: Optional[float] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Decode step + per-slot sampling fused into ONE device program.

    Host-side ops between chained jit calls cost ~50 ms/step on the remote
    platform (measured, PERF.md); keeping sampling in-jit means the host loop
    only moves B int32 tokens per step.
    """
    logits, cache = _batched_decode_step(params, toks, pos, cache, config, quantized)
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
    nxt = jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)
    return nxt, cache


@partial(jax.jit, static_argnames=("config", "quantized"), donate_argnums=(3,))
def _prefill_slot(
    params,
    padded_prompt: jax.Array,  # (P,)
    prompt_len: jax.Array,  # ()
    cache: Dict[str, jax.Array],
    slot: jax.Array,  # () int32
    config: LLaMAConfig,
    quantized: bool,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Prefill one slot's cache region; returns (last-token logits (V,), cache)."""
    from lit_llama_ja_tpu.models.llama import forward_with_cache

    # run the single-sequence path on a view of this slot; the model path uses
    # (L, 1, nh, S, hd) so transpose the slot view in and out of serving layout
    cache_slot = {
        k: jax.lax.dynamic_slice_in_dim(v, slot, 1, axis=1).transpose(0, 1, 3, 2, 4)
        for k, v in cache.items()
    }
    input_pos = jnp.arange(padded_prompt.shape[0], dtype=jnp.int32)
    logits, cache_slot = forward_with_cache(
        params, padded_prompt[None], input_pos, cache_slot, config,
        prefill_attn=True,  # slot region starts empty
    )
    cache = {
        k: jax.lax.dynamic_update_slice_in_dim(
            cache[k], cache_slot[k].transpose(0, 1, 3, 2, 4), slot, axis=1
        )
        for k in cache
    }
    last = jax.lax.dynamic_index_in_dim(logits[0], prompt_len - 1, axis=0,
                                        keepdims=False)
    return last, cache


@dataclasses.dataclass
class _Request:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float
    top_k: Optional[int]
    tokens: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False


class Engine:
    """Continuous-batching inference engine over a fixed slot pool."""

    def __init__(
        self,
        params,
        config: LLaMAConfig,
        *,
        max_batch: int = 8,
        max_seq_length: Optional[int] = None,
        quantize_kv: bool = False,
        eos_id: Optional[int] = None,
        seed: int = 0,
    ):
        self.params = params
        self.config = config
        self.B = max_batch
        self.S = max_seq_length or config.block_size
        self.quantized = quantize_kv
        self.eos_id = eos_id
        base = init_kv_cache(
            config, max_batch, self.S,
            dtype=jnp.bfloat16, quantized=quantize_kv,
        )
        # serving layout: (L, B, S, nh, hd) — see _slot_attention
        self.cache = {k: v.transpose(0, 1, 3, 2, 4) for k, v in base.items()}
        self.pos = np.zeros(max_batch, np.int32)  # next write position per slot
        self.cur = np.zeros(max_batch, np.int32)  # current token per slot
        self.temps = np.zeros(max_batch, np.float32)  # per-slot temperature
        self.top_k: Optional[int] = None  # engine-wide static top_k
        self.top_p: Optional[float] = None  # engine-wide static top_p
        self.slot_req: List[Optional[_Request]] = [None] * max_batch
        self.queue: List[_Request] = []
        self._next_id = 0
        self.key = jax.random.PRNGKey(seed)
        self._steps = 0
        self._tokens_out = 0
        self._completed = 0

    # -- request management ------------------------------------------------
    def add_request(
        self,
        prompt,
        max_new_tokens: int,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> int:
        if top_p is not None:
            # jit-static: the engine adopts the first request's top_p
            self.top_p = top_p if self.top_p is None else self.top_p
        req = _Request(
            self._next_id, np.asarray(prompt, np.int32), max_new_tokens,
            temperature, top_k,
        )
        self._next_id += 1
        self.queue.append(req)
        return req.req_id

    def _admit(self):
        from lit_llama_ja_tpu.infer.generate import bucket_length

        for slot in range(self.B):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            T = len(req.prompt)
            if T >= self.S:
                raise ValueError(
                    f"prompt length {T} does not fit the {self.S}-slot cache "
                    "(reference semantics: prompts are capped at block_size)"
                )
            P = min(bucket_length(T), self.S)
            padded = jnp.zeros((P,), jnp.int32).at[:T].set(jnp.asarray(req.prompt))
            logits, self.cache = _prefill_slot(
                self.params, padded, jnp.int32(T), self.cache,
                jnp.int32(slot), self.config, self.quantized,
            )
            self.key, sub = jax.random.split(self.key)
            tok = int(sample_token(sub, logits, req.temperature, req.top_k))
            req.tokens.append(tok)
            req.slot = slot
            self.slot_req[slot] = req
            self.pos[slot] = T
            self.cur[slot] = tok
            self.temps[slot] = req.temperature
            if req.top_k is not None:
                # top_k is jit-static: the engine adopts the first request's value
                self.top_k = req.top_k if self.top_k is None else self.top_k
            self._maybe_finish(req)

    def _maybe_finish(self, req: _Request):
        hit_eos = self.eos_id is not None and req.tokens and req.tokens[-1] == self.eos_id
        out_of_room = req.slot is not None and self.pos[req.slot] >= self.S - 1
        if len(req.tokens) >= req.max_new_tokens or hit_eos or out_of_room:
            req.done = True
            if req.slot is not None:
                self.slot_req[req.slot] = None
                req.slot = None

    # -- stepping ----------------------------------------------------------
    def step(self) -> List[Tuple[int, int, bool]]:
        """Admit pending requests, run one batched decode step; returns
        [(req_id, new_token, done)] for slots that produced a token."""
        self._admit()
        active = [r for r in self.slot_req if r is not None]
        if not active:
            return []
        self.key, sub = jax.random.split(self.key)
        nxt, self.cache = _decode_and_sample(
            self.params,
            jnp.asarray(self.cur),
            jnp.asarray(self.pos),
            self.cache,
            sub,
            jnp.asarray(self.temps),
            self.config,
            self.quantized,
            self.top_k,
            self.top_p,
        )
        nxt = np.asarray(nxt)  # B int32s — the only host transfer per step
        emitted = []
        for slot, req in enumerate(self.slot_req):
            if req is None:
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
        """Engine counters + live slot state (host-side, no device sync)."""
        active = sum(1 for r in self.slot_req if r is not None)
        return {
            "steps": self._steps,
            "tokens_out": self._tokens_out,
            "completed_requests": self._completed,
            "queued": len(self.queue),
            "active_slots": active,
            "slot_utilization": active / self.B,
        }

    def run(
        self,
        requests: List[Tuple[np.ndarray, int]],
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> Dict[int, np.ndarray]:
        """Convenience: submit (prompt, max_new_tokens) pairs, run to completion.

        Returns {req_id: prompt+generated}. Requests are remembered at submission
        (NOT after the first step — a request can retire during admission)."""
        reqs_by_id: Dict[int, _Request] = {}
        for prompt, mnt in requests:
            rid = self.add_request(
                prompt, mnt, temperature=temperature, top_k=top_k, top_p=top_p
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
