"""Speculative decoding: draft-model lookahead with exact target-distribution
verification (Leviathan et al. rejection scheme).

Single-stream decode is HBM-bound on weight streaming (PERF.md): every token
pays a full pass over the target's weights. Speculative decoding breaks that
per-token bound: a small draft model proposes K tokens autoregressively, the
target verifies all K+1 positions in ONE forward (one weight pass amortized
over up to K+1 emitted tokens). The modified rejection sampler keeps the output
distribution EXACTLY the target's — with temperature=0 the emitted sequence is
bitwise the target's greedy sequence no matter how bad the draft is (property
under test in `tests/test_speculative.py`).

The ja-fork model family is the natural pairing: 19M/49M drafts for the 7B
target, all loadable by this framework. The reference has nothing comparable
(its `generate.py` is strictly one-token-per-forward).

Cache bookkeeping (no fixup passes):
  * Target writes k/v for (last_tok, drafts[0..K-1]) at pos..pos+K in its
    verify forward; rejected suffix entries are stale but sit at positions
    beyond the accepted point, masked until overwritten (the same
    write-then-mask convention the prefill padding uses).
  * The draft consumes (prev_tok, last_tok) as a 2-token step before drafting:
    when a round accepts all K drafts, the draft never consumed its own last
    proposal — the pair-feed fills that one-position cache hole on the next
    round (re-writing an already-cached position is an identical overwrite).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import bucket_length
from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache


def _dist(
    logits: jax.Array,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float] = None,
) -> jax.Array:
    """The sampling distribution as an explicit probability vector (V,).

    Mirrors `ops/sampling.sample_token` exactly (same filter order:
    temperature, top-k, top-p); temperature == 0 is a point mass on the argmax.
    """
    from lit_llama_ja_tpu.ops.sampling import top_p_filter

    logits = logits.astype(jnp.float32)
    if temperature == 0.0:
        return jax.nn.one_hot(jnp.argmax(logits), logits.shape[-1], dtype=jnp.float32)
    logits = logits / temperature
    if top_k is not None:
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    return jax.nn.softmax(logits)


def _spec_round_body(
    tparams,
    dparams,
    prev_tok: jax.Array,  # () int32 — token at pos-1 (already cached; see module doc)
    last_tok: jax.Array,  # () int32 — token at pos, not yet in any cache
    tcache,
    dcache,
    pos: jax.Array,  # () int32 — position of last_tok
    key: jax.Array,
    tcfg: LLaMAConfig,
    dcfg: LLaMAConfig,
    K: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, dict, dict]:
    """One draft-verify round. Returns (tokens (K+1,), n_out, tcache, dcache):
    ``tokens[:n_out]`` are the newly emitted tokens (up to K accepted drafts
    plus one target-sampled token)."""
    kd, kacc, kfin = jax.random.split(key, 3)

    # --- draft: pair-feed (prev, last), then K-1 single steps ---------------
    pair = jnp.stack([prev_tok, last_tok])[None]  # (1, 2)
    logits, dcache = forward_with_cache(
        dparams, pair, jnp.stack([pos - 1, pos]), dcache, dcfg
    )
    d_keys = jax.random.split(kd, K)
    p0 = _dist(logits[0, -1], temperature, top_k, top_p)
    tok0 = jax.random.categorical(d_keys[0], jnp.log(p0 + 1e-30))

    def dstep(carry, xs):
        dcache, tok, p = carry
        k_i = xs
        logits, dcache = forward_with_cache(
            dparams, tok[None, None].astype(jnp.int32), p[None], dcache, dcfg
        )
        probs = _dist(logits[0, -1], temperature, top_k, top_p)
        nxt = jax.random.categorical(k_i, jnp.log(probs + 1e-30))
        return (dcache, nxt.astype(jnp.int32), p + 1), (tok.astype(jnp.int32), probs)

    # Scan step j consumes drafts[j] and produces (drafts[j], p_d[j+1]); the
    # carry exits holding drafts[K-1]. Assembly is uniform in K (zero-length
    # scan for K=1): drafts = emitted ++ [carry], p_d = [p0] ++ emitted_probs.
    (dcache, last_draft, _), (consumed, probs_out) = jax.lax.scan(
        dstep, (dcache, tok0.astype(jnp.int32), pos + 1), d_keys[1:]
    )
    draft_toks = jnp.concatenate([consumed, last_draft[None]])  # (K,)
    p_d = jnp.concatenate([p0[None], probs_out])  # (K, V); drafts[i] ~ p_d[i]

    # --- target: verify all K+1 positions in one forward --------------------
    tin = jnp.concatenate([last_tok[None].astype(jnp.int32), draft_toks])[None]
    tpos = pos + jnp.arange(K + 1, dtype=jnp.int32)
    tlogits, tcache = forward_with_cache(tparams, tin, tpos, tcache, tcfg)
    p_t = jax.vmap(lambda lg: _dist(lg, temperature, top_k, top_p))(
        tlogits[0]
    )  # (K+1, V)

    # --- acceptance (vectorized rejection chain) ----------------------------
    u = jax.random.uniform(kacc, (K,))
    pt_x = jnp.take_along_axis(p_t[:K], draft_toks[:, None], axis=1)[:, 0]
    pd_x = jnp.take_along_axis(p_d, draft_toks[:, None], axis=1)[:, 0]
    accept = u < jnp.minimum(1.0, pt_x / jnp.maximum(pd_x, 1e-30))
    keep = jnp.cumprod(accept.astype(jnp.int32))
    n_acc = keep.sum()  # length of accepted draft prefix

    # final token: bonus sample from p_t[K] if all accepted, else residual
    # distribution max(p_t - p_d, 0) at the rejection point
    p_t_at = p_t[n_acc]
    p_d_at = jnp.where(n_acc == K, jnp.zeros_like(p_t_at), p_d[jnp.minimum(n_acc, K - 1)])
    resid = jnp.maximum(p_t_at - p_d_at, 0.0)
    resid_sum = resid.sum()
    final_dist = jnp.where(resid_sum > 1e-30, resid / jnp.maximum(resid_sum, 1e-30), p_t_at)
    final = jax.random.categorical(kfin, jnp.log(final_dist + 1e-30)).astype(jnp.int32)

    tokens = jnp.concatenate([draft_toks, jnp.zeros((1,), jnp.int32)])
    tokens = tokens.at[n_acc].set(final)
    return tokens, n_acc + 1, tcache, dcache


_spec_round = partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "K", "temperature", "top_k", "top_p"),
    donate_argnums=(4, 5),
)(_spec_round_body)


@partial(
    jax.jit,
    static_argnames=(
        "tcfg", "dcfg", "K", "max_new_tokens", "S", "temperature", "top_k",
        "top_p", "eos_id",
    ),
)
def _spec_generate_jit(
    tparams,
    dparams,
    padded_prompt: jax.Array,  # (P,) int32
    prompt_len: jax.Array,  # () int32
    tcache,
    dcache,
    key: jax.Array,
    *,
    tcfg: LLaMAConfig,
    dcfg: LLaMAConfig,
    K: int,
    max_new_tokens: int,
    S: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    eos_id: Optional[int],
):
    """The WHOLE speculative decode as one compiled program.

    The host-loop formulation pays one device→host round trip per
    draft-verify round; on the remote-dispatch platform that round trip
    costs ~50-80 ms — more than the round's device work for small targets
    (round-4 measurement: a 49M target decoded 890 tok/s plain but 36 tok/s
    speculative through the host loop). A `lax.while_loop` over the round
    body keeps everything on-device; only the finished token buffer crosses
    the host boundary, matching the plain `_generate_jit` design.

    Returns (out_buf (max_new_tokens + K + 1,), count, rounds): out_buf[:count]
    are emitted tokens (count may exceed max_new_tokens by up to K; host
    truncates), rounds = number of draft-verify rounds executed.
    """
    P = padded_prompt.shape[0]
    input_pos = jnp.arange(P, dtype=jnp.int32)
    tlogits, tcache = forward_with_cache(
        tparams, padded_prompt[None], input_pos, tcache, tcfg, prefill_attn=True
    )
    _, dcache = forward_with_cache(
        dparams, padded_prompt[None], input_pos, dcache, dcfg, prefill_attn=True
    )
    key, sub = jax.random.split(key)
    last_logits = jax.lax.dynamic_index_in_dim(
        tlogits[0], prompt_len - 1, axis=0, keepdims=False
    )
    first_dist = _dist(last_logits, temperature, top_k, top_p)
    first_tok = jax.random.categorical(sub, jnp.log(first_dist + 1e-30)).astype(
        jnp.int32
    )

    cap = max_new_tokens + K + 1
    out0 = jnp.zeros((cap,), jnp.int32).at[0].set(first_tok)
    prev0 = padded_prompt[jnp.maximum(prompt_len - 1, 0)]
    done0 = (
        jnp.bool_(False) if eos_id is None else (first_tok == eos_id)
    )
    carry0 = (
        out0, jnp.int32(1), jnp.int32(0), prompt_len.astype(jnp.int32),
        prev0.astype(jnp.int32), first_tok, tcache, dcache, key, done0,
    )

    def cond(c):
        out, count, rounds, pos, prev, last, tc, dc, k, done = c
        return (count < max_new_tokens) & (pos + K + 1 < S) & (~done)

    def body(c):
        out, count, rounds, pos, prev, last, tc, dc, k, done = c
        k, sub = jax.random.split(k)
        tokens, n_out, tc, dc = _spec_round_body(
            tparams, dparams, prev, last, tc, dc, pos, sub,
            tcfg, dcfg, K, temperature, top_k, top_p,
        )
        out = jax.lax.dynamic_update_slice(out, tokens, (count,))
        emitted_mask = jnp.arange(K + 1) < n_out
        if eos_id is not None:
            done = done | jnp.any(emitted_mask & (tokens == eos_id))
        prev = jnp.where(n_out >= 2, tokens[jnp.maximum(n_out - 2, 0)], last)
        last = tokens[n_out - 1]
        return (
            out, count + n_out, rounds + 1, pos + n_out, prev, last, tc, dc,
            k, done,
        )

    out, count, rounds, *_ = jax.lax.while_loop(cond, body, carry0)
    return out, count, rounds


def speculative_generate(
    tparams,
    tcfg: LLaMAConfig,
    dparams,
    dcfg: LLaMAConfig,
    prompt,
    max_new_tokens: int,
    *,
    K: int = 4,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
    quantize_kv=False,
    stats_out: Optional[dict] = None,
) -> np.ndarray:
    """Generate with draft-model speculation; output distribution == target's.

    ``stats_out``: optional dict that receives realized round telemetry —
    {"rounds", "tokens", "accepted", "acceptance"} (accepted drafts / drafted
    = the measured chain acceptance the PERF.md cost model predicts from).

    Both models must share the tokenizer/vocab (the ja family does). Generation
    stops ``K`` short of the cache capacity (speculative rounds need room for
    K+1 writes; no roll-eviction inside a round). ``quantize_kv``
    (False | "int8" | "int4") quantizes the TARGET cache — rejection rollback
    is position bookkeeping only, so quantized writes work unchanged; the
    small draft cache stays ``cache_dtype``.
    """
    prompt = jnp.asarray(prompt, jnp.int32)
    T = int(prompt.shape[0])
    # S derives from the static padded length so the fused program buckets on
    # (P, max_new_tokens) rather than the exact prompt length
    P = min(bucket_length(T), min(tcfg.block_size, dcfg.block_size))
    S = min(P + max_new_tokens + K + 1, min(tcfg.block_size, dcfg.block_size))
    if key is None:
        key = jax.random.PRNGKey(0)

    tcache = init_kv_cache(tcfg, 1, S, cache_dtype, quantized=quantize_kv)
    dcache = init_kv_cache(dcfg, 1, S, cache_dtype)
    padded = jnp.zeros((P,), jnp.int32).at[:T].set(prompt)

    out_buf, count, rounds = _spec_generate_jit(
        tparams, dparams, padded, jnp.int32(T), tcache, dcache, key,
        tcfg=tcfg, dcfg=dcfg, K=K, max_new_tokens=max_new_tokens, S=S,
        temperature=temperature, top_k=top_k, top_p=top_p, eos_id=eos_id,
    )
    count = int(count)
    rounds = int(rounds)
    out = np.asarray(out_buf)[: min(count, max_new_tokens)].tolist()
    if eos_id is not None and eos_id in out:
        out = out[: out.index(eos_id) + 1]
    if stats_out is not None:
        # Acceptance from the UNTRUNCATED device counters: every round emits its
        # accepted drafts plus exactly one corrected/bonus token, and out_buf[0]
        # is the prefill token, so accepted = count - 1 - rounds. Deriving this
        # from the host-truncated list (min(count, max_new_tokens), then the EOS
        # cut) under-reported acceptance whenever the last round overshot
        # max_new_tokens (by up to K) or generation stopped at EOS.
        emitted_n = max(len(out) - 1, 0)  # first token came from the prefill
        accepted = max(count - 1 - rounds, 0)
        stats_out.update(
            rounds=rounds,
            tokens=emitted_n,
            accepted=accepted,
            acceptance=(accepted / (rounds * K)) if rounds else 0.0,
        )
    return np.concatenate([np.asarray(prompt), np.asarray(out, np.int32)])
