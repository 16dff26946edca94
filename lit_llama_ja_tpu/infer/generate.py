"""Autoregressive generation (reference `generate.py:19-89`).

TPU-first structure: ONE jitted function contains the prefill and the whole decode
loop (`lax.scan` over steps), so a full generation is a single device program — the
per-token graph-cut the reference needs on XLA (`generate.py:79-80` `xm.mark_step()`)
does not exist here. Prompt lengths are padded up to power-of-two buckets to bound
recompilation; padded prefill slots are masked by position and later overwritten.

Sampling (temperature / top-k / categorical) runs inside the compiled loop.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache
from lit_llama_ja_tpu.ops.sampling import sample_token


def bucket_length(n: int, minimum: int = 16) -> int:
    """Round up to the next power of two (>= minimum) to bound jit recompiles."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _cached_forward(params, idx, input_pos, cache, config, prefill_attn=False):
    """Dispatch the incremental forward on the config class: MoE checkpoints
    (config.json carries expert fields → `models/moe.MoEConfig`) decode
    through the sparse-MLP path; dense configs through `llama`. The config is
    jit-static, so this is a trace-time branch."""
    from lit_llama_ja_tpu.models.moe import MoEConfig, forward_moe_with_cache

    if isinstance(config, MoEConfig):
        return forward_moe_with_cache(
            params, idx, input_pos, cache, config, prefill_attn=prefill_attn
        )
    return forward_with_cache(
        params, idx, input_pos, cache, config, prefill_attn=prefill_attn
    )


@partial(
    jax.jit,
    static_argnames=(
        "config", "max_new_tokens", "max_seq_length", "temperature", "top_k",
        "top_p", "cache_dtype", "quantize_kv",
    ),
)
def _generate_jit(
    params,
    padded_prompt: jax.Array,  # (P,) int32, padded with anything beyond prompt_len
    prompt_len: jax.Array,  # () int32
    key: jax.Array,
    *,
    config: LLaMAConfig,
    max_new_tokens: int,
    max_seq_length: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    cache_dtype,
    quantize_kv: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    P = padded_prompt.shape[0]
    cache = init_kv_cache(config, 1, max_seq_length, cache_dtype, quantized=quantize_kv)

    # --- prefill: all P slots in one pass; slots >= prompt_len hold garbage but are
    # masked by position until overwritten by decode steps.
    input_pos = jnp.arange(P, dtype=jnp.int32)
    logits, cache = _cached_forward(
        params, padded_prompt[None, :], input_pos, cache, config,
        prefill_attn=True,  # empty cache: causal over in-flight k/v (TTFT)
    )
    # logits of the *last real* prompt token
    last_logits = jax.lax.dynamic_index_in_dim(
        logits[0], prompt_len - 1, axis=0, keepdims=False
    )
    key, sub = jax.random.split(key)
    first_tok = sample_token(sub, last_logits, temperature, top_k, top_p)

    def step(carry, _):
        cache, tok, pos, key = carry
        key, sub = jax.random.split(key)
        logits, cache = _cached_forward(
            params, tok[None, None], pos[None], cache, config
        )
        nxt = sample_token(sub, logits[0, -1], temperature, top_k, top_p)
        return (cache, nxt, pos + 1, key), tok

    (cache, last_tok, _, _), toks = jax.lax.scan(
        step,
        (cache, first_tok, prompt_len, key),
        None,
        length=max_new_tokens - 1,
    )
    new_tokens = jnp.concatenate([toks, last_tok[None]])
    return new_tokens, prompt_len


def generate(
    params,
    config: LLaMAConfig,
    prompt: jax.Array,
    max_new_tokens: int,
    *,
    max_seq_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
    quantize_kv: bool = False,
) -> np.ndarray:
    """Generate a continuation of ``prompt`` (1-D int array of token ids).

    Mirrors the reference semantics (`generate.py:19-89`): generates up to
    ``max_new_tokens``, stops at ``eos_id`` (inclusive) if given, and the KV cache is
    sized ``min(T + max_new_tokens, block_size)`` with roll-left eviction beyond it.
    Returns a numpy array ``prompt + generated`` (truncated at eos).
    """
    prompt = jnp.asarray(prompt, jnp.int32)
    T = int(prompt.shape[0])
    if T > config.block_size:
        raise ValueError(
            f"Cannot forward sequence of length {T}, block size is only "
            f"{config.block_size}"  # reference assertion, lit_llama/model.py:92-94
        )
    if max_seq_length is None:
        max_seq_length = min(T + max_new_tokens, config.block_size)
    P = min(bucket_length(T), config.block_size)
    padded = jnp.zeros((P,), jnp.int32).at[:T].set(prompt)
    if key is None:
        key = jax.random.PRNGKey(0)
    # cache must hold at least the padded prefill span
    S = max(max_seq_length, P)
    new_tokens, _ = _generate_jit(
        params,
        padded,
        jnp.int32(T),
        key,
        config=config,
        max_new_tokens=max_new_tokens,
        max_seq_length=S,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        cache_dtype=cache_dtype,
        quantize_kv=quantize_kv,
    )
    new_tokens = np.asarray(new_tokens)
    if eos_id is not None:
        hits = np.nonzero(new_tokens == eos_id)[0]
        if hits.size:
            new_tokens = new_tokens[: hits[0] + 1]  # include the EOS token
    return np.concatenate([np.asarray(prompt), new_tokens])
