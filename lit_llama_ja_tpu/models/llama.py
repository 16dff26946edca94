"""Functional LLaMA decoder (capability parity with reference `lit_llama/model.py`).

TPU-first redesign, not a translation:

  * Parameters are a plain pytree with all transformer blocks **stacked on a leading
    layer axis** and the forward pass runs `lax.scan` over layers — one compiled block
    body instead of `n_layer` unrolled copies (fast compiles, and the layer axis is a
    natural pipeline/offload axis for sharding).
  * The KV cache is an **explicit pytree threaded through the call** rather than module
    state (reference mutates `self.kv_caches` at `lit_llama/model.py:115-123`); this is
    what makes the decode step a single pure jitted function.
  * Weights are stored ``(in_features, out_features)`` so matmuls are ``x @ W`` without
    transposes in the hot path (checkpoint converters transpose from torch layout).
  * Roll-left cache eviction when generation passes the cache size (reference
    `lit_llama/model.py:221-227`) is a `lax.cond` on the position scalar.

Param tree layout (L = n_layer, D = n_embd, H = n_hidden, V = padded_vocab_size):

    {"wte":     {"weight": (V, D)},
     "lm_head": {"weight": (D, V)},
     "ln_f":    {"scale": (D,)},
     "blocks": {
        "rms_1": {"scale": (L, D)},
        "attn":  {"c_attn": {"weight": (L, D, 3D)}, "c_proj": {"weight": (L, D, D)}},
        "rms_2": {"scale": (L, D)},
        "mlp":   {"c_fc1": {"weight": (L, D, H)}, "c_fc2": {"weight": (L, D, H)},
                  "c_proj": {"weight": (L, H, D)}}}}
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.ops.attention import causal_attention, decode_attention
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import apply_rope, build_rope_cache

Params = Dict[str, Any]
KVCache = Dict[str, jax.Array]  # {"k": (L, B, nh, S, hd), "v": (L, B, nh, S, hd)}


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_params(
    key: jax.Array, config: LLaMAConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Initialize a parameter tree.

    Linears and the embedding use N(0, 0.02 / sqrt(2 * n_layer)) matching the
    reference's `_init_weights` (`lit_llama/model.py:78-82`); RMSNorm scales are ones.
    """
    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    std = 0.02 / (2 * config.n_layer) ** 0.5
    keys = jax.random.split(key, 8)

    def normal(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "wte": {"weight": normal(keys[0], (V, D))},
        "lm_head": {"weight": normal(keys[1], (D, V))},
        "ln_f": {"scale": jnp.ones((D,), dtype)},
        "blocks": {
            "rms_1": {"scale": jnp.ones((L, D), dtype)},
            "attn": {
                "c_attn": {"weight": normal(keys[2], (L, D, 3 * D))},
                "c_proj": {"weight": normal(keys[3], (L, D, D))},
            },
            "rms_2": {"scale": jnp.ones((L, D), dtype)},
            "mlp": {
                "c_fc1": {"weight": normal(keys[4], (L, D, H))},
                "c_fc2": {"weight": normal(keys[5], (L, D, H))},
                "c_proj": {"weight": normal(keys[6], (L, H, D))},
            },
        },
    }


def normalize_kv_mode(value):
    """Normalize a user-facing KV-cache mode string to ``init_kv_cache``'s
    ``quantized`` argument: False | "int8" | "int4". Raises on anything else
    (a typo like ``in4`` must not silently select a different cache)."""
    if value is None or value is False:
        return False
    if value is True:
        return "int8"
    v = str(value).lower()
    if v in ("none", "false", "fp", "bf16", ""):
        return False
    if v in ("int8", "int4"):
        return v
    raise ValueError(
        f"unknown KV-cache mode {value!r}; expected one of none|int8|int4"
    )


def init_kv_cache(
    config: LLaMAConfig,
    batch_size: int,
    max_seq_length: int,
    dtype: jnp.dtype = jnp.float32,
    quantized=False,
) -> KVCache:
    """Zero-filled KV cache pytree: ``(L, B, n_head, max_seq_length, head_dim)``.

    ``quantized``: False | True/"int8" | "int4". INT8 stores per-slot absmax
    scales (halves the decode HBM traffic of the cache,
    `ops/attention.decode_attention_quant`); INT4 packs two values per byte
    (quarters it, `ops/attention.decode_attention_quant4`; coarser — measure
    quality with `tools/quality_gate.py --kv`).
    """
    shape = (config.n_layer, batch_size, config.n_head, max_seq_length, config.head_dim)
    sshape = shape[:-1] + (1,)
    if quantized == "int4":
        # head-pair packed: nh/2 byte planes of full head_dim (128 lanes — an
        # hd/2 trailing dim would pad 64→128 lanes and double the real HBM
        # footprint; see ops/attention.quantize_kv4)
        pshape = (
            config.n_layer, batch_size, config.n_head // 2,
            max_seq_length, config.head_dim,
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


# ---------------------------------------------------------------------------
# Linear application — indirection point for quantized / LoRA / adapter-v2 variants
# ---------------------------------------------------------------------------

def apply_linear(
    layer_params: Dict[str, jax.Array],
    x: jax.Array,
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """``x @ W`` with dispatch on the parameter leaves present.

    Plain linears have {"weight"}; quantized linears have {"qweight", "scales",
    "zeros"} (see `quant/linear.py`); LoRA-augmented linears add {"lora_A",
    "lora_B", "lora_alpha"} (see `models/lora.py`); adapter-v2 patched linears
    additionally carry {"adapter_scale", "adapter_bias"} (reference
    `lit_llama/adapter_v2.py:28-31`).
    """
    if "qweight" in layer_params:
        from lit_llama_ja_tpu.quant.linear import quant_matmul

        y = quant_matmul(x, layer_params)
    else:
        w = layer_params["weight"]
        y = x @ w.astype(x.dtype)
    if "lora_A" in layer_params:
        from lit_llama_ja_tpu.models.lora import lora_branch

        y = y + lora_branch(
            layer_params, x, dropout_rng=dropout_rng, dropout_rate=dropout_rate
        )
    if "adapter_bias" in layer_params:
        y = layer_params["adapter_scale"].astype(y.dtype) * (
            y + layer_params["adapter_bias"].astype(y.dtype)
        )
    return y


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _qkv(attn_params, x, n_head, rope, dropout_rng=None, dropout_rate=0.0):
    """Project to q, k, v heads and apply RoPE. Returns (B, nh, T, hd) each."""
    B, T, C = x.shape
    hd = C // n_head
    qkv = apply_linear(
        attn_params["c_attn"], x, dropout_rng=dropout_rng, dropout_rate=dropout_rate
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, n_head, hd)
    k = k.reshape(B, T, n_head, hd)
    v = v.reshape(B, T, n_head, hd)
    q = apply_rope(q, rope)
    k = apply_rope(k, rope)
    # -> (B, nh, T, hd)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


def attention_block(
    attn_params: Params,
    x: jax.Array,
    rope: jax.Array,
    config: LLaMAConfig,
    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    input_pos: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    prefill_attn: bool = False,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """Causal self-attention (reference `lit_llama/model.py:178-243`).

    Without a cache: full-sequence causal attention.
    With a cache: writes k/v at ``input_pos`` (contiguous span) into the cache,
    evicting roll-left if the position exceeds the cache size, then attends the
    queries against the whole cache.
    """
    B, T, C = x.shape
    q, k, v = _qkv(attn_params, x, config.n_head, rope, dropout_rng, dropout_rate)

    if kv_cache is None:
        y = causal_attention(q, k, v)
        new_cache = None
    else:
        quantized = "k_scale" in kv_cache
        int4 = quantized and kv_cache["k"].dtype == jnp.uint8
        S = kv_cache["k"].shape[2]
        last_pos = input_pos[-1]

        def evict(cache, pos):
            # Reference roll-left eviction (`lit_llama/model.py:221-227`): shift the
            # whole cache one slot left and write at the last slot.
            cache = {key: jnp.roll(c, -1, axis=2) for key, c in cache.items()}
            return cache, jnp.full_like(pos, S - 1)

        cache, write_pos = jax.lax.cond(
            last_pos >= S, evict, lambda c, p: (c, p), kv_cache, input_pos
        )

        if int4:
            from lit_llama_ja_tpu.ops.attention import (
                decode_attention_quant4,
                quantize_kv4,
            )

            kq, ks, vq, vs = quantize_kv4(k, v, head_axis=1)
            writes = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
        elif quantized:
            from lit_llama_ja_tpu.ops.attention import (
                decode_attention_quant,
                quantize_kv,
            )

            kq, ks, vq, vs = quantize_kv(k, v)
            writes = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
        else:
            writes = {"k": k.astype(cache["k"].dtype),
                      "v": v.astype(cache["v"].dtype)}

        # Contiguous T-token write at write_pos[0] (prefill: [0..T), decode: [t]).
        cache = {
            key: jax.lax.dynamic_update_slice(
                cache[key], val, (0, 0, write_pos[0], 0)
            )
            for key, val in writes.items()
        }

        if prefill_attn:
            # Prefill-from-empty (static caller promise: span starts at
            # position 0 on a zero cache): nothing useful is cached yet, so
            # attend causally over the in-flight bf16 k/v instead of reading
            # the S-wide (possibly quantized) cache for every row. Exact for
            # fp caches; for quantized caches the prefill logits become
            # MORE accurate (decode steps still read quantized K/V). Round-4
            # TTFT measurement: 531 → ~410 ms at T=2048 under int4-KV.
            y = causal_attention(q, k, v)
        elif int4:
            y = decode_attention_quant4(
                q, cache["k"], cache["k_scale"], cache["v"], cache["v_scale"],
                write_pos,
            )
        elif quantized:
            y = decode_attention_quant(
                q, cache["k"], cache["k_scale"], cache["v"], cache["v_scale"],
                write_pos,
            )
        else:
            y = decode_attention(
                q, cache["k"].astype(q.dtype), cache["v"].astype(q.dtype), write_pos
            )
        new_cache = cache

    y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
    return apply_linear(attn_params["c_proj"], y), new_cache


def mlp_block(mlp_params: Params, x: jax.Array) -> jax.Array:
    """SwiGLU MLP (reference `lit_llama/model.py:246-260`)."""
    h = jax.nn.silu(apply_linear(mlp_params["c_fc1"], x)) * apply_linear(
        mlp_params["c_fc2"], x
    )
    return apply_linear(mlp_params["c_proj"], h)


def transformer_block(
    block_params: Params,
    x: jax.Array,
    rope: jax.Array,
    config: LLaMAConfig,
    kv_cache=None,
    input_pos=None,
    dropout_rng=None,
    dropout_rate=0.0,
    prefill_attn=False,
):
    """Pre-norm residual block (reference `lit_llama/model.py:154-175`)."""
    h, new_cache = attention_block(
        block_params["attn"],
        rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps),
        rope,
        config,
        kv_cache,
        input_pos,
        dropout_rng,
        dropout_rate,
        prefill_attn=prefill_attn,
    )
    x = x + h
    x = x + mlp_block(
        block_params["mlp"], rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps)
    )
    return x, new_cache


# ---------------------------------------------------------------------------
# Full model forward
# ---------------------------------------------------------------------------

def _rope_for_positions(config: LLaMAConfig, input_pos: Optional[jax.Array], T: int):
    cache = build_rope_cache(config.block_size, config.head_dim, config.rope_base)
    if input_pos is None:
        return cache[:T]
    return cache[input_pos]


@partial(jax.jit, static_argnames=("config", "dropout_rate", "remat"))
def forward(
    params: Params,
    idx: jax.Array,
    config: LLaMAConfig,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    remat: bool = False,
) -> jax.Array:
    """Full-sequence forward (training / perplexity path, no cache).

    Args:
      idx: ``(B, T)`` int32 token ids.
      dropout_rng/dropout_rate: LoRA-branch dropout (reference `lora.py:82-84`);
        only used when the tree carries LoRA leaves and a rng is given.
      remat: rematerialize per-block activations in the backward pass — the
        activation-checkpointing-on-Block equivalent of the reference's FSDP
        strategy (`pretrain/shakespeare.py:49-52`, `finetune/full.py:57-58`);
        trades ~1/3 more FLOPs for O(L) -> O(1) blocks of live activations.
    Returns:
      logits ``(B, T, padded_vocab_size)``.
    """
    T = idx.shape[1]
    rope = _rope_for_positions(config, None, T)
    x = params["wte"]["weight"][idx]

    L = config.n_layer
    layer_rngs = (
        jax.random.split(dropout_rng, L) if dropout_rng is not None else None
    )

    def body(x, xs):
        if layer_rngs is None:
            block_params = xs
            rng = None
        else:
            block_params, rng = xs
        x, _ = transformer_block(
            block_params, x, rope, config,
            dropout_rng=rng, dropout_rate=dropout_rate,
        )
        return x, None

    if remat:
        body = jax.checkpoint(body)
    xs = params["blocks"] if layer_rngs is None else (params["blocks"], layer_rngs)
    x, _ = jax.lax.scan(body, x, xs)
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    return apply_linear(params["lm_head"], x)


@partial(jax.jit, static_argnames=("config", "prefill_attn"))
def forward_with_cache(
    params: Params,
    idx: jax.Array,
    input_pos: jax.Array,
    kv_cache: KVCache,
    config: LLaMAConfig,
    prefill_attn: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Incremental forward with KV cache (reference `lit_llama/model.py:101-123`).

    Args:
      idx: ``(B, T)`` token ids occupying absolute positions ``input_pos`` (``(T,)``,
        contiguous). Prefill passes ``arange(T)``; decode passes ``[t]``.
      kv_cache: pytree from `init_kv_cache`; returned updated.
      prefill_attn: static caller promise that this call is a prefill from an
        EMPTY cache (``input_pos`` starts at 0): attention runs causally over
        the in-flight bf16 k/v instead of reading the S-wide (possibly
        quantized) cache per row. Exact for fp caches; sharper-than-served
        logits for quantized ones. Do NOT set for mid-stream spans
        (speculative verify, teacher-forced eval windows).
    Returns:
      (logits ``(B, T, V)``, new kv_cache).
    """
    rope = _rope_for_positions(config, input_pos, idx.shape[1])
    x = params["wte"]["weight"][idx]

    def body(x, layer_in):
        block_params, cache_l = layer_in
        x, cache_l = transformer_block(
            block_params, x, rope, config, kv_cache=cache_l, input_pos=input_pos,
            prefill_attn=prefill_attn,
        )
        return x, cache_l

    x, new_cache = jax.lax.scan(body, x, (params["blocks"], kv_cache))
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    logits = apply_linear(params["lm_head"], x)
    return logits, new_cache


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
