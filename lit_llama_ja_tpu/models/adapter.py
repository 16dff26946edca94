"""LLaMA-Adapter v1 and v2 as parameter-tree transforms.

Reference: `lit_llama/adapter.py` (v1: learnable prefix + zero-init per-head gating,
prefix cross-attention summed into self-attention from `adapter_start_layer` on) and
`lit_llama/adapter_v2.py` (v2: additionally a learnable per-Linear bias+scale and
trainable RMSNorms, monkey-patched onto Linear forward at `adapter_v2.py:28-45`).

TPU-first redesign: no subclasses / monkey-patching —
  * v1 adds ``adapter_wte (L, aT, D)`` and ``gating_factor (L, n_head)`` leaves to
    the stacked block tree; the scan body gets the layer index and masks the prefix
    branch for layers < ``adapter_start_layer`` (zero-init gating means inactive
    layers contribute exactly nothing either way, matching the reference).
  * v2 adds ``adapter_scale`` / ``adapter_bias`` leaves to every linear leaf-dict;
    `models/llama.apply_linear` applies ``scale * (x @ W + bias)`` when present.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import (
    KVCache,
    _qkv,
    apply_linear,
    transformer_block,
)
from lit_llama_ja_tpu.ops.attention import causal_attention, decode_attention, prefix_attention
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import build_rope_cache


@dataclass(frozen=True)
class AdapterConfig(LLaMAConfig):
    """Reference `lit_llama/adapter.py:53-57`."""

    adapter_prompt_length: int = 10
    adapter_start_layer: int = 2

    @classmethod
    def from_name(cls, name: str, **overrides) -> "AdapterConfig":
        from lit_llama_ja_tpu.core.config import llama_configs

        return cls(**{**llama_configs[name], **overrides})


def init_adapter_params(
    key: jax.Array, config: AdapterConfig, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """adapter_wte ~ N(0,1) per nn.Embedding default; gating zero-init
    (reference `adapter.py:74-77`)."""
    L, aT, D = config.n_layer, config.adapter_prompt_length, config.n_embd
    return {
        "adapter_wte": jax.random.normal(key, (L, aT, D), dtype),
        "gating_factor": jnp.zeros((L, config.n_head), dtype),
    }


def add_adapter(params: Dict[str, Any], adapter_params: Dict[str, jax.Array]):
    new = jax.tree_util.tree_map(lambda a: a, params)
    blocks = dict(new["blocks"])
    blocks["adapter"] = dict(adapter_params)
    new["blocks"] = blocks
    return new


def extract_adapter_state(params: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Adapter-only checkpoint content (reference `adapter_state_from_state_dict`)."""
    state = {}
    if "adapter" in params["blocks"]:
        state.update(
            {f"adapter/{k}": v for k, v in params["blocks"]["adapter"].items()}
        )
    return state


def adapter_trainable(path: str) -> bool:
    """Reference `mark_only_adapter_as_trainable` (`adapter.py:305-308`)."""
    return "adapter_wte" in path or "gating_factor" in path


def adapter_v2_trainable(path: str) -> bool:
    """Reference `get_adapter_substrings` (`adapter_v2.py:9-13`)."""
    return any(
        s in path
        for s in (
            "adapter_wte", "gating_factor", "adapter_scale", "adapter_bias",
            "rms_1", "rms_2", "ln_f",
        )
    )


# ---------------------------------------------------------------------------
# Adapter v2 linear patching
# ---------------------------------------------------------------------------

_V2_LINEARS = (
    ("blocks", "attn", "c_attn"),
    ("blocks", "attn", "c_proj"),
    ("blocks", "mlp", "c_fc1"),
    ("blocks", "mlp", "c_fc2"),
    ("blocks", "mlp", "c_proj"),
)


def add_adapter_v2(params: Dict[str, Any], dtype=jnp.float32) -> Dict[str, Any]:
    """Add zero-bias / unit-scale leaves to every Linear (reference
    `add_adapter_v2_parameters_to_linear_layers`, `adapter_v2.py:34-45`).
    Stacked linears get stacked (L, out) leaves; lm_head gets (out,)."""
    new = jax.tree_util.tree_map(lambda a: a, params)

    def patch(leaf: Dict[str, jax.Array], stacked: bool):
        w = leaf["weight"]
        out = w.shape[-1]
        shape = (w.shape[0], 1, out) if stacked else (out,)
        d = dict(leaf)
        d["adapter_bias"] = jnp.zeros(shape, dtype)
        d["adapter_scale"] = jnp.ones(shape, dtype)
        return d

    node = new
    for path in _V2_LINEARS:
        parent = new
        for p in path[:-1]:
            parent[p] = dict(parent[p])
            parent = parent[p]
        parent[path[-1]] = patch(parent[path[-1]], stacked=True)
    new["lm_head"] = patch(dict(new["lm_head"]), stacked=False)
    return new


def extract_adapter_v2_state(params: Dict[str, Any]) -> Dict[str, jax.Array]:
    """v2 checkpoint content: v1 state + per-linear scale/bias + norms
    (reference `adapter_v2_state_from_state_dict`)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    from lit_llama_ja_tpu.parallel.specs import path_of

    return {
        path_of(kp): leaf
        for kp, leaf in flat
        if adapter_v2_trainable(path_of(kp))
    }


# ---------------------------------------------------------------------------
# Forward with prefix cross-attention
# ---------------------------------------------------------------------------

def _adapter_attention(
    attn_params,
    adapter_wte_l,  # (aT, D)
    gating_l,  # (n_head,)
    active,  # () bool — layer_idx >= adapter_start_layer
    x,
    rope,
    config,
    kv_cache=None,
    input_pos=None,
    prefill_attn=False,
):
    """Self-attention + gated prefix cross-attention (reference `adapter.py:86-172`).

    ``prefill_attn``: static promise of a prefill from an EMPTY cache — the
    self-attention half runs causally over the in-flight k/v instead of
    reading the S-wide cache per row (same contract as
    `llama.forward_with_cache`; the prefix branch is unaffected)."""
    B, T, C = x.shape
    nh, hd = config.n_head, config.head_dim
    q, k, v = _qkv(attn_params, x, nh, rope)

    if kv_cache is None:
        y = causal_attention(q, k, v)
        new_cache = None
    else:
        cache_k, cache_v = kv_cache
        S = cache_k.shape[2]
        last_pos = input_pos[-1]

        def evict(ck, cv, pos):
            ck = jnp.roll(ck, -1, axis=2)
            cv = jnp.roll(cv, -1, axis=2)
            return ck, cv, jnp.full_like(pos, S - 1)

        cache_k, cache_v, write_pos = jax.lax.cond(
            last_pos >= S, evict, lambda a, b, c: (a, b, c), cache_k, cache_v, input_pos
        )
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, 0, write_pos[0], 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, 0, write_pos[0], 0)
        )
        if prefill_attn:
            y = causal_attention(q, k, v)
        else:
            y = decode_attention(
                q, cache_k.astype(q.dtype), cache_v.astype(q.dtype), write_pos
            )
        new_cache = (cache_k, cache_v)

    # prefix cross-attention branch: no RoPE on the prefix (reference computes
    # ak/av from c_attn WITHOUT rope, adapter.py:153-157)
    aT = adapter_wte_l.shape[0]
    prefix = adapter_wte_l[None].astype(x.dtype)  # (1, aT, D)
    aqkv = apply_linear(attn_params["c_attn"], prefix)
    _, ak, av = jnp.split(aqkv, 3, axis=-1)
    ak = jnp.broadcast_to(ak.reshape(1, aT, nh, hd), (B, aT, nh, hd)).transpose(0, 2, 1, 3)
    av = jnp.broadcast_to(av.reshape(1, aT, nh, hd), (B, aT, nh, hd)).transpose(0, 2, 1, 3)
    ay = prefix_attention(q, ak, av)
    gate = gating_l.reshape(1, nh, 1, 1).astype(y.dtype)
    y = y + jnp.where(active, 1.0, 0.0).astype(y.dtype) * gate * ay

    y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
    return apply_linear(attn_params["c_proj"], y), new_cache


def _adapter_block(block_params, adapter, layer_idx, x, rope, config,
                   kv_cache=None, input_pos=None, prefill_attn=False):
    active = layer_idx >= config.adapter_start_layer
    h, new_cache = _adapter_attention(
        block_params["attn"],
        adapter["adapter_wte"],
        adapter["gating_factor"],
        active,
        rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps),
        rope,
        config,
        kv_cache,
        input_pos,
        prefill_attn=prefill_attn,
    )
    x = x + h
    from lit_llama_ja_tpu.models.llama import mlp_block

    x = x + mlp_block(
        block_params["mlp"], rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps)
    )
    return x, new_cache


@partial(jax.jit, static_argnames=("config",))
def adapter_forward(params, idx: jax.Array, config: AdapterConfig) -> jax.Array:
    """Full-sequence forward with adapter prefix attention."""
    T = idx.shape[1]
    rope = build_rope_cache(config.block_size, config.head_dim, config.rope_base)[:T]
    x = params["wte"]["weight"][idx]
    blocks = {k: v for k, v in params["blocks"].items() if k != "adapter"}
    adapter = params["blocks"]["adapter"]
    L = config.n_layer

    def body(x, xs):
        block_params, adapter_l, layer_idx = xs
        x, _ = _adapter_block(block_params, adapter_l, layer_idx, x, rope, config)
        return x, None

    x, _ = jax.lax.scan(body, x, (blocks, adapter, jnp.arange(L)))
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    return apply_linear(params["lm_head"], x)


@partial(jax.jit, static_argnames=("config", "prefill_attn"))
def adapter_forward_with_cache(
    params, idx: jax.Array, input_pos: jax.Array, kv_cache: KVCache,
    config: AdapterConfig,
    prefill_attn: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Incremental forward with KV cache; the tiny (aT=10) adapter k/v are
    recomputed per step instead of cached — stateless and negligible."""
    rope_full = build_rope_cache(config.block_size, config.head_dim, config.rope_base)
    rope = rope_full[input_pos]
    x = params["wte"]["weight"][idx]
    blocks = {k: v for k, v in params["blocks"].items() if k != "adapter"}
    adapter = params["blocks"]["adapter"]
    L = config.n_layer

    def body(x, xs):
        block_params, adapter_l, layer_idx, ck, cv = xs
        x, (ck, cv) = _adapter_block(
            block_params, adapter_l, layer_idx, x, rope, config,
            kv_cache=(ck, cv), input_pos=input_pos, prefill_attn=prefill_attn,
        )
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (blocks, adapter, jnp.arange(L), kv_cache["k"], kv_cache["v"])
    )
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    return apply_linear(params["lm_head"], x), {"k": new_k, "v": new_v}
