"""Mixture-of-Experts LLaMA variant + token-choice routing (beyond-reference).

The reference has no MoE (SURVEY.md §2.3 confirms expert parallelism absent);
this module adds a Mixtral-style sparse-MLP decoder as a first-class model
family so the framework's parallel stack covers ep alongside dp/fsdp/tp/pp/sp
(`parallel/ep.py` shards the expert axis and routes tokens with all_to_all).

TPU-first design notes:
  * Experts are STACKED on a leading E axis per layer — ``(L, E, D, H)`` — so
    the per-layer expert compute is one batched einsum on the MXU
    (``ecd,edh->ech``), not a Python loop over experts.
  * Routing is fixed-capacity token-choice (GShard/Switch): every shape is
    static, dispatch/combine are scatter-add/gather — no dynamic shapes under
    jit. Overflowing tokens are dropped (their residual passes through), the
    standard TPU MoE trade.
  * k-major dispatch order: all tokens' primary (top-1) routes claim capacity
    before any secondary route, so congestion drops secondaries first.
  * The router runs in f32 regardless of param dtype (routing decisions are
    precision-sensitive; the standard practice, e.g. ST-MoE).

Losses: GShard load-balance loss ``E * Σ_e f_e · P_e`` (f_e = fraction of
routed assignments to expert e, P_e = mean router prob) and the ST-MoE router
z-loss ``mean(logsumexp(logits)²)``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig, find_multiple
from lit_llama_ja_tpu.models.llama import (
    apply_linear,
    attention_block,
    _rope_for_positions,
)
from lit_llama_ja_tpu.ops.norms import rmsnorm

Params = Dict[str, Any]


@dataclass(frozen=True)
class MoEConfig(LLaMAConfig):
    """LLaMAConfig + MoE knobs. Frozen/hashable → jit-static like the base."""

    n_expert: int = 8
    n_expert_active: int = 2  # top-k routes per token
    capacity_factor: float = 1.25
    aux_loss_coef: float = 0.01
    router_z_coef: float = 1e-3

    # from_name is inherited: LLaMAConfig.from_name builds via cls(...), so it
    # already returns MoEConfig here.

    def capacity(self, n_tokens: int) -> int:
        """Static per-expert slot count for a batch of ``n_tokens``."""
        c = int(n_tokens * self.n_expert_active * self.capacity_factor / self.n_expert)
        return max(find_multiple(max(c, 1), 8), 8)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_moe_params(
    key: jax.Array, config: MoEConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Parameter tree: the dense blocks' ``mlp`` is replaced by ``moe`` with a
    router ``(L, D, E)`` and E stacked SwiGLU experts ``(L, E, D, H)``."""
    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    E = config.n_expert
    std = 0.02 / (2 * L) ** 0.5
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
            "moe": {
                # router in f32: tiny, and routing is precision-sensitive
                "router": {"weight": jax.random.normal(keys[4], (L, D, E), jnp.float32) * std},
                "c_fc1": {"weight": normal(keys[5], (L, E, D, H))},
                "c_fc2": {"weight": normal(keys[6], (L, E, D, H))},
                "c_proj": {"weight": normal(keys[7], (L, E, H, D))},
            },
        },
    }


# ---------------------------------------------------------------------------
# Routing
# ---------------------------------------------------------------------------

def route_tokens(
    router_w: jax.Array,  # (D, E) f32
    xf: jax.Array,  # (N, D)
    k: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Token-choice top-k routing with static capacity.

    Returns ``(gate (N, k), expert (N, k), pos (N, k), keep (N, k), aux)`` where
    ``pos`` is the token's slot inside its expert's (capacity,) queue and
    ``keep`` masks assignments that overflowed capacity. ``aux`` carries the
    load-balance / z losses (means over this token set — callers running on a
    mesh shard psum/average them).
    """
    N, _ = xf.shape
    E = router_w.shape[-1]
    logits = xf.astype(jnp.float32) @ router_w  # (N, E)
    probs = jax.nn.softmax(logits, axis=-1)
    gate, expert = jax.lax.top_k(probs, k)  # (N, k)
    gate = gate / jnp.sum(gate, axis=-1, keepdims=True)

    # k-major order: primary routes claim capacity slots first.
    assign = expert.T.reshape(-1)  # (k*N,)
    onehot = jax.nn.one_hot(assign, E, dtype=jnp.int32)  # (k*N, E)
    pos_flat = (jnp.cumsum(onehot, axis=0) * onehot).sum(-1) - 1  # (k*N,)
    pos = pos_flat.reshape(k, N).T  # (N, k)
    keep = pos < capacity

    # GShard aux statistics: f_e = fraction of assignments to expert e
    # (pre-drop, over all k·N routes; balanced value 1/E), P_e = mean router
    # prob. Kept as VECTORS so a sharded caller can pmean them globally before
    # forming the product (`finalize_aux`) — the balance loss of the global
    # token set, not a mean of per-shard losses.
    stats = {
        "f": onehot.astype(jnp.float32).mean(0),
        "P": probs.mean(0),
        "router_z": jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2),
        # telemetry: fraction of assignments dropped by capacity
        "dropped": 1.0 - keep.astype(jnp.float32).mean(),
    }
    return gate, expert, pos, keep, stats


def finalize_aux(stats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Collapse routing statistics into the aux losses:
    ``load_balance = E·Σ f_e P_e`` (== 1 at uniform routing) + z-loss."""
    E = stats["f"].shape[-1]
    return {
        "load_balance": E * jnp.sum(stats["f"] * stats["P"], axis=-1),
        "router_z": stats["router_z"],
        "dropped": stats["dropped"],
    }


def moe_mlp(
    moe_params: Params,  # per-layer: router (D, E), experts (E, D, H)/(E, H, D)
    x: jax.Array,  # (B, T, D)
    config: MoEConfig,
    capacity: Optional[int] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sparse SwiGLU MLP: route → dispatch (E, C, D) → batched expert einsum →
    combine. Drop-in replacement for `llama.mlp_block` (plus aux losses)."""
    B, T, D = x.shape
    N = B * T
    k = config.n_expert_active
    E = config.n_expert
    C = capacity if capacity is not None else config.capacity(N)
    xf = x.reshape(N, D)

    gate, expert, pos, keep, stats = route_tokens(
        moe_params["router"]["weight"], xf, k, C
    )
    aux = finalize_aux(stats)

    # dispatch: scatter tokens into per-expert queues (E, C, D)
    pos_c = jnp.where(keep, pos, C - 1)  # clipped; contribution zeroed below
    buf = jnp.zeros((E, C, D), x.dtype)
    contrib = jnp.where(keep[..., None], 1.0, 0.0).astype(x.dtype)  # (N, k, 1)
    # (N, k) scatter indices into (E, C)
    buf = buf.at[expert, pos_c].add(contrib * xf[:, None, :], mode="drop")

    # batched expert SwiGLU on the MXU
    w1 = moe_params["c_fc1"]["weight"].astype(x.dtype)
    w2 = moe_params["c_fc2"]["weight"].astype(x.dtype)
    wp = moe_params["c_proj"]["weight"].astype(x.dtype)
    h = jax.nn.silu(jnp.einsum("ecd,edh->ech", buf, w1)) * jnp.einsum(
        "ecd,edh->ech", buf, w2
    )
    y_e = jnp.einsum("ech,ehd->ecd", h, wp)  # (E, C, D)

    # combine: gather each assignment's expert output, weight by the gate
    y_tok = y_e[expert, pos_c]  # (N, k, D)
    w = (gate[..., None] * keep[..., None]).astype(x.dtype)
    y = jnp.sum(y_tok * w, axis=1)  # (N, D)
    return y.reshape(B, T, D), aux


# ---------------------------------------------------------------------------
# Full model forward
# ---------------------------------------------------------------------------

def moe_transformer_block(
    block_params: Params,
    x: jax.Array,
    rope: jax.Array,
    config: MoEConfig,
    kv_cache=None,
    input_pos=None,
    capacity: Optional[int] = None,
    prefill_attn: bool = False,
):
    """Pre-norm residual block with the MLP replaced by the sparse MoE."""
    h, new_cache = attention_block(
        block_params["attn"],
        rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps),
        rope,
        config,
        kv_cache,
        input_pos,
        prefill_attn=prefill_attn,
    )
    x = x + h
    y, aux = moe_mlp(
        block_params["moe"],
        rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps),
        config,
        capacity,
    )
    return x + y, new_cache, aux


@partial(jax.jit, static_argnames=("config", "remat"))
def forward_moe(
    params: Params,
    idx: jax.Array,
    config: MoEConfig,
    remat: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full-sequence forward. Returns ``(logits, aux)``; ``aux`` losses are
    averaged over layers — add ``aux_loss_coef·load_balance +
    router_z_coef·router_z`` to the task loss when training."""
    T = idx.shape[1]
    rope = _rope_for_positions(config, None, T)
    x = params["wte"]["weight"][idx]

    def body(x, block_params):
        x, _, aux = moe_transformer_block(block_params, x, rope, config)
        return x, aux

    if remat:
        body = jax.checkpoint(body)
    x, auxs = jax.lax.scan(body, x, params["blocks"])
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    logits = apply_linear(params["lm_head"], x)
    return logits, jax.tree.map(jnp.mean, auxs)


@partial(jax.jit, static_argnames=("config", "prefill_attn"))
def forward_moe_with_cache(
    params: Params,
    idx: jax.Array,
    input_pos: jax.Array,
    kv_cache,
    config: MoEConfig,
    prefill_attn: bool = False,
):
    """Incremental forward with KV cache (decode path). Same contract as
    `llama.forward_with_cache`; MoE capacity covers every token (decode batches
    are tiny — dropping would change outputs vs the full forward)."""
    rope = _rope_for_positions(config, input_pos, idx.shape[1])
    x = params["wte"]["weight"][idx]
    N = idx.shape[0] * idx.shape[1]
    cap = find_multiple(N * config.n_expert_active, 8)  # no drops at decode

    def body(x, layer_in):
        block_params, cache_l = layer_in
        x, cache_l, _ = moe_transformer_block(
            block_params, x, rope, config, kv_cache=cache_l, input_pos=input_pos,
            capacity=cap, prefill_attn=prefill_attn,
        )
        return x, cache_l

    x, new_cache = jax.lax.scan(body, x, (params["blocks"], kv_cache))
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    return apply_linear(params["lm_head"], x), new_cache


def make_moe_train_step(config: MoEConfig, optimizer, *, remat: bool = False):
    """Single-mesh MoE train step: plugs `forward_moe` + weighted aux losses
    into `train/step.make_train_step`, inheriting gradient accumulation and
    the dp/fsdp/tp shardings (expert leaves shard E over 'fsdp' and the hidden
    dim over 'tp' — `parallel/specs.PARAM_RULES`). For experts sharded over a
    dedicated 'ep' axis with all_to_all dispatch use
    `parallel/ep.make_moe_train_step_ep`."""
    from lit_llama_ja_tpu.train.step import make_train_step

    def fwd(p, x):
        logits, aux = forward_moe(p, x, config, remat=remat)
        penalty = (
            config.aux_loss_coef * aux["load_balance"]
            + config.router_z_coef * aux["router_z"]
        )
        return logits, penalty

    return make_train_step(config, optimizer, forward_fn=fwd)


def moe_loss(
    params: Params,
    batch_inputs: jax.Array,
    batch_targets: jax.Array,
    config: MoEConfig,
    remat: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Cross-entropy + weighted aux losses (the MoE train objective)."""
    logits, aux = forward_moe(params, batch_inputs, config, remat=remat)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, batch_targets[..., None], axis=-1)[..., 0]
    ce = jnp.mean(nll)
    total = (
        ce
        + config.aux_loss_coef * aux["load_balance"]
        + config.router_z_coef * aux["router_z"]
    )
    return total, {**aux, "ce": ce}
