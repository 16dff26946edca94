"""Expert parallelism: MoE forward/train with experts sharded over an 'ep' axis.

Completes the parallel stack (dp/fsdp/tp/pp/sp → +ep). The reference has
nothing comparable (SURVEY.md §2.3 — no MoE, no expert parallelism); the
design here is the classic TPU MoE layout (GShard / Switch):

  * Tokens shard over 'ep' on the batch dim — each device runs attention for
    its local batch shard with replicated dense params (plain DP for the
    dense layers, zero communication).
  * Experts shard over 'ep' on the E axis of the stacked expert weights
    (``(L, E/ep, D, H)`` locally, owner-major: expert ``e`` lives on device
    ``e // E_local``).
  * Each device routes its local tokens into a full ``(E, C, D)`` dispatch
    buffer, then ONE `all_to_all` over 'ep' exchanges queue slices so each
    device holds ``(E_local, ep·C, D)`` — every token delivered to its
    expert's owner. After the batched expert einsum, a mirror all_to_all
    returns outputs to each token's home device for the gate-weighted
    combine. Both transfers ride ICI; every shape is static.

Routing decisions are local per device (capacity slots are claimed within the
device's own C-slice), so there is no global cumsum and no host sync. With
ample capacity the result equals the single-device `moe_mlp` up to reduction
order (parity-tested); under congestion drop patterns differ per shard,
exactly like multi-worker GShard.

Training differentiates THROUGH the shard_map'd forward (same pattern as
`parallel/pipeline.make_pp_train_step`): the all_to_all transposes to the
reverse all_to_all, delivering each expert shard its complete gradient, and
XLA's partitioner handles the replicated-param reductions — no manual psum
bookkeeping in user code.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lit_llama_ja_tpu.models.llama import (
    _rope_for_positions,
    apply_linear,
    attention_block,
)
from lit_llama_ja_tpu.models.moe import MoEConfig, finalize_aux, route_tokens
from lit_llama_ja_tpu.ops.norms import rmsnorm

Params = Dict[str, Any]

_EXPERT_LEAVES = ("c_fc1", "c_fc2", "c_proj")


# ---------------------------------------------------------------------------
# Sharding specs
# ---------------------------------------------------------------------------

def ep_param_specs(params: Params, axis: str = "ep") -> Any:
    """Expert leaves (blocks/moe/c_*) shard the E axis (dim 1, after the
    stacked L axis); the router and every dense leaf replicate."""

    def spec(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if "moe" in keys and any(k in _EXPERT_LEAVES for k in keys):
            return P(None, axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_ep(params: Params, mesh: Mesh, axis: str = "ep") -> Params:
    specs = ep_param_specs(params, axis)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )


# ---------------------------------------------------------------------------
# Sharded MoE MLP (runs inside shard_map)
# ---------------------------------------------------------------------------

def moe_mlp_ep(
    moe_params: Params,  # per-layer; expert leaves LOCAL: (E_local, D, H)...
    x: jax.Array,  # (B_local, T, D) — this device's token shard
    config: MoEConfig,
    axis: str,
    capacity: Optional[int] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Token-choice MoE with all_to_all dispatch/combine over ``axis``.

    ``capacity`` is the per-(source-device, expert) queue slice C (static);
    each expert processes up to ep·C tokens per step.
    """
    B, T, D = x.shape
    N = B * T  # local tokens
    k = config.n_expert_active
    E = config.n_expert
    ep = jax.lax.axis_size(axis)
    E_local = moe_params["c_fc1"]["weight"].shape[0]
    assert E_local * ep == E, (E_local, ep, E)
    C = capacity if capacity is not None else config.capacity(N)
    xf = x.reshape(N, D)

    gate, expert, pos, keep, stats = route_tokens(
        moe_params["router"]["weight"], xf, k, C
    )
    # pmean the f/P STATISTICS (not the finished losses) so load_balance is
    # the global token set's balance — identical to the unsharded value.
    stats = jax.tree.map(lambda v: jax.lax.pmean(v, axis), stats)
    aux = finalize_aux(stats)

    # local dispatch into the full per-expert queue (E, C, D)
    pos_c = jnp.where(keep, pos, C - 1)
    contrib = jnp.where(keep[..., None], 1.0, 0.0).astype(x.dtype)
    buf = jnp.zeros((E, C, D), x.dtype)
    buf = buf.at[expert, pos_c].add(contrib * xf[:, None, :], mode="drop")

    # exchange: device e receives buf_src[e] from every src
    # (ep·E_local, C, D) → (ep_src, E_local, C, D) → (E_local, ep·C, D)
    buf = buf.reshape(ep, E_local, C, D)
    buf = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=False)
    buf = buf.transpose(1, 0, 2, 3).reshape(E_local, ep * C, D)

    # batched expert SwiGLU on the MXU
    w1 = moe_params["c_fc1"]["weight"].astype(x.dtype)
    w2 = moe_params["c_fc2"]["weight"].astype(x.dtype)
    wp = moe_params["c_proj"]["weight"].astype(x.dtype)
    h = jax.nn.silu(jnp.einsum("ecd,edh->ech", buf, w1)) * jnp.einsum(
        "ecd,edh->ech", buf, w2
    )
    y_e = jnp.einsum("ech,ehd->ecd", h, wp)  # (E_local, ep·C, D)

    # mirror exchange back to each token's home device
    y_e = y_e.reshape(E_local, ep, C, D)
    y_e = jax.lax.all_to_all(y_e, axis, split_axis=1, concat_axis=1, tiled=False)
    y_e = y_e.transpose(1, 0, 2, 3).reshape(E, C, D)  # owner-major == expert id

    y_tok = y_e[expert, pos_c]  # (N, k, D)
    w = (gate[..., None] * keep[..., None]).astype(x.dtype)
    y = jnp.sum(y_tok * w, axis=1)
    return y.reshape(B, T, D), aux


def _moe_block_chain_ep(params, x, rope, config, axis, capacity):
    """Scan over layers: dense attention + ep-sharded MoE MLP per block."""

    def body(x, block_params):
        h, _ = attention_block(
            block_params["attn"],
            rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps),
            rope,
            config,
        )
        x = x + h
        y, aux = moe_mlp_ep(
            block_params["moe"],
            rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps),
            config,
            axis,
            capacity,
        )
        return x + y, aux

    x, auxs = jax.lax.scan(body, x, params["blocks"])
    return x, jax.tree.map(jnp.mean, auxs)


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------

def make_forward_moe_ep(
    config: MoEConfig,
    mesh: Mesh,
    params_proto: Params,
    *,
    axis: str = "ep",
    capacity: Optional[int] = None,
    remat: bool = False,
):
    """Build ``forward(params, idx (B, T)) -> (logits (B, T, V), aux)`` with
    the batch and experts sharded over ``axis``. ``params_proto`` fixes the
    tree structure for the specs (any placement); place real params with
    `shard_params_ep`. ``B`` must be divisible by the axis size."""
    specs = ep_param_specs(params_proto, axis)

    def inner(params, idx):
        T = idx.shape[1]
        rope = _rope_for_positions(config, None, T)
        x = params["wte"]["weight"][idx]
        body = partial(
            _moe_block_chain_ep, config=config, axis=axis, capacity=capacity
        )
        if remat:
            body = jax.checkpoint(body)
        x, aux = body(params, x, rope)
        x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
        return apply_linear(params["lm_head"], x), aux

    sm = shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sm)


_FWD_EP_CACHE: Dict[tuple, Any] = {}


def forward_moe_ep(
    params: Params,
    idx: jax.Array,
    config: MoEConfig,
    mesh: Mesh,
    axis: str = "ep",
    capacity: Optional[int] = None,
):
    """Convenience wrapper over `make_forward_moe_ep`.

    The built jit(shard_map(...)) is cached on (config, mesh, axis, capacity,
    param tree structure) so repeated calls don't pay a retrace/compile; for
    hot loops prefer holding the result of `make_forward_moe_ep` directly."""
    key = (config, mesh, axis, capacity, jax.tree.structure(params))
    fwd = _FWD_EP_CACHE.get(key)
    if fwd is None:
        fwd = make_forward_moe_ep(config, mesh, params, axis=axis, capacity=capacity)
        _FWD_EP_CACHE[key] = fwd
    return fwd(params, idx)


def make_moe_train_step_ep(
    config: MoEConfig,
    optimizer,
    mesh: Mesh,
    *,
    axis: str = "ep",
    capacity: Optional[int] = None,
    remat: bool = False,
):
    """Sharded MoE train step: CE + aux losses differentiate through the
    shard_map'd forward; optimizer state inherits the param shardings leaf-
    wise (optax moments mirror the tree). Call ``.jit_with(params)`` to bind
    the structure, then ``step(params, opt_state, batch (B, T+1))``."""

    def train_step_builder(params_proto):
        fwd = make_forward_moe_ep(
            config, mesh, params_proto, axis=axis, capacity=capacity, remat=remat
        )

        def loss_fn(params, batch):
            inputs, targets = batch[:, :-1], batch[:, 1:]
            logits, aux = fwd(params, inputs)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
            ce = jnp.mean(nll)
            return (
                ce
                + config.aux_loss_coef * aux["load_balance"]
                + config.router_z_coef * aux["router_z"]
            )

        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        pshard = jax.tree.map(
            lambda s: NamedSharding(mesh, s), ep_param_specs(params_proto, axis),
            is_leaf=lambda t: isinstance(t, P),
        )
        batch_shard = NamedSharding(mesh, P(axis))
        return jax.jit(
            train_step,
            donate_argnums=(0, 1),
            in_shardings=(pshard, None, batch_shard),
            out_shardings=(pshard, None, None),
        )

    class _Builder:
        jit_with = staticmethod(train_step_builder)

    return _Builder()
