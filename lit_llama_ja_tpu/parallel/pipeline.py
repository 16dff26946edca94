"""Pipeline parallelism over the stacked layer axis.

The model keeps all transformer blocks stacked on a leading ``(L, ...)`` axis
(`models/llama.py` param layout) — that axis is the natural pipeline boundary:
stage ``s`` of a ``pp``-way pipeline owns layers ``[s·L/pp, (s+1)·L/pp)`` with NO
resharding of any weight (the per-stage tree is just the L-axis shard).

Schedule: GPipe inside one `shard_map` over the 'pp' mesh axis. The input batch
arrives pre-split into M microbatches; at tick ``t`` stage ``s`` processes
microbatch ``t − s`` (when in range) and hands its activations to stage ``s+1``
via a single point-to-point `ppermute` hop (ICI neighbor traffic, overlapped with
the next tick's compute by XLA's async collectives). Bubble fraction is the usual
``(pp−1)/(M+pp−1)`` — pick M ≥ 4·pp for >80% utilization.

Backward is derived, not hand-written: `jax.grad` through the unrolled schedule
transposes every `ppermute` into the reverse hop, yielding the reverse-time
pipeline automatically — the correctness-critical scheduling the reference
delegates to DeepSpeed never has to be written here. ``remat=True`` checkpoints
each stage body so only stage-boundary activations are stored per in-flight
microbatch.

The reference has no pipeline parallelism at all (SURVEY.md §2.3 "What the
reference does NOT have"); this is a new capability. Composition:

  * **dp** — the microbatch batch dim shards over 'dp' (specs below).
  * **tp** (``tp_axis=...``) — megatron-style in-stage tensor parallelism:
    qkv/fc1/fc2 column-parallel, out-projections row-parallel with a `psum`
    over 'tp' per sub-block. The fused qkv matrix is relayouted
    ``(L, D, 3D) → (L, D, 3, D)`` first (`relayout_qkv`) so a 'tp' shard of the
    last dim holds whole heads of each of q/k/v — sharding the packed 3D dim
    directly would split across the q|k|v concatenation boundaries. (The pjit
    TP path in `parallel/specs.py` does not need this: there the split is a
    global-array op and XLA owns the layout; inside shard_map the layout IS
    the semantics.)
  * 'fsdp' stays size-1 under pp in this schedule.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import transformer_block
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import build_rope_cache
from lit_llama_ja_tpu.parallel.specs import param_specs

# Pipeline sharding: blocks shard their leading L axis over 'pp'; everything
# else (embedding, head, final norm) is replicated.
PP_PARAM_RULES = (
    (r"^blocks/", P("pp")),
    (r".*", P()),
)

# pp×tp: additionally shard the in-block matrices megatron-style (columns for
# up-projections, rows for out-projections). Applies to the RELAYOUTED tree
# (c_attn (L, D, 3, D) — see `relayout_qkv`).
PP_TP_PARAM_RULES = (
    (r"blocks/attn/c_attn/weight$", P("pp", None, None, "tp")),
    (r"blocks/attn/c_proj/weight$", P("pp", "tp", None)),
    (r"blocks/mlp/c_fc[12]/weight$", P("pp", None, "tp")),
    (r"blocks/mlp/c_proj/weight$", P("pp", "tp", None)),
    (r"^blocks/", P("pp")),
    (r".*", P()),
)


def relayout_qkv(params: Any) -> Any:
    """Reshape the fused qkv weight (L, D, 3D) → (L, D, 3, D) so the last dim
    can shard over 'tp' without crossing the q|k|v packing boundaries."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy of containers
    w = params["blocks"]["attn"]["c_attn"]["weight"]
    L, D, threeD = w.shape
    params["blocks"]["attn"]["c_attn"] = {
        "weight": w.reshape(L, D, 3, threeD // 3)
    }
    return params


def pp_param_specs(params: Any, tp: bool = False) -> Any:
    return param_specs(params, rules=PP_TP_PARAM_RULES if tp else PP_PARAM_RULES)


def pp_param_shardings(params: Any, mesh: Mesh, tp: bool = False) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pp_param_specs(params, tp),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params_pp(params: Any, mesh: Mesh, tp: bool = False) -> Any:
    """Device-put onto the pipeline mesh. ``tp=True`` relayouts the qkv fusion
    and applies the pp×tp specs (pass the result to `pipeline_forward` with
    ``tp_axis``)."""
    if tp:
        params = relayout_qkv(params)
    return jax.device_put(params, pp_param_shardings(params, mesh, tp))


@partial(jax.jit, static_argnames=("config", "mesh", "axis", "remat", "tp_axis"))
def pipeline_forward(
    params: Any,
    idx: jax.Array,  # (M, mb, T) int32 — M microbatches
    config: LLaMAConfig,
    mesh: Mesh,
    axis: str = "pp",
    remat: bool = False,
    tp_axis: str = None,
) -> jax.Array:
    """GPipe forward; returns logits ``(M, mb, T, V)`` (pp-replicated, dp-sharded).

    Semantically identical to `models.llama.forward` over each microbatch (same
    weights, same math — parity-tested), with layers executed stage-by-stage
    around the ring. With ``tp_axis``, each stage additionally runs
    megatron-style tensor-parallel over that mesh axis (params must come from
    `shard_params_pp(..., tp=True)` — relayouted qkv).
    """
    S = mesh.shape[axis]
    M = idx.shape[0]
    L = config.n_layer
    assert L % S == 0, f"n_layer={L} not divisible by pp={S}"
    assert idx.shape[2] <= config.block_size
    if tp_axis is not None:
        assert config.n_head % mesh.shape[tp_axis] == 0
    rope = build_rope_cache(config.block_size, config.head_dim, config.rope_base)[
        : idx.shape[2]
    ]
    perm = [(i, i + 1) for i in range(S - 1)]
    dp_in_mesh = "dp" in mesh.axis_names

    pspecs = pp_param_specs(params, tp=tp_axis is not None)
    idx_spec = P(None, "dp" if dp_in_mesh else None, None)
    out_spec = P(None, "dp" if dp_in_mesh else None, None, None)

    def plain_stage(local_blocks, x):
        def body(x, bp):
            x, _ = transformer_block(bp, x, rope, config)
            return x, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, local_blocks)
        return x

    def tp_stage(local_blocks, x):
        """Megatron block on tp-local shards: column-parallel up-projections,
        row-parallel out-projections, one psum per sub-block."""
        from lit_llama_ja_tpu.ops.attention import causal_attention
        from lit_llama_ja_tpu.ops.rope import apply_rope

        hd = config.head_dim

        def body(x, bp):
            B_, T_, _ = x.shape
            h = rmsnorm(x, bp["rms_1"]["scale"], config.norm_eps)
            w_qkv = bp["attn"]["c_attn"]["weight"]  # (D, 3, Dloc)
            qkv = jnp.einsum("btd,dpe->btpe", h, w_qkv.astype(h.dtype))
            nh_loc = qkv.shape[-1] // hd
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = apply_rope(q.reshape(B_, T_, nh_loc, hd), rope).transpose(0, 2, 1, 3)
            k = apply_rope(k.reshape(B_, T_, nh_loc, hd), rope).transpose(0, 2, 1, 3)
            v = v.reshape(B_, T_, nh_loc, hd).transpose(0, 2, 1, 3)
            y = causal_attention(q, k, v)
            y = y.transpose(0, 2, 1, 3).reshape(B_, T_, nh_loc * hd)
            part = y @ bp["attn"]["c_proj"]["weight"].astype(y.dtype)  # (Dloc, D)
            x = x + jax.lax.psum(part, tp_axis)
            h2 = rmsnorm(x, bp["rms_2"]["scale"], config.norm_eps)
            u = jax.nn.silu(
                h2 @ bp["mlp"]["c_fc1"]["weight"].astype(h2.dtype)
            ) * (h2 @ bp["mlp"]["c_fc2"]["weight"].astype(h2.dtype))  # (B, T, Hloc)
            part2 = u @ bp["mlp"]["c_proj"]["weight"].astype(u.dtype)
            x = x + jax.lax.psum(part2, tp_axis)
            return x, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, local_blocks)
        return x

    stage = plain_stage if tp_axis is None else tp_stage

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, idx_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def inner(params, idx):
        s = jax.lax.axis_index(axis)
        emb = params["wte"]["weight"][idx]  # (M, mb_loc, T, D)
        buf = jnp.zeros(emb.shape[1:], emb.dtype)
        outs = []
        for t in range(M + S - 1):
            # stage 0 ingests microbatch t (clamped: past-end ticks are drained
            # pipeline, their stage-0 output is never collected)
            inp = jnp.where(s == 0, emb[min(t, M - 1)], buf)
            out = stage(params["blocks"], inp)
            if t >= S - 1:
                outs.append(out)  # microbatch t-(S-1), valid on the last stage
            if S > 1:
                buf = jax.lax.ppermute(out, axis, perm)
        y = jnp.stack(outs)  # (M, mb_loc, T, D)
        y = rmsnorm(y, params["ln_f"]["scale"], config.norm_eps)
        logits = y @ params["lm_head"]["weight"].astype(y.dtype)
        # only the last stage holds real outputs; broadcast around the ring
        logits = jnp.where(s == S - 1, logits, 0)
        return jax.lax.psum(logits, axis)

    return inner(params, idx)


def make_pp_train_step(
    config: LLaMAConfig,
    optimizer,
    mesh: Mesh,
    *,
    axis: str = "pp",
    remat: bool = False,
    ignore_index: int = -1,
    tp_axis: str = None,
):
    """Build a jitted pipeline-parallel train step.

    ``batch`` is ``(M, mb, T+1)`` int32 (same convention as
    `train/step.make_train_step`: positions 0..T-1 are inputs, 1..T targets);
    the M microbatches double as the pipeline's in-flight work AND gradient
    accumulation — one optimizer update per step, grads summed over microbatches
    by linearity of the loss mean.

    Returns ``train_step(params, opt_state, batch) -> (params, opt_state, loss)``
    (wrap params via `shard_params_pp` first).
    """
    from lit_llama_ja_tpu.train.loss import cross_entropy_loss

    def loss_fn(params, batch):
        inputs = batch[..., :-1]
        targets = batch[..., 1:]
        logits = pipeline_forward(
            params, inputs, config, mesh, axis, remat, tp_axis
        )
        M, mb, T, V = logits.shape
        return cross_entropy_loss(
            logits.reshape(M * mb, T, V), targets.reshape(M * mb, T), ignore_index
        )

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def jit_it(params):
        pshard = pp_param_shardings(params, mesh, tp=tp_axis is not None)
        dp = "dp" if "dp" in mesh.axis_names else None
        batch_shard = NamedSharding(mesh, P(None, dp, None))
        return jax.jit(
            train_step,
            donate_argnums=(0, 1),
            in_shardings=(pshard, None, batch_shard),
            out_shardings=(pshard, None, None),
        )

    train_step.jit_with = jit_it
    return train_step
