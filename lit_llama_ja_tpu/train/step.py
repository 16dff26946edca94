"""Distributed train step (replaces Fabric/DeepSpeed/FSDP — SURVEY.md §2.3).

One jitted pure function does forward, backward, gradient accumulation, and the
optimizer update:

  * **FSDP/ZeRO equivalent** — parameters, gradients, and optimizer state all carry
    the same `parallel/specs.py` NamedShardings; XLA inserts the all-gathers /
    reduce-scatters and overlaps them with compute (what DeepSpeed's buckets +
    `overlap_comm` hand-tune, reference `pretrain/redpajama.py:112-125`).
  * **Gradient accumulation** — a `lax.scan` over the micro-batch axis inside the
    step; accumulation never syncs gradients (the `no_backward_sync` equivalent,
    reference `pretrain/redpajama.py:228-235`) because the collective only exists at
    the sharding boundary of the final update.
  * **PEFT** — an optional trainable-predicate partitions the param tree; gradients
    are only computed for the trainable subtree (stronger than the reference's
    `requires_grad=False`, which still allocates full backward graphs).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models import llama
from lit_llama_ja_tpu.parallel.specs import param_specs, path_of
from lit_llama_ja_tpu.train.loss import cross_entropy_loss


def make_adamw(
    schedule,
    weight_decay: float = 0.1,
    beta1: float = 0.9,
    beta2: float = 0.95,
    grad_clip: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """AdamW matching reference hyperparameters (`pretrain/redpajama.py:57-71`)."""
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=weight_decay))
    return optax.chain(*txs)


def partition_trainable(params, trainable_pred: Callable[[str], bool]):
    """Split a param tree into (trainable, frozen) trees of the same structure,
    with non-selected leaves set to None (dropped from grad computation)."""
    trainable = jax.tree_util.tree_map_with_path(
        lambda kp, p: p if trainable_pred(path_of(kp)) else None, params
    )
    frozen = jax.tree_util.tree_map_with_path(
        lambda kp, p: None if trainable_pred(path_of(kp)) else p, params
    )
    return trainable, frozen


def merge_trees(a, b):
    """Merge two same-structure trees where exactly one of (a, b) is None per leaf."""
    return jax.tree.map(
        lambda x, y: x if x is not None else y, a, b,
        is_leaf=lambda x: x is None,
    )


def make_train_step(
    config: LLaMAConfig,
    optimizer: optax.GradientTransformation,
    *,
    forward_fn: Optional[Callable] = None,
    trainable_pred: Optional[Callable[[str], bool]] = None,
    ignore_index: int = -1,
    compute_dtype=None,
    remat: bool = False,
):
    """Build ``train_step(params, opt_state, batch) -> (params, opt_state, loss)``.

    ``batch`` is ``(accum_steps, micro_bs, T+1)`` int32 — slot 0..T-1 are inputs,
    1..T targets (reference slicing at `pretrain/redpajama.py:225-226`).
    ``remat=True`` enables per-block activation checkpointing (see llama.forward).
    Wrap the returned function in `jax.jit` (see `jit_train_step`) or call it inside
    an outer pjit with mesh shardings.
    """
    fwd = forward_fn if forward_fn is not None else (
        lambda p, x: llama.forward(p, x, config, remat=remat)
    )

    def loss_of(params, micro):
        inputs = micro[:, :-1]
        targets = micro[:, 1:]
        p = params
        if compute_dtype is not None:
            p = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                p,
            )
        out = fwd(p, inputs)
        # forward_fn may return (logits, penalty) — e.g. MoE aux losses
        # (models/moe.make_moe_train_step); penalty is added to the CE loss.
        logits, penalty = out if isinstance(out, tuple) else (out, None)
        loss = cross_entropy_loss(logits, targets, ignore_index)
        return loss + penalty if penalty is not None else loss

    def train_step(params, opt_state, batch):
        if trainable_pred is not None:
            trainable, frozen = partition_trainable(params, trainable_pred)

            def loss_fn(t, micro):
                return loss_of(merge_trees(t, frozen), micro)

            work_params = trainable
        else:

            def loss_fn(t, micro):
                return loss_of(t, micro)

            work_params = params

        grad_fn = jax.value_and_grad(loss_fn)

        def accum_body(acc, micro):
            loss, grads = grad_fn(work_params, micro)
            acc_grads, acc_loss = acc
            return (
                jax.tree.map(jnp.add, acc_grads, grads),
                acc_loss + loss,
            ), None

        zero_grads = jax.tree.map(jnp.zeros_like, work_params)
        (grads, loss_sum), _ = jax.lax.scan(
            accum_body, (zero_grads, jnp.float32(0.0)), batch
        )
        n = batch.shape[0]
        grads = jax.tree.map(lambda g: g / n, grads)
        updates, opt_state = optimizer.update(grads, opt_state, work_params)
        new_work = optax.apply_updates(work_params, updates)
        if trainable_pred is not None:
            params = merge_trees(new_work, frozen)
        else:
            params = new_work
        return params, opt_state, loss_sum / n

    return train_step


def make_sft_train_step(
    config: LLaMAConfig,
    optimizer: optax.GradientTransformation,
    *,
    forward_fn: Optional[Callable] = None,
    trainable_pred: Optional[Callable[[str], bool]] = None,
    lora_dropout: float = 0.0,
):
    """Instruction-tuning step: batch is {"input_ids": (A, B, T), "labels": (A, B, T)}
    with labels already shifted-source (loss predicts labels[t+1] from inputs[..t],
    reference `finetune/lora.py:180-184`). Returns
    ``(params, opt_state, batch, rng) -> (params, opt_state, loss)``.
    """
    fwd = forward_fn

    def loss_of(params, micro, rng):
        inputs = micro["input_ids"]
        labels = micro["labels"]
        if fwd is not None:
            logits = fwd(params, inputs)
        else:
            logits = llama.forward(
                params, inputs, config, dropout_rng=rng, dropout_rate=lora_dropout
            )
        return cross_entropy_loss(logits[:, :-1], labels[:, 1:])

    def train_step(params, opt_state, batch, rng):
        if trainable_pred is not None:
            trainable, frozen = partition_trainable(params, trainable_pred)

            def loss_fn(t, micro, r):
                return loss_of(merge_trees(t, frozen), micro, r)

            work_params = trainable
        else:

            def loss_fn(t, micro, r):
                return loss_of(t, micro, r)

            work_params = params

        grad_fn = jax.value_and_grad(loss_fn)
        A = batch["input_ids"].shape[0]
        rngs = jax.random.split(rng, A)

        def accum_body(acc, xs):
            micro, r = xs
            loss, grads = grad_fn(work_params, micro, r)
            acc_grads, acc_loss = acc
            return (jax.tree.map(jnp.add, acc_grads, grads), acc_loss + loss), None

        zero_grads = jax.tree.map(jnp.zeros_like, work_params)
        (grads, loss_sum), _ = jax.lax.scan(
            accum_body, (zero_grads, jnp.float32(0.0)), (batch, rngs)
        )
        grads = jax.tree.map(lambda g: g / A, grads)
        updates, opt_state = optimizer.update(grads, opt_state, work_params)
        new_work = optax.apply_updates(work_params, updates)
        params = (
            merge_trees(new_work, frozen) if trainable_pred is not None else new_work
        )
        return params, opt_state, loss_sum / A

    return train_step


def init_opt_state(optimizer, params, trainable_pred=None):
    if trainable_pred is not None:
        trainable, _ = partition_trainable(params, trainable_pred)
        return optimizer.init(trainable)
    return optimizer.init(params)


def jit_train_step(train_step, mesh=None, params=None, n_extra_args=0):
    """jit the step with donated params/opt_state; if a mesh is given, constrain the
    parameter shardings to `parallel/specs.py` so the step runs FSDP/TP-sharded.

    ``n_extra_args`` appends unconstrained trailing arguments (e.g. the SFT
    step's dropout rng) after (params, opt_state, batch)."""
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1))
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert params is not None, "params needed to derive shardings"
    pshard = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_shard = NamedSharding(mesh, P(None, ("dp", "fsdp")))
    return jax.jit(
        train_step,
        donate_argnums=(0, 1),
        in_shardings=(pshard, None, batch_shard) + (None,) * n_extra_args,
        out_shardings=(pshard, None, None),
    )
