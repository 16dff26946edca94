"""Finetuning CLIs: full / LoRA / Adapter v1 / Adapter v2
(reference `finetune/{full,lora,adapter,adapter_v2}.py`).

All four share one driver; they differ only in (a) which params are trainable,
(b) which forward runs, (c) what the checkpoint contains (full weights vs
PEFT-only state). Hyperparameter defaults mirror the reference scripts.
"""
from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _load_base(pretrained_path: str):
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any

    return load_model_any(Path(pretrained_path))


def _finetune_driver(
    *,
    data_dir: str,
    pretrained_path: str,
    out_dir: str,
    variant: str,  # "full" | "lora" | "adapter" | "adapter_v2"
    learning_rate: float,
    weight_decay: float,
    micro_batch_size: int,
    batch_size: int,
    max_iters: int,
    warmup_iters: int,
    max_seq_length: int = 256,
    eval_interval: int = 100,
    save_interval: int = 100,
    eval_iters: int = 100,
    log_interval: int = 10,
    lora_r: int = 8,
    lora_alpha: int = 16,
    lora_dropout: float = 0.05,
    seed: int = 1337,
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
):
    import optax

    from lit_llama_ja_tpu.data.sft import load_sft_dataset, sft_batches
    from lit_llama_ja_tpu.io.checkpoint import save_checkpoint, save_state_npz
    from lit_llama_ja_tpu.models import adapter as adapter_mod
    from lit_llama_ja_tpu.models import lora as lora_mod
    from lit_llama_ja_tpu.train.lr import cosine_with_warmup
    from lit_llama_ja_tpu.train.step import (
        init_opt_state,
        jit_train_step,
        make_adamw,
        make_sft_train_step,
    )
    from lit_llama_ja_tpu.train.loss import cross_entropy_loss

    params, config = _load_base(pretrained_path)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    trainable_pred: Optional[Callable] = None
    forward_fn = None
    extract_state = None
    dropout = 0.0

    if variant == "lora":
        lparams = lora_mod.init_lora_params(
            jax.random.PRNGKey(seed), config, r=lora_r, alpha=lora_alpha
        )
        params = lora_mod.add_lora(params, lparams)
        trainable_pred = lora_mod.lora_trainable
        extract_state = lora_mod.extract_lora
        dropout = lora_dropout
    elif variant in ("adapter", "adapter_v2"):
        acfg = adapter_mod.AdapterConfig(
            **{f.name: getattr(config, f.name) for f in dataclasses.fields(config)}
        )
        aparams = adapter_mod.init_adapter_params(jax.random.PRNGKey(seed), acfg)
        params = adapter_mod.add_adapter(params, aparams)
        if variant == "adapter_v2":
            params = adapter_mod.add_adapter_v2(params)
            trainable_pred = adapter_mod.adapter_v2_trainable
            extract_state = adapter_mod.extract_adapter_v2_state
        else:
            trainable_pred = adapter_mod.adapter_trainable
            extract_state = adapter_mod.extract_adapter_state
        config = acfg
        forward_fn = lambda p, x: adapter_mod.adapter_forward(p, x, config)

    # mesh-sharded finetuning (reference: FSDP on finetune/full.py:57-58,
    # DeepSpeed ZeRO-2 on finetune/adapter.py:55-59 — both collapse into the
    # ('dp','fsdp','tp') mesh + parallel/specs.py shardings, PEFT trees included)
    mesh = None
    if (dp, fsdp, tp) != (1, 1, 1):
        from lit_llama_ja_tpu.parallel.mesh import make_mesh
        from lit_llama_ja_tpu.parallel.specs import shard_params

        mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        data_ways = mesh.shape["dp"] * mesh.shape["fsdp"]
        assert micro_batch_size % data_ways == 0, (
            f"micro_batch_size={micro_batch_size} must divide over dp*fsdp={data_ways}"
        )
        params = shard_params(params, mesh)

    grad_accum = max(batch_size // micro_batch_size, 1)
    schedule = cosine_with_warmup(learning_rate, warmup_iters, max_iters, learning_rate / 10)
    opt = make_adamw(schedule, weight_decay=weight_decay)
    base_step = make_sft_train_step(
        config, opt,
        forward_fn=forward_fn,
        trainable_pred=trainable_pred,
        lora_dropout=dropout,
    )
    step = jit_train_step(base_step, mesh=mesh, params=params, n_extra_args=1)
    opt_state = init_opt_state(opt, params, trainable_pred=trainable_pred)

    train_data = load_sft_dataset(Path(data_dir) / "train.pt")
    val_data = load_sft_dataset(Path(data_dir) / "test.pt")
    batches = sft_batches(train_data, micro_batch_size, max_seq_length, seed=seed)

    if forward_fn is None:
        from lit_llama_ja_tpu.models import llama

        eval_fwd = lambda p, x: llama.forward(p, x, config)
    else:
        eval_fwd = forward_fn

    @jax.jit
    def val_loss_fn(params, x, y):
        logits = eval_fwd(params, x)
        return cross_entropy_loss(logits[:, :-1], y[:, 1:])

    def validate(params) -> float:
        vb = sft_batches(val_data, micro_batch_size, max_seq_length, seed=seed + 1)
        losses = [
            float(val_loss_fn(params, jnp.asarray(b["input_ids"]), jnp.asarray(b["labels"])))
            for b, _ in zip(vb, range(min(eval_iters, 20)))
        ]
        return float(np.mean(losses))

    def save(params, iter_num):
        if extract_state is not None:
            save_state_npz(out / f"iter-{iter_num:06d}.npz", extract_state(params))
        else:
            save_checkpoint(out / f"iter-{iter_num:06d}", params, config)

    rng = jax.random.PRNGKey(seed)
    step_count = 0
    for iter_num in range(max_iters):
        micro = [next(batches) for _ in range(grad_accum)]
        batch = {
            "input_ids": jnp.asarray(np.stack([m["input_ids"] for m in micro])),
            "labels": jnp.asarray(np.stack([m["labels"] for m in micro])),
        }
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, batch, sub)
        loss = float(loss)
        dt = time.time() - t0
        step_count += 1
        if iter_num % log_interval == 0:
            print(f"iter {iter_num}: loss {loss:.4f}, time: {dt*1000:.2f}ms")
        if step_count % eval_interval == 0:
            print(f"step {iter_num}: val loss {validate(params):.4f}")
        if step_count % save_interval == 0:
            print(f"Saving {variant} weights to {out}")
            save(params, iter_num)
    save(params, max_iters)
    return params


def main_full(
    data_dir: str = "data/alpaca",
    pretrained_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    out_dir: str = "out/full/alpaca",
    max_iters: int = 12500,  # reference finetune/full.py epoch math
    micro_batch_size: int = 4,
    batch_size: int = 128,
    learning_rate: float = 3e-5,
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
):
    """Full finetuning on an instruction dataset (reference `finetune/full.py`)."""
    return _finetune_driver(
        data_dir=data_dir, pretrained_path=pretrained_path, out_dir=out_dir,
        variant="full", learning_rate=learning_rate, weight_decay=0.02,
        micro_batch_size=micro_batch_size, batch_size=batch_size,
        max_iters=max_iters, warmup_iters=100,
        dp=dp, fsdp=fsdp, tp=tp,
    )


def main_lora(
    data_dir: str = "data/alpaca",
    pretrained_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    out_dir: str = "out/lora/alpaca",
    max_iters: int = 37500,  # 50000 * 3 // micro_batch_size (reference)
    micro_batch_size: int = 4,
    batch_size: int = 128,
    learning_rate: float = 3e-4,
    lora_r: int = 8,
    lora_alpha: int = 16,
    lora_dropout: float = 0.05,
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
):
    """LoRA finetuning (reference `finetune/lora.py:27-46` hyperparameters)."""
    return _finetune_driver(
        data_dir=data_dir, pretrained_path=pretrained_path, out_dir=out_dir,
        variant="lora", learning_rate=learning_rate, weight_decay=0.0,
        micro_batch_size=micro_batch_size, batch_size=batch_size,
        max_iters=max_iters, warmup_iters=100,
        lora_r=lora_r, lora_alpha=lora_alpha, lora_dropout=lora_dropout,
        dp=dp, fsdp=fsdp, tp=tp,
    )


def main_adapter(
    data_dir: str = "data/alpaca",
    pretrained_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    out_dir: str = "out/adapter/alpaca",
    max_iters: int = 9 * 12500,
    micro_batch_size: int = 4,
    batch_size: int = 64,
    learning_rate: float = 9e-3,
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
):
    """Adapter v1 finetuning (reference `finetune/adapter.py`)."""
    return _finetune_driver(
        data_dir=data_dir, pretrained_path=pretrained_path, out_dir=out_dir,
        variant="adapter", learning_rate=learning_rate, weight_decay=0.02,
        micro_batch_size=micro_batch_size, batch_size=batch_size,
        max_iters=max_iters, warmup_iters=2 * (64 // 4),
        dp=dp, fsdp=fsdp, tp=tp,
    )


def main_adapter_v2(
    data_dir: str = "data/alpaca",
    pretrained_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    out_dir: str = "out/adapter_v2/alpaca",
    max_iters: int = 9 * 12500,
    micro_batch_size: int = 4,
    batch_size: int = 64,
    learning_rate: float = 9e-3,
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
):
    """Adapter v2 finetuning (reference `finetune/adapter_v2.py`)."""
    return _finetune_driver(
        data_dir=data_dir, pretrained_path=pretrained_path, out_dir=out_dir,
        variant="adapter_v2", learning_rate=learning_rate, weight_decay=0.02,
        micro_batch_size=micro_batch_size, batch_size=batch_size,
        max_iters=max_iters, warmup_iters=2 * (64 // 4),
        dp=dp, fsdp=fsdp, tp=tp,
    )
