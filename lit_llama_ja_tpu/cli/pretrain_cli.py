"""Pretraining CLI (reference `pretrain/redpajama.py`, `pretrain/shakespeare.py`).

The Fabric/DeepSpeed strategy block of the reference becomes a mesh spec: the same
script runs 1-chip or sharded (dp/fsdp/tp) by passing mesh dims.
"""
from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# data mixture configs (reference `pretrain/redpajama.py:84-95`, ja fork)
train_data_config = [
    ("wikipedia-ja-20230720", 1.0),
    ("wikipedia-en-20230720", 1.0),
    ("open-text-books", 1.0),
    ("oscar_2023_filtered", 1.0),
    ("aozorabunko-clean-sin", 1.0),
]
val_data_config = [
    ("wikinews-ja-20230728", 1.0),
    ("wikinews-en-20230728", 1.0),
]


def create_dataset(
    data_dir: str,
    data_config,
    block_size: int,
    num_processes: int = 1,
    process_rank: int = 0,
    seed: int = 12345,
    shuffle: bool = True,
):
    from lit_llama_ja_tpu.data.packed_dataset import CombinedDataset, PackedDataset

    datasets = []
    for prefix, _ in data_config:
        filenames = sorted(glob.glob(os.path.join(data_dir, prefix + "*")))
        if not filenames:
            continue
        datasets.append(
            PackedDataset(
                filenames, n_chunks=max(len(filenames), 1), block_size=block_size,
                shuffle=shuffle, seed=seed, wrap=True,
                num_processes=num_processes, process_rank=process_rank,
            )
        )
    if not datasets:
        raise RuntimeError(
            f"No data found at {data_dir}. Run scripts/prepare_redpajama.py or "
            "scripts/prepare_ja.py first."
        )
    weights = [w for _, w in data_config[: len(datasets)]]
    s = sum(weights)
    return CombinedDataset(datasets, seed=seed, weights=[w / s for w in weights])


def main(
    train_data_dir: str = "data/lit-redpajama",
    val_data_dir: Optional[str] = None,
    model_size: str = "7B",
    out_dir: str = "out/training",
    load_dir: Optional[str] = None,
    restart_iter: int = 0,
    resume: Optional[str] = None,
    learning_rate: float = 8e-4,
    weight_decay: float = 0.1,
    micro_batch_size: int = 4,
    batch_size: int = 128,
    max_iters: int = 143000,
    warmup_iters: int = 2000,
    grad_clip: float = 1.0,
    remat: bool = False,
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    save_interval: int = 100,
    eval_interval: int = 100,
    eval_iters: int = 100,
    log_interval: int = 500,
    seed: int = 1337,
    moe_experts: int = 0,
    moe_topk: int = 2,
    train_prefixes: Optional[str] = None,
    val_prefixes: Optional[str] = None,
) -> None:
    """Pretrain LLaMA on packed datasets (reference `pretrain/redpajama.py:97-189`).

    Distribution: a ('dp','fsdp','tp') mesh replaces DeepSpeed ZeRO-1/FSDP; pass the
    axis sizes (fsdp=-1 = all remaining devices).

    MoE (beyond the reference): ``--moe-experts E`` swaps the dense MLP for a
    top-``--moe-topk`` mixture of E experts per block (`models/moe.py`);
    expert weights shard E over 'fsdp' and the hidden dim over 'tp'. For a
    dedicated expert-parallel axis see `parallel/ep.py`.

    Resume: ``--resume <out_dir>/state-latest`` restores the FULL training state
    (params, optimizer moments, iteration, exact data position) — beyond the
    reference, whose restart reloads weights only. ``--load-dir``/``--restart-iter``
    keep the reference's weights-only restart semantics.
    """
    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.data.packed_dataset import batch_iterator
    from lit_llama_ja_tpu.io.checkpoint import (
        load_checkpoint,
        load_train_state,
        save_checkpoint,
        save_train_state,
    )
    from lit_llama_ja_tpu.models import llama
    from lit_llama_ja_tpu.parallel.mesh import make_mesh
    from lit_llama_ja_tpu.parallel.specs import shard_params
    from lit_llama_ja_tpu.train.lr import cosine_with_warmup
    from lit_llama_ja_tpu.train.step import (
        init_opt_state,
        jit_train_step,
        make_adamw,
        make_train_step,
    )
    from lit_llama_ja_tpu.train.trainer import TrainLoopConfig, make_validate_fn, train_loop

    from lit_llama_ja_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    # comma-separated chunk-file prefix overrides (equal mixture weights) for
    # corpora prepared outside the ja mixture, e.g. prepare_any_text --prefix;
    # kept local so an in-process main() call never inherits a previous run's mixture
    eff_train_config = (
        [(px.strip(), 1.0) for px in train_prefixes.split(",")]
        if train_prefixes else train_data_config
    )
    eff_val_config = (
        [(px.strip(), 1.0) for px in val_prefixes.split(",")]
        if val_prefixes else val_data_config
    )
    if moe_experts:
        from lit_llama_ja_tpu.models.moe import MoEConfig

        config = MoEConfig.from_name(
            model_size, n_expert=moe_experts, n_expert_active=moe_topk
        )
    else:
        config = LLaMAConfig.from_name(model_size)
    config.debug()
    os.makedirs(out_dir, exist_ok=True)

    mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    if load_dir:
        print(f"load from checkpoint... {load_dir}")
        params, _ = load_checkpoint(load_dir, template=None)
        params = jax.tree.map(jnp.asarray, params)
    elif moe_experts:
        from lit_llama_ja_tpu.models.moe import init_moe_params

        params = init_moe_params(jax.random.PRNGKey(seed), config)
    else:
        params = llama.init_params(jax.random.PRNGKey(seed), config)
    params = shard_params(params, mesh)

    schedule = cosine_with_warmup(
        learning_rate, warmup_iters, max_iters, learning_rate / 10
    )
    opt = make_adamw(schedule, weight_decay=weight_decay, grad_clip=grad_clip)
    opt_state = init_opt_state(opt, params)
    if resume:
        print(f"resuming full training state from {resume}")
        params, opt_state, _, meta = load_train_state(
            resume, params_template=params, opt_state_template=opt_state
        )
        restart_iter = int(meta.get("iter", -1)) + 1
        print(f"-> continuing from iter {restart_iter}")
    if moe_experts:
        from lit_llama_ja_tpu.models.moe import make_moe_train_step

        base_step = make_moe_train_step(config, opt, remat=remat)
    else:
        base_step = make_train_step(config, opt, remat=remat)
    step = jit_train_step(base_step, mesh=mesh, params=params)

    grad_accum = max(batch_size // mesh.devices.size // micro_batch_size, 1)
    # prefer the native C++ prefetching reader for single-source dirs; the Python
    # CombinedDataset handles weighted multi-source mixing
    batches = None
    single_source = [
        (p, w) for p, w in eff_train_config
        if glob.glob(os.path.join(train_data_dir, p + "*"))
    ]
    if len(single_source) == 1:
        try:
            from lit_llama_ja_tpu.data.native_loader import NativePackedBatches

            files = sorted(
                glob.glob(os.path.join(train_data_dir, single_source[0][0] + "*"))
            )
            batches = NativePackedBatches(
                files, micro_batch_size, config.block_size + 1,
                seed=seed + 1, wrap=True,
                # data-loader resume (beyond the reference, which reshuffles
                # from seed on restart): skip the already-consumed batches
                skip_batches=restart_iter * grad_accum,
            )
            print("using native C++ packed reader")
        except Exception as e:  # pragma: no cover - build env without g++
            print(f"native reader unavailable ({e}); using Python reader")
    if batches is None:
        train_ds = create_dataset(
            train_data_dir, eff_train_config, config.block_size + 1, seed=seed + 1
        )
        ds_iter = iter(train_ds)
        if restart_iter:
            ds_iter.fast_forward(restart_iter * grad_accum * micro_batch_size)
        batches = batch_iterator(ds_iter, micro_batch_size)

    validate_fn = None
    if val_data_dir:
        val_ds = create_dataset(
            val_data_dir, eff_val_config, config.block_size + 1,
            seed=seed + 2, shuffle=False,
        )
        validate_fn = make_validate_fn(
            config, eval_iters, lambda: batch_iterator(val_ds, micro_batch_size)
        )

    def save_fn(params, iter_num):
        save_checkpoint(Path(out_dir) / f"iter-{iter_num:06d}-ckpt", params, config)

    def save_state_fn(params, opt_state, iter_num):
        save_train_state(
            Path(out_dir) / "state-latest", params, opt_state, config,
            meta={"iter": iter_num},
        )

    loop_cfg = TrainLoopConfig(
        max_iters=max_iters, log_interval=log_interval,
        eval_interval=eval_interval, save_interval=save_interval,
        eval_iters=eval_iters, grad_accum_steps=grad_accum,
        micro_batch_size=micro_batch_size, block_size=config.block_size,
        out_dir=out_dir, metrics_file=str(Path(out_dir) / "metrics.jsonl"),
    )
    params, opt_state = train_loop(
        step, params, opt_state, batches, loop_cfg,
        lr_schedule=schedule, validate_fn=validate_fn, save_fn=save_fn,
        save_state_fn=save_state_fn, restart_iter=restart_iter,
    )
    print(f"Saving checkpoint to {out_dir}")
    save_checkpoint(Path(out_dir) / f"iter-{max_iters:06d}-ckpt", params, config)


def main_shakespeare(
    data_dir: str = "data/shakespeare",
    out_dir: str = "out/shakespeare",
    learning_rate: float = 3e-4,
    micro_batch_size: int = 8,
    max_iters: int = 2000,
    block_size: int = 256,
    n_layer: int = 4,
    n_head: int = 8,
    n_embd: int = 256,
    log_interval: int = 50,
    seed: int = 1337,
) -> None:
    """Shakespeare smoke pretrain (reference `pretrain/shakespeare.py`): memmap .bin
    random crops, tiny model, 100-token vocab."""
    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.io.checkpoint import save_checkpoint
    from lit_llama_ja_tpu.models import llama
    from lit_llama_ja_tpu.train.lr import cosine_with_warmup
    from lit_llama_ja_tpu.train.step import init_opt_state, make_adamw, make_train_step
    from lit_llama_ja_tpu.train.trainer import TrainLoopConfig, train_loop

    config = LLaMAConfig(
        block_size=block_size, vocab_size=100,
        n_layer=n_layer, n_head=n_head, n_embd=n_embd,
    )
    params = llama.init_params(jax.random.PRNGKey(seed), config)
    schedule = cosine_with_warmup(learning_rate, 100, max_iters, learning_rate / 10)
    opt = make_adamw(schedule, weight_decay=0.1)
    step = jax.jit(make_train_step(config, opt), donate_argnums=(0, 1))
    opt_state = init_opt_state(opt, params)

    train_data = np.memmap(
        os.path.join(data_dir, "train.bin"), dtype=np.uint16, mode="r"
    )

    def batches():
        rng = np.random.default_rng(seed)
        while True:
            ix = rng.integers(0, len(train_data) - block_size - 1, micro_batch_size)
            yield np.stack(
                [train_data[i : i + block_size + 1].astype(np.int64) for i in ix]
            )

    loop_cfg = TrainLoopConfig(
        max_iters=max_iters, log_interval=log_interval,
        eval_interval=10**9, save_interval=10**9,
        grad_accum_steps=1, micro_batch_size=micro_batch_size,
        block_size=block_size, out_dir=out_dir,
    )
    params, _ = train_loop(step, params, opt_state, batches(), loop_cfg,
                           lr_schedule=schedule)
    os.makedirs(out_dir, exist_ok=True)
    save_checkpoint(Path(out_dir) / "final", params, config)


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
