"""Training step tests: loss math, LR schedule parity, optimization progress,
PEFT partitioning, and the sharded step on the simulated mesh."""
import math

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.specs import shard_params
from lit_llama_ja_tpu.train.loss import cross_entropy_loss
from lit_llama_ja_tpu.train.lr import cosine_with_warmup
from lit_llama_ja_tpu.train.step import (
    init_opt_state,
    jit_train_step,
    make_adamw,
    make_train_step,
    partition_trainable,
)

CFG = LLaMAConfig(block_size=16, vocab_size=32, n_layer=1, n_head=2, n_embd=16)


def ref_get_lr(it, learning_rate, warmup_iters, lr_decay_iters, min_lr):
    """Reference LR formula (`pretrain/redpajama.py:382-393`) re-stated."""
    if it < warmup_iters:
        return learning_rate * it / warmup_iters
    if it > lr_decay_iters:
        return min_lr
    decay_ratio = (it - warmup_iters) / (lr_decay_iters - warmup_iters)
    coeff = 0.5 * (1.0 + math.cos(math.pi * decay_ratio))
    return min_lr + coeff * (learning_rate - min_lr)


def test_lr_schedule_matches_reference():
    sched = cosine_with_warmup(6e-4, 100, 1000, 6e-5)
    for it in [0, 1, 50, 100, 101, 500, 999, 1000, 1001, 5000]:
        want = ref_get_lr(it, 6e-4, 100, 1000, 6e-5)
        np.testing.assert_allclose(float(sched(it)), want, rtol=1e-6)


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((1, 4, 8))
    targets = jnp.array([[1, 2, -1, -1]])
    loss = cross_entropy_loss(logits, targets)
    np.testing.assert_allclose(float(loss), math.log(8), rtol=1e-6)


def test_train_step_reduces_loss(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    opt = make_adamw(1e-2, weight_decay=0.0)
    step = jax.jit(make_train_step(CFG, opt))
    opt_state = init_opt_state(opt, params)
    batch = jnp.asarray(
        rng.integers(0, CFG.vocab_size, size=(2, 2, 9)), jnp.int32
    )  # (accum, micro_bs, T+1)
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_partition_trainable_updates_only_selected(rng):
    params = init_params(jax.random.PRNGKey(1), CFG)
    pred = lambda path: "c_attn" in path
    trainable, frozen = partition_trainable(params, pred)
    assert trainable["blocks"]["attn"]["c_attn"]["weight"] is not None
    assert trainable["blocks"]["mlp"]["c_fc1"]["weight"] is None
    assert frozen["blocks"]["attn"]["c_attn"]["weight"] is None

    opt = make_adamw(1e-2, weight_decay=0.0)
    step = jax.jit(make_train_step(CFG, opt, trainable_pred=pred))
    opt_state = init_opt_state(opt, params, trainable_pred=pred)
    batch = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 2, 9)), jnp.int32)
    before = jax.tree.map(np.asarray, params)
    params2, _, _ = step(params, opt_state, batch)
    # only c_attn changed
    assert not np.allclose(
        before["blocks"]["attn"]["c_attn"]["weight"],
        params2["blocks"]["attn"]["c_attn"]["weight"],
    )
    np.testing.assert_array_equal(
        before["blocks"]["mlp"]["c_fc1"]["weight"],
        params2["blocks"]["mlp"]["c_fc1"]["weight"],
    )
    np.testing.assert_array_equal(
        before["wte"]["weight"], params2["wte"]["weight"]
    )


def test_sharded_train_step_matches_unsharded(rng):
    params = init_params(jax.random.PRNGKey(2), CFG)
    opt = make_adamw(1e-3, weight_decay=0.0)
    batch = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 4, 9)), jnp.int32)

    step = make_train_step(CFG, opt)
    opt_state = init_opt_state(opt, params)
    _, _, loss_ref = jax.jit(step)(
        jax.tree.map(jnp.copy, params), opt_state, batch
    )

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sharded = shard_params(params, mesh)
    sstep = jit_train_step(step, mesh=mesh, params=params)
    opt_state2 = init_opt_state(opt, sharded)
    _, _, loss_sharded = sstep(sharded, opt_state2, batch)
    np.testing.assert_allclose(float(loss_ref), float(loss_sharded), atol=1e-5)


@pytest.mark.parametrize("variant", ["full", "lora", "adapter"])
def test_sharded_sft_step_matches_unsharded(rng, variant):
    """Mesh-sharded SFT step (dp×fsdp×tp, the reference's FSDP/ZeRO-2
    finetuning capability: `finetune/full.py:57-58`, `finetune/adapter.py:55-59`)
    produces the same loss AND updated params as the single-device step — for
    full, LoRA (trainable-subset partition + lora tree sharding) and adapter
    (custom forward_fn) variants."""
    from lit_llama_ja_tpu.train.step import make_sft_train_step

    params = init_params(jax.random.PRNGKey(3), CFG)
    trainable_pred = None
    forward_fn = None
    cfg = CFG
    if variant == "lora":
        from lit_llama_ja_tpu.models import lora as lora_mod

        lp = lora_mod.init_lora_params(jax.random.PRNGKey(4), CFG, r=2, alpha=4)
        params = lora_mod.add_lora(params, lp)
        trainable_pred = lora_mod.lora_trainable
    elif variant == "adapter":
        import dataclasses

        from lit_llama_ja_tpu.models import adapter as adapter_mod

        acfg = adapter_mod.AdapterConfig(
            **{f.name: getattr(CFG, f.name) for f in dataclasses.fields(CFG)}
        )
        ap = adapter_mod.init_adapter_params(jax.random.PRNGKey(4), acfg)
        params = adapter_mod.add_adapter(params, ap)
        trainable_pred = adapter_mod.adapter_trainable
        cfg = acfg
        forward_fn = lambda p, x: adapter_mod.adapter_forward(p, x, acfg)

    opt = make_adamw(1e-2, weight_decay=0.0)
    step = make_sft_train_step(
        cfg, opt, forward_fn=forward_fn, trainable_pred=trainable_pred
    )
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 4, 9)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 4, 9)), jnp.int32),
    }
    key = jax.random.PRNGKey(7)

    opt_state = init_opt_state(opt, params, trainable_pred=trainable_pred)
    ref_p, _, ref_loss = jax.jit(step)(
        jax.tree.map(jnp.copy, params), opt_state, batch, key
    )

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sharded = shard_params(params, mesh)
    sstep = jit_train_step(step, mesh=mesh, params=params, n_extra_args=1)
    opt_state2 = init_opt_state(opt, sharded, trainable_pred=trainable_pred)
    new_p, _, loss_sharded = sstep(sharded, opt_state2, batch, key)

    np.testing.assert_allclose(float(ref_loss), float(loss_sharded), atol=1e-5)
    flat_ref = jax.tree.leaves_with_path(ref_p)
    flat_new = dict(
        (jax.tree_util.keystr(kp), v) for kp, v in jax.tree.leaves_with_path(new_p)
    )
    for kp, a in flat_ref:
        b = flat_new[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(kp),
        )


def test_train_state_checkpoint_resume_exact(tmp_path, rng):
    """Train 6 steps straight vs train 3 + full-state save/load + 3 more:
    identical parameters (optimizer moments included — the reference's restart
    loses them)."""
    import optax

    from lit_llama_ja_tpu.io.checkpoint import load_train_state, save_train_state

    cfg = LLaMAConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2, n_embd=16)
    opt = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.1)
    step = jax.jit(make_train_step(cfg, opt))
    batches = [
        jnp.asarray(rng.integers(0, 64, (1, 2, 17)), jnp.int32) for _ in range(6)
    ]

    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    for b in batches:
        params, opt_state, _ = step(params, opt_state, b)
    want = params

    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    for b in batches[:3]:
        params, opt_state, _ = step(params, opt_state, b)
    save_train_state(
        tmp_path / "state", params, opt_state, cfg, meta={"iter": 2}
    )
    # fresh process simulation: templates from scratch
    p0 = init_params(jax.random.PRNGKey(0), cfg)
    params2, opt_state2, cfg2, meta = load_train_state(
        tmp_path / "state", params_template=p0, opt_state_template=opt.init(p0)
    )
    assert meta["iter"] == 2 and cfg2.n_embd == cfg.n_embd
    for b in batches[3:]:
        params2, opt_state2, _ = step(params2, opt_state2, b)
    for pa, pb in zip(jax.tree.leaves(want), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-7)


def test_train_loop_aborts_on_nan():
    from lit_llama_ja_tpu.train.trainer import TrainLoopConfig, train_loop

    def bad_step(params, opt_state, batch):
        return params, opt_state, float("nan")

    def batches():
        while True:
            yield np.zeros((2, 17), np.int64)

    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train_loop(
            bad_step, {}, {}, batches(),
            TrainLoopConfig(max_iters=3, grad_accum_steps=1, log_interval=100),
        )
