"""LoRA tests (reference analogue: `tests/test_lora.py`)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward, init_params
from lit_llama_ja_tpu.models.lora import (
    add_lora,
    extract_lora,
    init_lora_params,
    lora_trainable,
    merge_lora,
    strip_lora,
)
from lit_llama_ja_tpu.train.step import init_opt_state, make_adamw, make_train_step

CFG = LLaMAConfig(block_size=16, vocab_size=32, n_layer=2, n_head=2, n_embd=16)


def test_lora_zero_init_is_identity(rng):
    """With B=0 the LoRA model must produce the base model's exact outputs."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, r=2, alpha=4)
    lparams = add_lora(params, lora)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = forward(params, idx, CFG)
    with_lora = forward(lparams, idx, CFG)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_merge_matches_unmerged_forward(rng):
    """merged(W + ΔW) forward == unmerged (W plus low-rank branch) forward
    (reference merge semantics, lora.py:268-278)."""
    params = init_params(jax.random.PRNGKey(2), CFG)
    lora = init_lora_params(jax.random.PRNGKey(3), CFG, r=2, alpha=4)
    # give B nonzero values so the branch actually does something
    lora["lora_B"] = jax.random.normal(jax.random.PRNGKey(4), lora["lora_B"].shape) * 0.1
    lparams = add_lora(params, lora)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    unmerged = forward(lparams, idx, CFG)
    merged = merge_lora(lparams)
    assert "lora_A" not in merged["blocks"]["attn"]["c_attn"]
    merged_out = forward(merged, idx, CFG)
    np.testing.assert_allclose(
        np.asarray(unmerged), np.asarray(merged_out), atol=1e-4
    )


def test_lora_only_touches_q_and_v(rng):
    """enable_lora=[True, False, True]: the k-section of ΔW must be zero
    (reference zero_pad scatter, lora.py:203-239)."""
    params = init_params(jax.random.PRNGKey(5), CFG)
    lora = init_lora_params(jax.random.PRNGKey(6), CFG, r=2, alpha=2)
    lora["lora_B"] = jnp.ones_like(lora["lora_B"])
    lparams = add_lora(params, lora)
    merged = merge_lora(lparams)
    D = CFG.n_embd
    delta = np.asarray(
        merged["blocks"]["attn"]["c_attn"]["weight"]
        - params["blocks"]["attn"]["c_attn"]["weight"]
    )
    assert np.abs(delta[:, :, :D]).max() > 0  # q section changed
    np.testing.assert_array_equal(delta[:, :, D : 2 * D], 0)  # k untouched
    assert np.abs(delta[:, :, 2 * D :]).max() > 0  # v section changed


def test_extract_and_reapply_lora_state(rng):
    """LoRA-only checkpointing round-trip (reference `lora_state_dict` +
    two-pass strict=False load, `generate/lora.py:75-77`)."""
    params = init_params(jax.random.PRNGKey(7), CFG)
    lora = init_lora_params(jax.random.PRNGKey(8), CFG, r=2, alpha=4)
    lora["lora_B"] = jnp.full_like(lora["lora_B"], 0.3)
    lparams = add_lora(params, lora)
    state = extract_lora(lparams)
    assert set(state) == {"lora_A", "lora_B", "lora_alpha"}
    # rebuild from base + extracted state
    rebuilt = add_lora(strip_lora(lparams), state)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 6)), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(forward(lparams, idx, CFG)),
        np.asarray(forward(rebuilt, idx, CFG)),
        atol=1e-6,
    )


def test_lora_training_updates_only_lora(rng):
    params = init_params(jax.random.PRNGKey(9), CFG)
    lora = init_lora_params(jax.random.PRNGKey(10), CFG, r=2, alpha=4)
    lparams = add_lora(params, lora)
    opt = make_adamw(1e-2, weight_decay=0.0)
    step = jax.jit(make_train_step(CFG, opt, trainable_pred=lora_trainable))
    opt_state = init_opt_state(opt, lparams, trainable_pred=lora_trainable)
    batch = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 2, 9)), jnp.int32)
    before = jax.tree.map(np.asarray, lparams)
    after, _, loss = step(lparams, opt_state, batch)
    c = "blocks", "attn", "c_attn"
    assert not np.allclose(
        before[c[0]][c[1]][c[2]]["lora_B"], after[c[0]][c[1]][c[2]]["lora_B"]
    )
    np.testing.assert_array_equal(
        before[c[0]][c[1]][c[2]]["weight"], after[c[0]][c[1]][c[2]]["weight"]
    )
    np.testing.assert_array_equal(before["wte"]["weight"], after["wte"]["weight"])


def test_lora_dropout_deterministic_without_rng(rng):
    params = init_params(jax.random.PRNGKey(11), CFG)
    lora = init_lora_params(jax.random.PRNGKey(12), CFG, r=2, alpha=4)
    lora["lora_B"] = jnp.full_like(lora["lora_B"], 0.2)
    lparams = add_lora(params, lora)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    a = forward(lparams, idx, CFG)
    b = forward(lparams, idx, CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # with an rng and a high rate, output changes
    c = forward(lparams, idx, CFG, jax.random.PRNGKey(0), 0.5)
    assert not np.allclose(np.asarray(a), np.asarray(c))
