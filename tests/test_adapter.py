"""Adapter v1/v2 tests (reference analogues: `tests/test_adapter.py`,
`tests/test_adapter_v2.py`)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.models.adapter import (
    AdapterConfig,
    adapter_forward,
    adapter_forward_with_cache,
    adapter_trainable,
    adapter_v2_trainable,
    add_adapter,
    add_adapter_v2,
    extract_adapter_state,
    extract_adapter_v2_state,
    init_adapter_params,
)
from lit_llama_ja_tpu.models.llama import forward, init_kv_cache, init_params
from lit_llama_ja_tpu.train.step import init_opt_state, make_adamw, make_train_step

CFG = AdapterConfig(
    block_size=16, vocab_size=32, n_layer=3, n_head=2, n_embd=16,
    adapter_prompt_length=4, adapter_start_layer=1,
)


def make_adapter_model(seed=0):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    adapter = init_adapter_params(jax.random.PRNGKey(seed + 1), CFG)
    return params, add_adapter(params, adapter)


def test_zero_gating_matches_base(rng):
    """Zero-init gating => adapter model == base model exactly
    (the reference's zero-init design intent, adapter.py:75-77)."""
    params, aparams = make_adapter_model()
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(forward(params, idx, CFG)),
        np.asarray(adapter_forward(aparams, idx, CFG)),
        atol=1e-6,
    )


def test_nonzero_gating_changes_only_adapted_layers(rng):
    """With gates forced on, output changes; layers < start_layer see no prefix."""
    params, aparams = make_adapter_model()
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(adapter_forward(aparams, idx, CFG))
    g = aparams["blocks"]["adapter"]["gating_factor"]
    aparams["blocks"]["adapter"]["gating_factor"] = jnp.ones_like(g)
    changed = np.asarray(adapter_forward(aparams, idx, CFG))
    assert not np.allclose(base, changed)

    # a config adapting no layers must ignore the gates entirely
    cfg_off = AdapterConfig(
        block_size=16, vocab_size=32, n_layer=3, n_head=2, n_embd=16,
        adapter_prompt_length=4, adapter_start_layer=99,
    )
    off = np.asarray(adapter_forward(aparams, idx, cfg_off))
    np.testing.assert_allclose(off, base, atol=1e-6)


def test_adapter_cached_decode_matches_full(rng):
    params, aparams = make_adapter_model(seed=3)
    g = aparams["blocks"]["adapter"]["gating_factor"]
    aparams["blocks"]["adapter"]["gating_factor"] = jnp.full_like(g, 0.5)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6)).astype(np.int32)
    full = np.asarray(adapter_forward(aparams, jnp.asarray(ids), CFG))
    cache = init_kv_cache(CFG, 1, 8)
    outs = []
    for t in range(6):
        logits, cache = adapter_forward_with_cache(
            aparams, jnp.asarray(ids[:, t : t + 1]), jnp.array([t], jnp.int32),
            cache, CFG,
        )
        outs.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(np.stack(outs, axis=1), full, atol=1e-4)


def test_adapter_state_extraction():
    _, aparams = make_adapter_model(seed=5)
    state = extract_adapter_state(aparams)
    assert set(state) == {"adapter/adapter_wte", "adapter/gating_factor"}
    n_params = sum(int(np.prod(v.shape)) for v in state.values())
    L, aT, D, nh = CFG.n_layer, CFG.adapter_prompt_length, CFG.n_embd, CFG.n_head
    assert n_params == L * aT * D + L * nh


def test_adapter_training_updates_only_adapter(rng):
    _, aparams = make_adapter_model(seed=7)
    opt = make_adamw(1e-2, weight_decay=0.0)
    fwd = lambda p, x: adapter_forward(p, x, CFG)
    step = jax.jit(
        make_train_step(CFG, opt, forward_fn=fwd, trainable_pred=adapter_trainable)
    )
    opt_state = init_opt_state(opt, aparams, trainable_pred=adapter_trainable)
    batch = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 2, 9)), jnp.int32)
    before = jax.tree.map(np.asarray, aparams)
    # step 1 only moves the gates (zero-init gating blocks the wte gradient);
    # wte starts moving once the gates are nonzero
    after, opt_state, _ = step(aparams, opt_state, batch)
    assert not np.allclose(
        before["blocks"]["adapter"]["gating_factor"],
        after["blocks"]["adapter"]["gating_factor"],
    )
    after, opt_state, _ = step(after, opt_state, batch)
    assert not np.allclose(
        before["blocks"]["adapter"]["adapter_wte"],
        after["blocks"]["adapter"]["adapter_wte"],
    )
    np.testing.assert_array_equal(
        before["blocks"]["attn"]["c_attn"]["weight"],
        after["blocks"]["attn"]["c_attn"]["weight"],
    )


# ------------------------------------------------------------------ adapter v2
def test_adapter_v2_identity_at_init(rng):
    """scale=1, bias=0 at init => v2 model == base model."""
    params, aparams = make_adapter_model(seed=9)
    v2 = add_adapter_v2(aparams)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(adapter_forward(aparams, idx, CFG)),
        np.asarray(adapter_forward(v2, idx, CFG)),
        atol=1e-6,
    )


def test_adapter_v2_scale_bias_applied(rng):
    params, aparams = make_adapter_model(seed=11)
    v2 = add_adapter_v2(aparams)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(adapter_forward(v2, idx, CFG))
    v2["lm_head"]["adapter_scale"] = v2["lm_head"]["adapter_scale"] * 2.0
    doubled = np.asarray(adapter_forward(v2, idx, CFG))
    np.testing.assert_allclose(doubled, base * 2.0, atol=1e-5)


def test_adapter_v2_trainable_set():
    assert adapter_v2_trainable("blocks/rms_1/scale")
    assert adapter_v2_trainable("ln_f/scale")
    assert adapter_v2_trainable("blocks/attn/c_attn/adapter_bias")
    assert adapter_v2_trainable("blocks/adapter/gating_factor")
    assert not adapter_v2_trainable("blocks/attn/c_attn/weight")
    assert not adapter_v2_trainable("wte/weight")


def test_adapter_v2_state_extraction():
    _, aparams = make_adapter_model(seed=13)
    v2 = add_adapter_v2(aparams)
    state = extract_adapter_v2_state(v2)
    keys = set(state)
    assert any("adapter_scale" in k for k in keys)
    assert any("adapter_bias" in k for k in keys)
    assert any("rms_1" in k for k in keys)
    assert any("ln_f" in k for k in keys)
    assert not any(k.endswith("/weight") for k in keys)


def test_adapter_prefill_attn_matches_cache_read_path(rng):
    """Adapter analogue of test_model.test_prefill_attn_flag_matches_cache_read
    _path: `prefill_attn=True` must reproduce the cache-read prefill exactly —
    identical logits AND identical written cache. The adapter attention has
    extra structure the llama test does not exercise (write-then-attend
    ordering interleaved with the gated prefix cross-attention), and
    generate_finetuned.py enables the flag by default."""
    params, aparams = make_adapter_model(seed=11)
    g = aparams["blocks"]["adapter"]["gating_factor"]
    aparams["blocks"]["adapter"]["gating_factor"] = jnp.full_like(g, 0.5)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 10)), jnp.int32)
    pos = jnp.arange(10, dtype=jnp.int32)
    base, cache_a = adapter_forward_with_cache(
        aparams, idx, pos, init_kv_cache(CFG, 1, 16), CFG
    )
    fast, cache_b = adapter_forward_with_cache(
        aparams, idx, pos, init_kv_cache(CFG, 1, 16), CFG, prefill_attn=True
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base), atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        cache_a, cache_b,
    )
    # the flag must also compose with a decode step continuing from the
    # prefilled cache (the generate_finetuned.py usage pattern)
    nxt = jnp.asarray([[3]], jnp.int32)
    da, _ = adapter_forward_with_cache(
        aparams, nxt, jnp.array([10], jnp.int32), cache_a, CFG
    )
    db, _ = adapter_forward_with_cache(
        aparams, nxt, jnp.array([10], jnp.int32), cache_b, CFG
    )
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-6)
