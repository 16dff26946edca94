"""INT8 KV-cache tests (new capability beyond the reference; BASELINE north star)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import generate
from lit_llama_ja_tpu.models.llama import (
    forward,
    forward_with_cache,
    init_kv_cache,
    init_params,
)
from lit_llama_ja_tpu.ops.attention import quantize_kv

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


def test_quantize_kv_roundtrip(rng):
    k = jnp.asarray(rng.standard_normal((1, 2, 4, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 4, 8)), jnp.float32)
    kq, ks, vq, vs = quantize_kv(k, v)
    assert kq.dtype == jnp.int8 and ks.shape == (1, 2, 4, 1)
    k_rec = np.asarray(kq, np.float32) * np.asarray(ks)
    # absmax int8: error bounded by scale/2
    assert np.all(np.abs(k_rec - np.asarray(k)) <= np.asarray(ks) / 2 + 1e-7)


def test_quantized_cache_decode_close_to_fp(rng):
    """Token-by-token decode with the INT8 cache must track full-precision logits."""
    params = init_params(jax.random.PRNGKey(3), CFG)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 8)).astype(np.int32)
    full = np.asarray(forward(params, jnp.asarray(ids), CFG))
    cache = init_kv_cache(CFG, 1, 16, quantized=True)
    outs = []
    for t in range(8):
        logits, cache = forward_with_cache(
            params, jnp.asarray(ids[:, t : t + 1]),
            jnp.array([t], jnp.int32), cache, CFG,
        )
        outs.append(np.asarray(logits[:, 0]))
    got = np.stack(outs, axis=1)
    # int8 KV error is small relative to logit scale
    denom = np.abs(full).max() + 1e-6
    assert np.abs(got - full).max() / denom < 0.05, np.abs(got - full).max()
    # and argmax (greedy decisions) overwhelmingly agree
    agree = (got.argmax(-1) == full.argmax(-1)).mean()
    assert agree >= 0.8, agree


def test_quantized_cache_rollleft(rng):
    """Eviction must roll values AND scales together."""
    params = init_params(jax.random.PRNGKey(4), CFG)
    S = 8
    cache = init_kv_cache(CFG, 1, S, quantized=True)
    ids = rng.integers(0, CFG.vocab_size, size=(1, S)).astype(np.int32)
    _, cache = forward_with_cache(
        params, jnp.asarray(ids), jnp.arange(S, dtype=jnp.int32), cache, CFG
    )
    k_before = np.asarray(cache["k"])
    s_before = np.asarray(cache["k_scale"])
    _, cache2 = forward_with_cache(
        params, jnp.asarray(ids[:, :1]), jnp.array([S], jnp.int32), cache, CFG
    )
    np.testing.assert_array_equal(
        np.asarray(cache2["k"])[:, :, :, : S - 1], k_before[:, :, :, 1:]
    )
    np.testing.assert_array_equal(
        np.asarray(cache2["k_scale"])[:, :, :, : S - 1], s_before[:, :, :, 1:]
    )


def test_generate_with_quantized_kv(rng):
    params = init_params(jax.random.PRNGKey(5), CFG)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(5,)), jnp.int32)
    out = generate(params, CFG, prompt, 8, temperature=0.0, quantize_kv=True)
    ref = generate(params, CFG, prompt, 8, temperature=0.0)
    assert len(out) == len(ref)
    # greedy tokens mostly agree with the fp cache (tiny random models are the
    # worst case for argmax flips)
    assert (np.asarray(out) == np.asarray(ref)).mean() > 0.6
