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


def test_quantize_kv4_roundtrip(rng):
    from lit_llama_ja_tpu.ops.attention import _unpack4, quantize_kv4

    k = jnp.asarray(rng.standard_normal((1, 2, 4, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 4, 8)), jnp.float32)
    kq, ks, vq, vs = quantize_kv4(k, v)  # head axis -2: packs head pairs
    assert kq.dtype == jnp.uint8 and kq.shape == (1, 2, 2, 8)
    lo, hi = _unpack4(kq)  # lo = even heads, hi = odd heads
    recon = np.empty((1, 2, 4, 8), np.float32)
    recon[..., 0::2, :] = np.asarray(lo) * np.asarray(ks)[..., 0::2, :]
    recon[..., 1::2, :] = np.asarray(hi) * np.asarray(ks)[..., 1::2, :]
    # absmax int4: error bounded by scale/2
    assert np.max(np.abs(recon - np.asarray(k))) <= np.max(np.asarray(ks)) / 2 + 1e-6


def test_int4_cache_decode_close_to_fp(rng):
    from lit_llama_ja_tpu.ops.attention import (
        decode_attention,
        decode_attention_quant4,
        quantize_kv4,
    )

    B, nh, S, hd = 1, 4, 16, 16
    q = jnp.asarray(rng.standard_normal((B, nh, 1, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, S, hd)), jnp.float32)
    pos = jnp.asarray([S - 1], jnp.int32)
    want = np.asarray(decode_attention(q, k, v, pos))
    kq, ks, vq, vs = quantize_kv4(k, v, head_axis=1)
    got = np.asarray(decode_attention_quant4(q, kq, ks, vq, vs, pos))
    # int4 is coarse: ~7% relative is the expected regime at these scales
    assert np.max(np.abs(got - want)) < 0.15 * np.max(np.abs(want)) + 0.05


def test_generate_with_int4_kv(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (5,)), jnp.int32)
    out = generate(params, CFG, prompt, 8, temperature=0.0, quantize_kv="int4")
    assert len(out) == 13
    assert (np.asarray(out) < CFG.vocab_size).all()


def test_paged_engine_int4_kv(rng):
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    params = init_params(jax.random.PRNGKey(0), CFG)
    prompt = rng.integers(0, CFG.vocab_size, (6,)).astype(np.int32)
    eng = PagedEngine(
        params, CFG, max_batch=2, n_pages=32, page_size=4, quantize_kv="int4"
    )
    out = eng.run([(prompt, 8)])
    assert len(out[0]) == len(prompt) + 8
    # int8 path still works and both produce in-vocab tokens
    eng8 = PagedEngine(
        params, CFG, max_batch=2, n_pages=32, page_size=4, quantize_kv="int8"
    )
    out8 = eng8.run([(prompt, 8)])
    assert len(out8[0]) == len(prompt) + 8
