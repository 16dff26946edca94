"""Model parity tests against an independent NumPy oracle.

Mirrors the reference's golden-parity test strategy (SURVEY.md §4): instead of
downloading Meta's implementation, a from-scratch NumPy LLaMA forward implemented
here serves as the oracle; the JAX model must match it to float32 accuracy.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import (
    attention_block,
    forward,
    forward_with_cache,
    init_kv_cache,
    init_params,
)
from lit_llama_ja_tpu.ops.rope import apply_rope, build_rope_cache

CFG = LLaMAConfig(block_size=32, vocab_size=96, n_layer=2, n_head=4, n_embd=32)


# ----------------------------------------------------------------------------- oracle
def np_rmsnorm(x, scale, eps=1e-5):
    return scale * x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps)


def np_rope_cache(seq_len, n_elem, base=10000):
    theta = 1.0 / (base ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem))
    idx_theta = np.outer(np.arange(seq_len), theta)
    return np.stack([np.cos(idx_theta), np.sin(idx_theta)], axis=-1)


def np_apply_rope(x, rc):
    # x: (B, T, nh, hd); rc: (T, hd//2, 2)
    B, T, nh, hd = x.shape
    xs = x.reshape(B, T, nh, hd // 2, 2)
    cos, sin = rc[None, :, None, :, 0], rc[None, :, None, :, 1]
    out = np.stack(
        [xs[..., 0] * cos - xs[..., 1] * sin, xs[..., 1] * cos + xs[..., 0] * sin],
        axis=-1,
    )
    return out.reshape(B, T, nh, hd)


def np_softmax(a, axis=-1):
    a = a - a.max(axis=axis, keepdims=True)
    e = np.exp(a)
    return e / e.sum(axis=axis, keepdims=True)


def np_attention(q, k, v, mask):
    # (B, nh, T, hd) x2, mask (T, S) boolean
    att = q @ k.transpose(0, 1, 3, 2) / np.sqrt(q.shape[-1])
    att = np.where(mask, att, -np.inf)
    return np_softmax(att) @ v


def np_forward(params, idx, cfg):
    """Full-sequence LLaMA forward in NumPy over the stacked-layer param tree."""
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    B, T = idx.shape
    nh, hd = cfg.n_head, cfg.head_dim
    x = p["wte"]["weight"][idx]
    rc = np_rope_cache(cfg.block_size, hd)[:T]
    mask = np.tril(np.ones((T, T), bool))
    for l in range(cfg.n_layer):
        h = np_rmsnorm(x, p["blocks"]["rms_1"]["scale"][l])
        qkv = h @ p["blocks"]["attn"]["c_attn"]["weight"][l]
        q, k, v = np.split(qkv, 3, axis=-1)
        q = np_apply_rope(q.reshape(B, T, nh, hd), rc).transpose(0, 2, 1, 3)
        k = np_apply_rope(k.reshape(B, T, nh, hd), rc).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        y = np_attention(q, k, v, mask)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, cfg.n_embd)
        x = x + y @ p["blocks"]["attn"]["c_proj"]["weight"][l]
        h = np_rmsnorm(x, p["blocks"]["rms_2"]["scale"][l])
        fc1 = h @ p["blocks"]["mlp"]["c_fc1"]["weight"][l]
        fc2 = h @ p["blocks"]["mlp"]["c_fc2"]["weight"][l]
        silu = fc1 / (1.0 + np.exp(-fc1))
        x = x + (silu * fc2) @ p["blocks"]["mlp"]["c_proj"]["weight"][l]
    x = np_rmsnorm(x, p["ln_f"]["scale"])
    return x @ p["lm_head"]["weight"]


# ------------------------------------------------------------------------------ tests
def test_rope_matches_oracle(rng):
    x = rng.standard_normal((2, 8, 4, 16)).astype(np.float32)
    rc = build_rope_cache(8, 16)
    got = apply_rope(jnp.asarray(x), rc)
    want = np_apply_rope(x, np_rope_cache(8, 16))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_full_forward_matches_oracle(rng):
    params = init_params(jax.random.PRNGKey(1), CFG)
    idx = rng.integers(0, CFG.vocab_size, size=(2, 12)).astype(np.int32)
    got = forward(params, jnp.asarray(idx), CFG)
    want = np_forward(params, idx, CFG)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)


def test_prefill_matches_full_forward(rng):
    params = init_params(jax.random.PRNGKey(2), CFG)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 10)), jnp.int32)
    full = forward(params, idx, CFG)
    cache = init_kv_cache(CFG, 1, 16)
    cached, _ = forward_with_cache(
        params, idx, jnp.arange(10, dtype=jnp.int32), cache, CFG
    )
    np.testing.assert_allclose(full, cached, atol=1e-5)


def test_prefill_attn_flag_matches_cache_read_path(rng):
    """`prefill_attn=True` (causal over in-flight k/v) must reproduce the
    cache-read prefill: identical logits for an fp cache, and an identical
    written cache (the flag only changes how attention READS, never what is
    written). Round-4 TTFT optimization (PERF.md)."""
    params = init_params(jax.random.PRNGKey(7), CFG)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 10)), jnp.int32)
    pos = jnp.arange(10, dtype=jnp.int32)
    base, cache_a = forward_with_cache(
        params, idx, pos, init_kv_cache(CFG, 1, 16), CFG
    )
    fast, cache_b = forward_with_cache(
        params, idx, pos, init_kv_cache(CFG, 1, 16), CFG, prefill_attn=True
    )
    np.testing.assert_allclose(fast, base, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), cache_a, cache_b
    )
    # quantized cache: written planes identical; logits near (prefill reads
    # exact bf16 k/v instead of the quantized round-trip)
    base_q, qcache_a = forward_with_cache(
        params, idx, pos, init_kv_cache(CFG, 1, 16, quantized="int4"), CFG
    )
    fast_q, qcache_b = forward_with_cache(
        params, idx, pos, init_kv_cache(CFG, 1, 16, quantized="int4"), CFG,
        prefill_attn=True,
    )
    # the two programs compile differently, so upstream bf16 matmul rounding
    # (and hence quantize ties) may differ by one level — compare DEQUANTIZED
    # cache values within ~one quantization step instead of bitwise planes
    for leaf, sleaf in (("k", "k_scale"), ("v", "v_scale")):
        sa = np.asarray(qcache_a[sleaf], np.float64)  # (L, B, nh, S, 1)
        sb = np.asarray(qcache_b[sleaf], np.float64)
        np.testing.assert_allclose(sa, sb, rtol=0.05, atol=1e-6)
        qa_ = np.asarray(qcache_a[leaf]).astype(np.int64)  # (L, B, nh/2, S, hd)
        qb_ = np.asarray(qcache_b[leaf]).astype(np.int64)
        # head-pair packing: low nibble = head 2j, high = head 2j+1; value =
        # (nibble − 8) · per-head scale (ops/attention.quantize_kv4)
        for nib_a, nib_b, s_a, s_b in (
            (qa_ & 0xF, qb_ & 0xF, sa[:, :, 0::2], sb[:, :, 0::2]),
            (qa_ >> 4, qb_ >> 4, sa[:, :, 1::2], sb[:, :, 1::2]),
        ):
            da = (nib_a - 8) * s_a - (nib_b - 8) * s_b
            step = np.maximum(s_a, s_b)
            assert (np.abs(da) <= 1.5 * step + 1e-6).all()
    np.testing.assert_allclose(
        fast_q, base_q, atol=np.abs(np.asarray(base_q)).max() * 0.1
    )


def test_incremental_decode_matches_full_forward(rng):
    """Token-by-token decode with the cache must reproduce full-sequence logits."""
    params = init_params(jax.random.PRNGKey(3), CFG)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 8)).astype(np.int32)
    full = np.asarray(forward(params, jnp.asarray(ids), CFG))
    cache = init_kv_cache(CFG, 1, 16)
    outs = []
    for t in range(8):
        logits, cache = forward_with_cache(
            params,
            jnp.asarray(ids[:, t : t + 1]),
            jnp.array([t], jnp.int32),
            cache,
            CFG,
        )
        outs.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(np.stack(outs, axis=1), full, atol=1e-4)


def test_rollleft_eviction(rng):
    """Writing past the cache size must shift the cache left one slot
    (reference `lit_llama/model.py:221-227`)."""
    params = init_params(jax.random.PRNGKey(4), CFG)
    S = 8
    cache = init_kv_cache(CFG, 1, S)
    ids = rng.integers(0, CFG.vocab_size, size=(1, S)).astype(np.int32)
    _, cache = forward_with_cache(
        params, jnp.asarray(ids), jnp.arange(S, dtype=jnp.int32), cache, CFG
    )
    k_before = np.asarray(cache["k"])
    # step at position S (beyond cache) -> roll left, write at S-1
    _, cache2 = forward_with_cache(
        params,
        jnp.asarray(ids[:, :1]),
        jnp.array([S], jnp.int32),
        cache,
        CFG,
    )
    k_after = np.asarray(cache2["k"])
    np.testing.assert_allclose(k_after[:, :, :, : S - 1], k_before[:, :, :, 1:], atol=1e-6)
    # last slot differs from the rolled source (new token was written there)
    assert not np.allclose(k_after[:, :, :, S - 1], k_before[:, :, :, 0])


def test_vocab_padding():
    cfg = LLaMAConfig(vocab_size=100, n_layer=1, n_head=2, n_embd=8)
    assert cfg.padded_vocab_size == 128
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert params["wte"]["weight"].shape == (128, 8)
