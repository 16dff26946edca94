"""Perplexity protocol tests (reference analogue: `evaluate/full.py` math)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.evaluate import perplexity
from lit_llama_ja_tpu.models.llama import forward, init_params
from lit_llama_ja_tpu.train.loss import token_nll_sum

CFG = LLaMAConfig(block_size=16, vocab_size=32, n_layer=1, n_head=2, n_embd=16)


def test_uniform_model_ppl_equals_vocab():
    """A model emitting uniform logits has ppl == padded vocab size."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    zeroed = jax.tree.map(jnp.zeros_like, params)
    tokens = np.arange(64) % CFG.vocab_size
    ppl = perplexity(zeroed, CFG, tokens, window=16)
    np.testing.assert_allclose(ppl, CFG.padded_vocab_size, rtol=1e-4)


def test_perplexity_matches_manual_windows(rng):
    params = init_params(jax.random.PRNGKey(1), CFG)
    tokens = rng.integers(0, CFG.vocab_size, size=(49,))
    got = perplexity(params, CFG, tokens, window=16)
    # manual: stride 16 windows, sum nll / count (reference evaluate/full.py:117-128)
    total_nll = total_cnt = 0.0
    for i in range(3):
        chunk = jnp.asarray(tokens[i * 16 : i * 16 + 17], jnp.int32)[None]
        logits = forward(params, chunk[:, :-1], CFG)
        nll, cnt = token_nll_sum(logits, chunk[:, 1:])
        total_nll += float(nll)
        total_cnt += float(cnt)
    want = np.exp(total_nll / total_cnt)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_quantized_ppl_delta_small(rng):
    """INT8 weight-only quantization must not move ppl much on a tiny model —
    the Δppl quality-gate pattern from BASELINE (≤0.1 int8 at 7B scale)."""
    from lit_llama_ja_tpu.quant.pipeline import int8_quantize_model

    params = init_params(jax.random.PRNGKey(2), CFG)
    tokens = rng.integers(0, CFG.vocab_size, size=(14 * 16 + 1,))
    base = perplexity(params, CFG, tokens, window=16)
    q8 = int8_quantize_model(params)
    quant = perplexity(q8, CFG, tokens, window=16)
    assert abs(quant - base) / base < 0.02, (base, quant)


def test_decode_path_perplexity_matches_full_sequence(rng):
    """With an fp cache, the decode-path protocol (teacher-forced through
    forward_with_cache) reproduces the full-sequence window perplexity — the
    cached and uncached paths compute the same logits."""
    import jax

    from lit_llama_ja_tpu.infer.evaluate import decode_path_perplexity, perplexity
    from lit_llama_ja_tpu.models.llama import init_params

    cfg = LLaMAConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2, n_embd=16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = rng.integers(0, 64, size=(17,)).astype(np.int32)  # exactly one window
    want = perplexity(params, cfg, tokens)
    got = decode_path_perplexity(params, cfg, tokens, quantize_kv=False, windows=1)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_decode_path_perplexity_quantized_close(rng):
    """int8/int4 caches perturb but do not explode the decode-path ppl."""
    import jax

    from lit_llama_ja_tpu.infer.evaluate import decode_path_perplexity
    from lit_llama_ja_tpu.models.llama import init_params

    cfg = LLaMAConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2, n_embd=16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = rng.integers(0, 64, size=(120,)).astype(np.int32)
    base = decode_path_perplexity(params, cfg, tokens, quantize_kv=False, windows=3)
    for mode in ("int8", "int4"):
        q = decode_path_perplexity(params, cfg, tokens, quantize_kv=mode, windows=3)
        assert abs(q - base) / base < 0.1, (mode, q, base)
