"""Generation loop tests (reference test analogue: `tests/test_generate.py`)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import bucket_length, generate
from lit_llama_ja_tpu.models.llama import forward, init_params

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2, n_embd=16)


def test_bucket_length():
    assert bucket_length(1) == 16
    assert bucket_length(16) == 16
    assert bucket_length(17) == 32
    assert bucket_length(100) == 128


def test_greedy_generate_matches_argmax_rollout(rng):
    """Greedy cached generation must equal the naive full-recompute argmax rollout."""
    params = init_params(jax.random.PRNGKey(7), CFG)
    prompt = rng.integers(0, CFG.vocab_size, size=(5,)).astype(np.int32)

    got = generate(params, CFG, jnp.asarray(prompt), 6, temperature=0.0)

    ids = list(prompt)
    for _ in range(6):
        logits = forward(params, jnp.asarray(ids, jnp.int32)[None], CFG)
        ids.append(int(np.argmax(np.asarray(logits[0, -1]))))
    np.testing.assert_array_equal(got, np.asarray(ids))


def test_generate_stops_at_eos(rng):
    params = init_params(jax.random.PRNGKey(8), CFG)
    prompt = rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
    full = generate(params, CFG, jnp.asarray(prompt), 10, temperature=0.0)
    eos = int(full[len(prompt) + 2])  # force a stop at the third generated token
    out = generate(params, CFG, jnp.asarray(prompt), 10, temperature=0.0, eos_id=eos)
    assert out[-1] == eos
    assert len(out) <= len(prompt) + 3


def test_generate_beyond_block_size(rng):
    """Generation past block_size exercises roll-left eviction without crashing."""
    cfg = LLaMAConfig(block_size=16, vocab_size=32, n_layer=1, n_head=2, n_embd=8)
    params = init_params(jax.random.PRNGKey(9), cfg)
    prompt = rng.integers(0, cfg.vocab_size, size=(4,)).astype(np.int32)
    out = generate(params, cfg, jnp.asarray(prompt), 20, temperature=0.0)
    assert len(out) == 24


def test_sampling_reproducible(rng):
    params = init_params(jax.random.PRNGKey(10), CFG)
    prompt = rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
    k = jax.random.PRNGKey(42)
    a = generate(params, CFG, jnp.asarray(prompt), 5, temperature=0.8, top_k=10, key=k)
    b = generate(params, CFG, jnp.asarray(prompt), 5, temperature=0.8, top_k=10, key=k)
    np.testing.assert_array_equal(a, b)
