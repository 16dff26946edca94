"""Speculative decoding tests.

The load-bearing property: with temperature=0 the emitted sequence equals the
target model's own greedy sequence EXACTLY, regardless of the draft model —
rejection sampling guarantees the target distribution, which for greedy is a
point mass."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import generate
from lit_llama_ja_tpu.infer.speculative import speculative_generate
from lit_llama_ja_tpu.models.llama import init_params

TCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=3, n_head=4, n_embd=32)
DCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=1, n_head=2, n_embd=16)


@pytest.fixture(scope="module")
def target():
    return init_params(jax.random.PRNGKey(0), TCFG)


@pytest.fixture(scope="module")
def draft():
    return init_params(jax.random.PRNGKey(1), DCFG)


@pytest.mark.parametrize("K", [1, 3, 4])
def test_greedy_matches_target_regardless_of_draft(target, draft, rng, K):
    prompt = rng.integers(0, 64, size=(7,)).astype(np.int32)
    want = np.asarray(generate(target, TCFG, jnp.asarray(prompt), 20, temperature=0.0))
    got = speculative_generate(
        target, TCFG, draft, DCFG, prompt, 20, K=K, temperature=0.0
    )
    np.testing.assert_array_equal(got, want)


def test_greedy_self_draft_accepts_everything(target, rng):
    """Draft == target: every draft is accepted (p_t == p_d ⇒ accept prob 1)."""
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    want = np.asarray(generate(target, TCFG, jnp.asarray(prompt), 16, temperature=0.0))
    got = speculative_generate(
        target, TCFG, target, TCFG, prompt, 16, K=4, temperature=0.0
    )
    np.testing.assert_array_equal(got, want)


def test_sampling_smoke_and_range(target, draft, rng):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    out = speculative_generate(
        target, TCFG, draft, DCFG, prompt, 12, K=3,
        temperature=0.8, top_k=20, key=jax.random.PRNGKey(7),
    )
    assert len(out) == len(prompt) + 12
    assert (out >= 0).all() and (out < 64).all()
    np.testing.assert_array_equal(out[: len(prompt)], prompt)


def test_eos_stops(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    ref = np.asarray(generate(target, TCFG, jnp.asarray(prompt), 12, temperature=0.0))
    eos = int(ref[len(prompt) + 2])
    out = speculative_generate(
        target, TCFG, draft, DCFG, prompt, 12, K=3, temperature=0.0, eos_id=eos
    )
    assert out[-1] == eos
    assert len(out) == len(prompt) + 3


def test_deterministic_under_key(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    a = speculative_generate(
        target, TCFG, draft, DCFG, prompt, 10, K=2,
        temperature=0.7, key=jax.random.PRNGKey(3),
    )
    b = speculative_generate(
        target, TCFG, draft, DCFG, prompt, 10, K=2,
        temperature=0.7, key=jax.random.PRNGKey(3),
    )
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_speculative_quantized_kv_matches_plain_greedy(rng, mode):
    """Greedy speculation with a quantized TARGET cache equals plain greedy
    generate with the same quantized cache — the exactness guarantee holds
    under KV quantization (rollback is position bookkeeping only)."""
    from lit_llama_ja_tpu.infer.generate import generate
    from lit_llama_ja_tpu.infer.speculative import speculative_generate

    tparams = init_params(jax.random.PRNGKey(0), TCFG)
    dparams = init_params(jax.random.PRNGKey(1), DCFG)
    prompt = jnp.asarray(rng.integers(3, TCFG.vocab_size, (5,)), jnp.int32)

    want = generate(
        tparams, TCFG, prompt, 12, temperature=0.0, quantize_kv=mode
    )
    got = speculative_generate(
        tparams, TCFG, dparams, DCFG, prompt, 12,
        K=3, temperature=0.0, quantize_kv=mode,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
