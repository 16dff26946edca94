"""Continuous-batching engine tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import generate
from lit_llama_ja_tpu.infer.serving import Engine
from lit_llama_ja_tpu.models.llama import init_params

CFG = LLaMAConfig(block_size=64, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


@pytest.fixture(scope="module")
def model():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_single_request_matches_generate(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(6,)).astype(np.int32)
    want = generate(model, CFG, jnp.asarray(prompt), 8, temperature=0.0)
    eng = Engine(model, CFG, max_batch=2)
    out = eng.run([(prompt, 8)])
    np.testing.assert_array_equal(out[0], np.asarray(want))


def test_batched_requests_match_individual(model, rng):
    """Concurrent requests must each produce exactly their single-stream output."""
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (4, 7, 5)
    ]
    singles = [
        np.asarray(generate(model, CFG, jnp.asarray(p), 6, temperature=0.0))
        for p in prompts
    ]
    eng = Engine(model, CFG, max_batch=3)
    outs = eng.run([(p, 6) for p in prompts])
    for rid, want in enumerate(singles):
        np.testing.assert_array_equal(outs[rid], want)


def test_more_requests_than_slots(model, rng):
    """Queue drains through a smaller slot pool (the continuous part)."""
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32) for _ in range(5)
    ]
    eng = Engine(model, CFG, max_batch=2)
    outs = eng.run([(p, 4) for p in prompts])
    assert len(outs) == 5
    for rid, p in enumerate(prompts):
        assert len(outs[rid]) == len(p) + 4
        np.testing.assert_array_equal(outs[rid][: len(p)], p)


def test_eos_retires_slot(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
    # find what greedy emits, use its 2nd generated token as eos
    ref = np.asarray(generate(model, CFG, jnp.asarray(prompt), 6, temperature=0.0))
    eos = int(ref[len(prompt) + 1])
    eng = Engine(model, CFG, max_batch=2, eos_id=eos)
    out = eng.run([(prompt, 6)])
    assert out[0][-1] == eos
    assert len(out[0]) == len(prompt) + 2


def test_quantized_kv_engine(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(5,)).astype(np.int32)
    eng = Engine(model, CFG, max_batch=2, quantize_kv=True)
    out = eng.run([(prompt, 6)])
    assert len(out[0]) == len(prompt) + 6


def test_top_p_engine(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(5,)).astype(np.int32)
    eng = Engine(model, CFG, max_batch=2)
    out = eng.run([(prompt, 6)], temperature=0.9, top_p=0.8)
    assert len(out[0]) == len(prompt) + 6
