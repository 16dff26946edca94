"""Sampling-op tests: top-p nucleus filter semantics and composition."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.ops.sampling import sample_token, top_p_filter


def test_top_p_keeps_nucleus_only():
    # probs ~ [0.5, 0.25, 0.125, ...]: top_p=0.6 keeps exactly the top-2
    logits = jnp.log(jnp.asarray([0.5, 0.25, 0.125, 0.0625, 0.0625]))
    filt = np.asarray(top_p_filter(logits, 0.6))
    assert np.isfinite(filt[:2]).all()
    assert np.isinf(filt[2:]).all() and (filt[2:] < 0).all()


def test_top_p_always_keeps_top1():
    logits = jnp.asarray([10.0, 0.0, -1.0])
    filt = np.asarray(top_p_filter(logits, 1e-6))
    assert np.isfinite(filt[0])
    assert np.isinf(filt[1:]).all()


def test_top_p_one_keeps_all():
    logits = jnp.asarray([1.0, 0.5, -2.0, 3.0])
    filt = np.asarray(top_p_filter(logits, 1.0))
    assert np.isfinite(filt).all()


def test_sample_token_top_p_restricts_support(rng):
    logits = jnp.log(jnp.asarray([0.5, 0.3, 0.1, 0.05, 0.05]))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    toks = {int(sample_token(k, logits, 1.0, None, 0.7)) for k in keys}
    assert toks <= {0, 1}  # nucleus at p=0.7 is exactly {0, 1}


def test_sample_token_top_k_and_top_p_compose(rng):
    logits = jnp.asarray([3.0, 2.9, 2.8, -10.0, -10.0])
    keys = jax.random.split(jax.random.PRNGKey(1), 100)
    toks = {int(sample_token(k, logits, 1.0, 2, 0.99)) for k in keys}
    assert toks <= {0, 1}


def test_greedy_ignores_filters():
    logits = jnp.asarray([0.1, 5.0, 0.2])
    assert int(sample_token(jax.random.PRNGKey(0), logits, 0.0, 2, 0.5)) == 1
