"""Sequence-parallel forward tests: parity with the standard forward inside
block_size, and beyond-block_size contexts that the reference cannot represent."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward, init_params
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.sp_forward import forward_sp

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


def test_sp_forward_matches_standard(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)), jnp.int32)
    want = np.asarray(forward(params, idx, CFG))
    got = np.asarray(forward_sp(params, idx, CFG, mesh))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sp_forward_beyond_block_size(rng):
    """T > block_size runs (the reference asserts it away, model.py:92-94);
    logits for the first block_size positions match the standard forward."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    T = 2 * CFG.block_size  # 64 tokens on a block_size=32 model
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, T)), jnp.int32)
    logits = np.asarray(forward_sp(params, idx, CFG, mesh))
    assert logits.shape == (1, T, CFG.padded_vocab_size)
    # causality: prefix logits equal the plain forward on the prefix
    want = np.asarray(forward(params, idx[:, : CFG.block_size], CFG))
    np.testing.assert_allclose(logits[:, : CFG.block_size], want, atol=2e-4)


def test_sp_forward_with_tp_sharded_params(rng):
    """SP sequence sharding composes with tensor-sharded parameters."""
    from lit_llama_ja_tpu.parallel.specs import shard_params

    params = init_params(jax.random.PRNGKey(2), CFG)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 16)), jnp.int32)
    want = np.asarray(forward(params, idx, CFG))
    got = np.asarray(forward_sp(sharded, idx, CFG, mesh))
    np.testing.assert_allclose(got, want, atol=2e-4)
