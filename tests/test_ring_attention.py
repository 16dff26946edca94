"""Ring attention tests (8-device simulated mesh): parity with the dense causal
oracle and with the all-gather sequence-parallel path, plus end-to-end forward_sp
equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lit_llama_ja_tpu.ops.attention import causal_attention
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.ring_attention import ring_attention
from lit_llama_ja_tpu.parallel.sp_attention import sequence_parallel_attention


def _qkv(rng, B, nh, T, hd):
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    return q, k, v


def test_ring_matches_dense_oracle(rng):
    B, nh, T, hd = 1, 4, 64, 16
    q, k, v = _qkv(rng, B, nh, T, hd)
    want = np.asarray(causal_attention(q, k, v))
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    got = np.asarray(ring_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ring_matches_allgather_impl(rng):
    B, nh, T, hd = 2, 2, 48, 8
    q, k, v = _qkv(rng, B, nh, T, hd)
    mesh = make_mesh(dp=1, fsdp=1, tp=4, devices=jax.devices()[:4])
    ag = np.asarray(sequence_parallel_attention(q, k, v, mesh, impl="allgather"))
    ring = np.asarray(sequence_parallel_attention(q, k, v, mesh, impl="ring"))
    np.testing.assert_allclose(ring, ag, atol=2e-5)


def test_ring_sharded_inputs_stay_sharded(rng):
    B, nh, T, hd = 2, 2, 32, 8
    mesh = make_mesh(dp=1, fsdp=1, tp=4, devices=jax.devices()[:4])
    spec = NamedSharding(mesh, P(None, None, "tp", None))
    q, k, v = (jax.device_put(t, spec) for t in _qkv(rng, B, nh, T, hd))
    out = ring_attention(q, k, v, mesh)
    assert out.sharding.spec == P(None, None, "tp", None)
    want = np.asarray(causal_attention(q, k, v))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


def test_ring_under_jit(rng):
    B, nh, T, hd = 1, 2, 32, 8
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    q, k, v = _qkv(rng, B, nh, T, hd)
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
    got = np.asarray(f(q, k, v))
    want = np.asarray(causal_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ring_bf16_inputs(rng):
    """bf16 q/k/v with f32 online-softmax stats — the production dtype mix."""
    B, nh, T, hd = 1, 2, 64, 16
    q, k, v = (t.astype(jnp.bfloat16) for t in _qkv(rng, B, nh, T, hd))
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    got = np.asarray(ring_attention(q, k, v, mesh)).astype(np.float32)
    want = np.asarray(causal_attention(q, k, v)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_forward_sp_ring_matches_allgather(rng):
    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.models.llama import init_params
    from lit_llama_ja_tpu.parallel.sp_forward import forward_sp

    config = LLaMAConfig(
        block_size=32, vocab_size=96, n_layer=2, n_head=2, n_embd=16
    )
    params = init_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    mesh = make_mesh(dp=1, fsdp=1, tp=4, devices=jax.devices()[:4])
    # T beyond block_size: the long-context case the ring exists for
    idx = jnp.asarray(rng.integers(0, 96, (1, 64)), jnp.int32)
    ag = np.asarray(forward_sp(params, idx, config, mesh, "tp", "allgather"))
    ring = np.asarray(forward_sp(params, idx, config, mesh, "tp", "ring"))
    np.testing.assert_allclose(ring, ag, atol=2e-4, rtol=2e-4)
