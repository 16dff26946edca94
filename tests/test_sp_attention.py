"""Sequence-parallel prefill attention tests (8-device simulated mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lit_llama_ja_tpu.ops.attention import causal_attention
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.sp_attention import sequence_parallel_attention


def test_sp_attention_matches_full(rng):
    B, nh, T, hd = 1, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    want = np.asarray(causal_attention(q, k, v))

    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    got = np.asarray(sequence_parallel_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_attention_sharded_inputs(rng):
    """Inputs already sequence-sharded on the mesh stay sharded through the op."""
    B, nh, T, hd = 2, 2, 32, 8
    mesh = make_mesh(dp=1, fsdp=1, tp=4, devices=jax.devices()[:4])
    spec = NamedSharding(mesh, P(None, None, "tp", None))
    q = jax.device_put(
        jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32), spec
    )
    k = jax.device_put(
        jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32), spec
    )
    v = jax.device_put(
        jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32), spec
    )
    out = sequence_parallel_attention(q, k, v, mesh)
    assert out.sharding.spec == P(None, None, "tp", None)
    want = np.asarray(causal_attention(q, k, v))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)


def test_sp_attention_under_jit(rng):
    B, nh, T, hd = 1, 2, 32, 8
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    f = jax.jit(lambda q, k, v: sequence_parallel_attention(q, k, v, mesh))
    got = np.asarray(f(q, k, v))
    want = np.asarray(causal_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)
