"""Flash attention kernel parity tests (interpret mode; runs compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.ops.attention import causal_attention
from lit_llama_ja_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("T,bq", [(128, 64), (256, 128), (64, 64)])
def test_flash_matches_xla(rng, T, bq):
    B, nh, hd = 2, 2, 64
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    want = np.asarray(causal_attention(q, k, v))
    got = np.asarray(
        flash_attention(q, k, v, block_q=bq, block_k=bq, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_first_row_is_v0(rng):
    """Causal row 0 attends only to position 0."""
    B, nh, T, hd = 1, 1, 64, 64
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    out = np.asarray(flash_attention(q, k, v, block_q=64, block_k=64, interpret=True))
    np.testing.assert_allclose(out[0, 0, 0], np.asarray(v[0, 0, 0]), atol=1e-5)


def test_flash_gradient_matches_xla(rng):
    """The custom-VJP backward must match grads through the XLA reference."""
    B, nh, T, hd = 1, 2, 128, 32
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 64, 64, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(causal_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("T,bq", [(256, 64), (512, 128)])
def test_flash_gradient_multiblock(rng, T, bq):
    """Backward accumulation across many q/k blocks (first/last-block init and
    flush logic in the Pallas dq and dk/dv kernels)."""
    B, nh, hd = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.float32)

    def run_flash(q, k, v):
        return flash_attention(q, k, v, bq, bq, True)

    _, vjp_f = jax.vjp(run_flash, q, k, v)
    _, vjp_x = jax.vjp(lambda q, k, v: causal_attention(q, k, v), q, k, v)
    for a, b in zip(vjp_f(g), vjp_x(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_flash_gradient_bf16_smoke(rng):
    B, nh, T, hd = 1, 1, 128, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, nh, T, hd)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    grads = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, 64, 64, True).astype(jnp.float32) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gthing in grads:
        assert gthing.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(gthing.astype(jnp.float32)).all())
