"""Ring dequant-matmul parity vs the single-device quantized matmul."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.parallel.collective_matmul import ring_quant_matmul
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.quant.linear import (
    quant_matmul,
    quantize_colblock,
    quantize_int8_absmax,
)


def _w(rng, K, N):
    return jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("grouped", [False, True])
def test_ring_int4_matches_dense(rng, n_dev, grouped):
    K, N, M = 64, 32, 8
    # grouped scales must shard with the K rows: n_tiles = n_dev here
    tile_cols = K // n_dev if grouped else -1
    qp = quantize_colblock(_w(rng, K, N), bits=4, tile_cols=tile_cols)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    want = np.asarray(quant_matmul(x, qp))
    mesh = make_mesh(dp=1, fsdp=n_dev, tp=1, devices=jax.devices()[:n_dev])
    got = np.asarray(ring_quant_matmul(x, qp, mesh, axis="fsdp"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_int8_matches_dense(rng):
    K, N, M = 32, 48, 4
    qp = quantize_int8_absmax(_w(rng, K, N))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    want = np.asarray(quant_matmul(x, qp))
    mesh = make_mesh(dp=1, fsdp=4, tp=1, devices=jax.devices()[:4])
    got = np.asarray(ring_quant_matmul(x, qp, mesh, axis="fsdp"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_batched_input_shape(rng):
    K, N = 32, 32
    qp = quantize_colblock(_w(rng, K, N), bits=4, tile_cols=-1)
    x = jnp.asarray(rng.normal(size=(2, 3, K)).astype(np.float32))
    mesh = make_mesh(dp=1, fsdp=2, tp=1, devices=jax.devices()[:2])
    got = ring_quant_matmul(x, qp, mesh, axis="fsdp")
    assert got.shape == (2, 3, N)
    want = np.asarray(quant_matmul(x, qp))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_ring_under_jit(rng):
    """Composes under an outer jit (the serving/step context it targets)."""
    K, N, M = 64, 32, 4
    qp = quantize_colblock(_w(rng, K, N), bits=4, tile_cols=16)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    mesh = make_mesh(dp=1, fsdp=4, tp=1, devices=jax.devices()[:4])

    @jax.jit
    def f(x, qp):
        return ring_quant_matmul(x, qp, mesh, axis="fsdp") * 2.0

    want = np.asarray(quant_matmul(x, qp)) * 2.0
    np.testing.assert_allclose(np.asarray(f(x, qp)), want, rtol=1e-5, atol=1e-5)
