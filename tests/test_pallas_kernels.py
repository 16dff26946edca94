"""Pallas kernel parity tests (interpret mode on CPU; the same kernels run compiled
on TPU — see bench.py). Every kernel ships with an XLA-reference comparison, per
SURVEY.md §7's kernel test rule."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.ops.pallas.quant_matmul import quant_matmul_int4, quant_matmul_int8
from lit_llama_ja_tpu.quant.linear import (
    dequantize_with_k,
    quantize_colblock,
    quantize_int8_absmax,
)


@pytest.mark.parametrize("M", [1, 7, 16])
def test_int4_kernel_matches_xla(rng, M):
    K, N = 256, 256
    w = rng.standard_normal((K, N)).astype(np.float32)
    p = quantize_colblock(jnp.asarray(w), bits=4, tile_cols=-1)
    x = rng.standard_normal((M, K)).astype(np.float32)

    want = np.asarray(jnp.asarray(x) @ dequantize_with_k(p, K))
    got = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
        )
    )
    # bf16 activations inside the kernel -> tolerance scaled to magnitudes
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)


def test_int4_kernel_grouped_scales(rng):
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    p = quantize_colblock(jnp.asarray(w), bits=4, tile_cols=64)  # 4 groups
    assert p["scales"].shape == (4, N)
    x = rng.standard_normal((4, K)).astype(np.float32)
    want = np.asarray(jnp.asarray(x) @ dequantize_with_k(p, K))
    got = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)


@pytest.mark.parametrize("scheme", ["absmax", "colblock"])
def test_int8_kernel_matches_xla(rng, scheme):
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    if scheme == "absmax":
        p = quantize_int8_absmax(jnp.asarray(w))
    else:
        p = quantize_colblock(jnp.asarray(w), bits=8, tile_cols=-1)
    x = rng.standard_normal((3, K)).astype(np.float32)
    want = np.asarray(jnp.asarray(x) @ dequantize_with_k(p, K))
    got = np.asarray(
        quant_matmul_int8(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)


def test_int4_kernel_ragged_n(rng):
    """N not divisible by block_n exercises the masked edge blocks."""
    K, N = 128, 192
    w = rng.standard_normal((K, N)).astype(np.float32)
    p = quantize_colblock(jnp.asarray(w), bits=4, tile_cols=-1)
    x = rng.standard_normal((2, K)).astype(np.float32)
    want = np.asarray(jnp.asarray(x) @ dequantize_with_k(p, K))
    got = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)


@pytest.mark.parametrize("unpack", ["bf16", "f32dot", "arith", "arith_bf16"])
def test_int4_unpack_variants_match(rng, unpack):
    """All in-kernel nibble-unpack strategies are numerically equivalent
    (arith variants rely on bf16/f32 representing 0..255 exactly)."""
    K, N = 256, 256
    w = rng.standard_normal((K, N)).astype(np.float32)
    p = quantize_colblock(jnp.asarray(w), bits=4, tile_cols=64)
    x = rng.standard_normal((4, K)).astype(np.float32)

    base = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
        )
    )
    got = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
            unpack=unpack,
        )
    )
    np.testing.assert_allclose(got, base, atol=np.abs(base).max() * 1e-6)
