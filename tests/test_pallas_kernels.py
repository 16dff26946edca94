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


@pytest.mark.parametrize("unpack", ["bf16", "f32dot", "arith", "arith_bf16", "bf16_u8"])
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
            unpack="bf16",  # exact reference (the auto default at small M is W4A8)
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


@pytest.mark.parametrize(
    "variant", ["int8dot", "int8dot_bias", "int8dot_bias_bc", "int8dot_fused"]
)
@pytest.mark.parametrize("groups", [1, 4])
@pytest.mark.parametrize("M", [1, 5])
def test_int4_int8dot_close_to_exact(rng, M, groups, variant):
    """The W4A8 "int8dot" variant quantizes activations to int8 per (row,
    k-group) in-kernel; its only deviation from exact dequant-matmul is
    activation rounding (≤ amax/254 per element), so it must land within a
    tight relative band of the exact XLA reference — far tighter than bf16
    matmul noise would allow if the scale/zero handling were wrong."""
    K, N = 256, 256
    w = rng.standard_normal((K, N)).astype(np.float32)
    tile_cols = -1 if groups == 1 else K // groups
    p = quantize_colblock(jnp.asarray(w), bits=4, tile_cols=tile_cols)
    x = rng.standard_normal((M, K)).astype(np.float32)
    want = np.asarray(jnp.asarray(x) @ dequantize_with_k(p, K))
    got = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
            unpack=variant,
        )
    )
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)
    # and it must be *different* work than the exact path (sanity that the
    # int8 branch actually ran): exact-match would be a miracle
    assert got.dtype == np.float32


def test_int4_int8dot_zero_rows(rng):
    """All-zero activation rows must not produce NaN/Inf (amax=0 guard)."""
    K, N = 128, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    p = quantize_colblock(jnp.asarray(w), bits=4, tile_cols=-1)
    x = np.zeros((2, K), np.float32)
    got = np.asarray(
        quant_matmul_int4(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
            unpack="int8dot",
        )
    )
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


@pytest.mark.parametrize("scheme", ["absmax", "colblock"])
def test_int8_int8dot_close_to_exact(rng, scheme):
    """The W8A8 "int8dot" int8-kernel variant (weights are the MXU operand as
    loaded; activations int8-rounded per k-group) lands within the activation
    rounding band of the exact dequant reference, for both the signed absmax
    and unsigned colblock schemes."""
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    if scheme == "absmax":
        p = quantize_int8_absmax(jnp.asarray(w))
    else:
        p = quantize_colblock(jnp.asarray(w), bits=8, tile_cols=64)
    x = rng.standard_normal((3, K)).astype(np.float32)
    want = np.asarray(jnp.asarray(x) @ dequantize_with_k(p, K))
    got = np.asarray(
        quant_matmul_int8(
            jnp.asarray(x), p["qweight"], p["scales"], p["zeros"],
            block_m=8, block_n=128, interpret=True, out_dtype=jnp.float32,
            unpack="int8dot",
        )
    )
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 2e-2)
