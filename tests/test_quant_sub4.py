"""Sub-4-bit (int3 / int2) pack formats, kernels, and GPTQ solve.

Round-5 north-star work item (VERDICT.md #1): fewer HBM bytes is the only
remaining single-stream decode lever, so the int4 machinery is extended down
to 3- and 2-bit weights. Reference generality: the GPTQ solver and
ColBlockQuantizedLinear take arbitrary ``bits``
(`lit_llama/quantization.py:338-345,475-511`).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.quant.linear import (
    dequantize_with_k,
    infer_bits_params,
    pack_int2,
    pack_int3,
    pack_prequantized,
    quantize_colblock,
    unpack_int2,
    unpack_int3,
)
from lit_llama_ja_tpu.ops.pallas.quant_matmul_sub4 import (
    quant_matmul_int2,
    quant_matmul_int3,
)


def test_pack_int2_roundtrip(rng):
    q = rng.integers(0, 4, size=(32, 16)).astype(np.uint8)
    packed = pack_int2(jnp.asarray(q))
    assert packed.shape == (8, 16) and packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_int2(packed)), q)


def test_pack_int2_top_field_bitcast_identity(rng):
    """The stored top field must satisfy the shift-free kernel contract:
    (byte & 0xC0) reinterpreted as int8 == 64·(q3 − 2) exactly."""
    q = rng.integers(0, 4, size=(8, 8)).astype(np.uint8)
    packed = np.asarray(pack_int2(jnp.asarray(q)))
    top = (packed & 0xC0).astype(np.int8).astype(np.int32)
    np.testing.assert_array_equal(top, 64 * (q[3::4].astype(np.int32) - 2))
    # fields 0-2 read plain: (byte & mask) == 4^j · q_j
    for j, mask in ((0, 0x03), (1, 0x0C), (2, 0x30)):
        np.testing.assert_array_equal(
            (packed & mask).astype(np.int32), (4 ** j) * q[j::4].astype(np.int32)
        )


def test_pack_int3_roundtrip(rng):
    q = rng.integers(0, 8, size=(64, 16)).astype(np.uint8)
    d = pack_int3(jnp.asarray(q))
    assert d["qweight"].shape == (16, 16) and d["qweight_hi"].shape == (8, 16)
    np.testing.assert_array_equal(
        np.asarray(unpack_int3(d["qweight"], d["qweight_hi"])), q
    )


def test_pack_int3_bitplane_contract(rng):
    """(byte & (1 << i)) == 2^i · hi_bit(row 8r+i) — the masked-dot contract."""
    q = rng.integers(0, 8, size=(32, 8)).astype(np.uint8)
    hi = np.asarray(pack_int3(jnp.asarray(q))["qweight_hi"])
    for i in range(8):
        np.testing.assert_array_equal(
            (hi & (1 << i)).astype(np.int32),
            (1 << i) * (q[i::8] >> 2).astype(np.int32),
        )


@pytest.mark.parametrize("bits", [2, 3])
@pytest.mark.parametrize("tile_cols", [-1, 32])
def test_rtn_colblock_dequant_error_bound(rng, bits, tile_cols):
    """RTN at b bits must reconstruct within half a quantization step."""
    w = rng.normal(size=(64, 16)).astype(np.float32)
    params = quantize_colblock(jnp.asarray(w), bits, tile_cols=tile_cols)
    assert infer_bits_params(params, 64) == bits
    deq = np.asarray(dequantize_with_k(params, 64))
    step = np.asarray(params["scales"])
    # expand per-tile scales to rows
    reps = np.repeat(step, 64 // step.shape[0], axis=0)
    assert np.all(np.abs(deq - w) <= reps * 0.5 + 1e-6)


@pytest.mark.parametrize("bits", [2, 3])
@pytest.mark.parametrize("groups", [1, 4])
@pytest.mark.parametrize("unpack", ["bf16", "int8dot"])
def test_kernel_matches_dequant(rng, bits, groups, unpack):
    """Pallas kernel (interpret mode) vs the XLA dequant matmul."""
    K, N, M = 128, 32, 4
    w = rng.normal(size=(K, N)).astype(np.float32)
    params = quantize_colblock(jnp.asarray(w), bits, tile_cols=K // groups)
    x = rng.normal(size=(M, K)).astype(np.float32) * 0.3
    want = np.asarray(x.astype(np.float32) @ np.asarray(
        dequantize_with_k(params, K, dtype=jnp.float32)
    ))
    kw = dict(interpret=True, unpack=unpack, out_dtype=jnp.float32,
              block_k=8 if bits == 3 else 16)
    if bits == 2:
        got = quant_matmul_int2(
            jnp.asarray(x), params["qweight"], params["scales"],
            params["zeros"], **kw,
        )
    else:
        got = quant_matmul_int3(
            jnp.asarray(x), params["qweight"], params["qweight_hi"],
            params["scales"], params["zeros"], **kw,
        )
    got = np.asarray(got)
    if unpack == "bf16":
        # exact weight decode; bf16 activation rounding only
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-2)
    else:
        # W{2,3}A8: activation int8 rounding (<= amax/254 per element)
        scale = np.abs(x).max() * K / 254
        np.testing.assert_allclose(got, want, atol=scale, rtol=0.05)


@pytest.mark.parametrize("bits", [2, 3])
def test_kernel_multi_ktile_grouped(rng, bits):
    """k-grid accumulation across tiles that span whole groups AND tiles that
    subdivide a single group (the two `_plan_tiles` layouts)."""
    K, N, M = 256, 16, 2
    w = rng.normal(size=(K, N)).astype(np.float32)
    for tile_cols in (64, -1):
        params = quantize_colblock(jnp.asarray(w), bits, tile_cols=tile_cols)
        x = rng.normal(size=(M, K)).astype(np.float32) * 0.2
        want = np.asarray(x @ np.asarray(dequantize_with_k(params, K)))
        kw = dict(interpret=True, unpack="bf16", out_dtype=jnp.float32,
                  block_k=8)
        if bits == 2:
            got = quant_matmul_int2(
                jnp.asarray(x), params["qweight"], params["scales"],
                params["zeros"], **kw,
            )
        else:
            got = quant_matmul_int3(
                jnp.asarray(x), params["qweight"], params["qweight_hi"],
                params["scales"], params["zeros"], **kw,
            )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


@pytest.mark.parametrize("bits", [2, 3])
def test_gptq_solve_sub4_beats_rtn(rng, bits):
    """GPTQ at 2/3 bits on a correlated Hessian must not be worse than RTN in
    tr(H·E·E^T) — same invariant the int4 path asserts (test_quant.py)."""
    from lit_llama_ja_tpu.quant.gptq import gptq_quantize_linear

    K, N = 64, 32
    w = rng.normal(size=(K, N)).astype(np.float32)
    a = rng.normal(size=(256, K)).astype(np.float32)
    a[:, : K // 4] *= 4.0  # correlated, anisotropic inputs
    H = jnp.asarray(2.0 / 256 * (a.T @ a))
    params, err = gptq_quantize_linear(jnp.asarray(w), H, bits=bits)
    assert infer_bits_params(params, K) == bits
    deq_g = np.asarray(dequantize_with_k(params, K))
    deq_r = np.asarray(
        dequantize_with_k(quantize_colblock(jnp.asarray(w), bits), K)
    )
    Hn = np.asarray(H)

    def obj(deq):
        E = (w - deq).T  # (N, K)
        return float(np.trace(E @ Hn @ E.T))

    assert obj(deq_g) <= obj(deq_r) * 1.001


@pytest.mark.parametrize("bits", [2, 3])
def test_quant_matmul_dispatch_cpu(rng, bits):
    """linear.quant_matmul routes sub-4-bit leaf dicts through the XLA path on
    CPU (and apply_linear picks them up transparently)."""
    from lit_llama_ja_tpu.quant.linear import quant_matmul

    K, N = 64, 16
    w = rng.normal(size=(K, N)).astype(np.float32)
    params = quantize_colblock(jnp.asarray(w), bits, tile_cols=32)
    x = jnp.asarray(rng.normal(size=(2, K)).astype(np.float32))
    got = np.asarray(quant_matmul(x, params))
    want = np.asarray(x @ dequantize_with_k(params, K))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pack_prequantized_sub4(rng):
    for bits, rows in ((2, 16), (3, 16)):
        q = jnp.asarray(rng.integers(0, 2 ** bits, size=(64, 8)))
        s = jnp.ones((1, 8), jnp.float32)
        z = jnp.zeros((1, 8), jnp.float32)
        params = pack_prequantized(q, s, z, bits)
        assert params["qweight"].shape == (rows, 8)
        assert infer_bits_params(params, 64) == bits
        deq = np.asarray(dequantize_with_k(params, 64))
        np.testing.assert_array_equal(deq, np.asarray(q, np.float32))


@pytest.mark.parametrize("groups", [1, 4, 8])
def test_kernel_groupdeq_matches_dequant(rng, groups):
    """Round-5 grouped fast path: full-tile bf16 dequant + one dot per plane
    (the default for grouped int2 packs) vs the XLA dequant matmul, across
    tiles that span whole groups and tiles that subdivide one."""
    K, N, M = 256, 32, 4
    w = rng.normal(size=(K, N)).astype(np.float32)
    params = quantize_colblock(jnp.asarray(w), 2, tile_cols=K // groups)
    x = rng.normal(size=(M, K)).astype(np.float32) * 0.3
    want = np.asarray(x @ np.asarray(dequantize_with_k(params, K)))
    for block_k in (16, 32):
        got = quant_matmul_int2(
            jnp.asarray(x), params["qweight"], params["scales"],
            params["zeros"], interpret=True, unpack="bf16_groupdeq",
            out_dtype=jnp.float32, block_k=block_k,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)
