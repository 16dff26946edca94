"""Quantization tests: pack/unpack round-trips, RTN error bounds, GPTQ solver parity
vs an independent NumPy implementation, and end-to-end quantized model quality.

(The reference has NO quantization test coverage at all — SURVEY.md §4 calls this out
as a gap to close.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward, init_params
from lit_llama_ja_tpu.quant.gptq import gptq_quantize_linear, hessian_update, init_hessian
from lit_llama_ja_tpu.quant.linear import (
    dequantize_with_k,
    pack_int4,
    quantize_colblock,
    quantize_int8_absmax,
    unpack_int4,
)
from lit_llama_ja_tpu.quant.pipeline import gptq_quantize_model, int8_quantize_model


def test_int4_pack_roundtrip(rng):
    q = rng.integers(0, 16, size=(8, 6)).astype(np.uint8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (4, 6)
    np.testing.assert_array_equal(unpack_int4(packed), q)


def test_int8_absmax_roundtrip_error(rng):
    w = rng.standard_normal((32, 16)).astype(np.float32)
    p = quantize_int8_absmax(jnp.asarray(w))
    assert p["qweight"].dtype == jnp.int8
    wr = dequantize_with_k(p, 32)
    # absmax int8: max error <= scale/2 per channel
    scale = np.asarray(p["scales"])[0]
    assert np.all(np.abs(np.asarray(wr) - w) <= scale / 2 + 1e-7)


@pytest.mark.parametrize("bits", [4, 8])
def test_colblock_rtn_roundtrip(rng, bits):
    w = rng.standard_normal((64, 8)).astype(np.float32)
    p = quantize_colblock(jnp.asarray(w), bits=bits, tile_cols=16)
    wr = np.asarray(dequantize_with_k(p, 64))
    # error bounded by half an asymmetric step per tile
    scales = np.repeat(np.asarray(p["scales"]), 16, axis=0)
    assert np.all(np.abs(wr - w) <= scales / 2 + 1e-6)


# --------------------------------------------------------------------- GPTQ oracle
def np_gptq(W, H, bits, blocksize=128, percdamp=0.01):
    """Independent NumPy GPTQ (no grouping, no actorder) for parity testing."""
    N, K = W.shape
    maxq = 2**bits - 1
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    dead = np.diag(H) == 0
    H[dead, dead] = 1
    W[:, dead] = 0
    xmin = np.minimum(W.min(axis=1), 0)
    xmax = np.maximum(W.max(axis=1), 0)
    z = (xmin == 0) & (xmax == 0)
    xmin[z], xmax[z] = -1, 1
    scale = (xmax - xmin) / maxq
    zero = np.round(-xmin / scale)
    damp = percdamp * np.mean(np.diag(H))
    H[np.arange(K), np.arange(K)] += damp
    Hinv_full = np.linalg.inv(H)
    Hinv = np.linalg.cholesky(Hinv_full).T  # upper
    Q = np.zeros_like(W)
    for i1 in range(0, K, blocksize):
        i2 = min(i1 + blocksize, K)
        W1 = W[:, i1:i2].copy()
        Err1 = np.zeros_like(W1)
        for i in range(i2 - i1):
            w = W1[:, i]
            d = Hinv[i1 + i, i1 + i]
            q = np.clip(np.round(w / scale) + zero, 0, maxq)
            wq = scale * (q - zero)
            err = (w - wq) / d
            W1[:, i:] -= err[:, None] * Hinv[i1 + i, i1 + i : i2][None, :]
            Err1[:, i] = err
            Q[:, i1 + i] = q
        W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]
    return Q, scale, zero


def test_gptq_matches_numpy_oracle(rng):
    N, K = 8, 32
    W = rng.standard_normal((N, K)).astype(np.float32)
    X = rng.standard_normal((64, K)).astype(np.float32)
    H, n = init_hessian(K)
    H, n = hessian_update(H, n, jnp.asarray(X))
    params, err = gptq_quantize_linear(
        jnp.asarray(W.T), H, bits=4, blocksize=8, actorder=False
    )
    got_levels = np.asarray(unpack_int4(params["qweight"])).T.astype(np.float64)
    want_levels, w_scale, w_zero = np_gptq(W, np.asarray(H), bits=4, blocksize=8)
    # levels nearly all identical (fp32 vs fp64 rounding can flip borderline cells)
    agree = (got_levels == want_levels).mean()
    assert agree > 0.95, agree
    np.testing.assert_allclose(np.asarray(params["scales"])[0], w_scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["zeros"])[0], w_zero, rtol=1e-5)


def test_gptq_identity_hessian_equals_rtn(rng):
    """With H = I (uncorrelated inputs) GPTQ reduces to round-to-nearest."""
    K, N = 16, 8
    w = rng.standard_normal((K, N)).astype(np.float32)
    H = jnp.eye(K) * 2.0  # any multiple of I
    params, _ = gptq_quantize_linear(jnp.asarray(w), H, bits=8, actorder=False)
    rtn = quantize_colblock(jnp.asarray(w), bits=8, tile_cols=-1)
    np.testing.assert_array_equal(
        np.asarray(params["qweight"]), np.asarray(rtn["qweight"])
    )


def test_gptq_beats_rtn_on_correlated_inputs(rng):
    """GPTQ's raison d'être: lower output error than RTN under correlated inputs."""
    N, K = 16, 64
    W = rng.standard_normal((K, N)).astype(np.float32)
    # strongly correlated calibration inputs
    base = rng.standard_normal((256, 8)).astype(np.float32)
    mix = rng.standard_normal((8, K)).astype(np.float32)
    X = base @ mix + 0.05 * rng.standard_normal((256, K)).astype(np.float32)
    H, n = init_hessian(K)
    H, n = hessian_update(H, n, jnp.asarray(X))
    gptq_p, _ = gptq_quantize_linear(jnp.asarray(W), H, bits=4, actorder=True)
    rtn_p = quantize_colblock(jnp.asarray(W), bits=4)
    w_gptq = np.asarray(dequantize_with_k(gptq_p, K))
    w_rtn = np.asarray(dequantize_with_k(rtn_p, K))
    err_gptq = np.linalg.norm(X @ (w_gptq - W))
    err_rtn = np.linalg.norm(X @ (w_rtn - W))
    assert err_gptq < err_rtn, (err_gptq, err_rtn)


CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2, n_embd=16)


def test_int8_model_quality(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    qparams = int8_quantize_model(params)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(forward(params, idx, CFG))
    quant = np.asarray(forward(qparams, idx, CFG))
    # int8 weight-only should track the fp32 logits closely
    assert np.abs(base - quant).max() < 0.1 * (np.abs(base).max() + 1)


def test_int8_outlier_reduces_error(rng):
    """Outlier-aware llm.int8: the bf16 outlier split must beat plain absmax
    RTN on weights with heavy-tailed rows (the regime bnb's threshold-6.0
    decomposition targets, reference `lit_llama/quantization.py:36-75`)."""
    from lit_llama_ja_tpu.quant.linear import quantize_int8_outlier

    w = rng.standard_normal((256, 32)).astype(np.float32)
    # plant outliers: 2 rows with 30x magnitude (they set every column scale)
    w[7] *= 30
    w[101] *= 30
    wj = jnp.asarray(w)
    plain = np.asarray(dequantize_with_k(quantize_int8_absmax(wj), 256))
    p = quantize_int8_outlier(wj, outlier_frac=0.01)
    mixed = np.asarray(dequantize_with_k(p, 256))
    # the planted rows must be selected and reproduced at bf16 precision
    assert {7, 101} <= set(np.asarray(p["outlier_idx"]).tolist())
    assert np.abs(mixed[7] - w[7]).max() <= np.abs(w[7]).max() * 2**-8
    # and the bulk error shrinks by roughly the scale reduction (~30x)
    bulk = np.ones(256, bool)
    bulk[np.asarray(p["outlier_idx"])] = False
    assert np.abs(mixed[bulk] - w[bulk]).max() < 0.2 * np.abs(plain[bulk] - w[bulk]).max()


def test_int8_outlier_model_forward(rng):
    """End-to-end: outlier llm.int8 tracks fp32 logits at least as well as
    plain RTN, and the quantized tree stays jit/pjit-clean (arrays only)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    q_out = int8_quantize_model(params, outliers=True)
    q_rtn = int8_quantize_model(params, outliers=False)
    leaf = q_out["blocks"]["attn"]["c_attn"]
    assert leaf["outlier_w"].dtype == jnp.bfloat16
    assert leaf["outlier_idx"].shape[0] == CFG.n_layer  # stacked layer axis
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(forward(params, idx, CFG))
    err_out = np.abs(base - np.asarray(forward(q_out, idx, CFG))).max()
    err_rtn = np.abs(base - np.asarray(forward(q_rtn, idx, CFG))).max()
    assert err_out <= err_rtn * 1.05
    # sharding specs cover the new leaves
    from jax.sharding import PartitionSpec as P

    from lit_llama_ja_tpu.parallel.specs import PARAM_RULES, _match

    assert _match("blocks/attn/c_attn/outlier_w", PARAM_RULES) == P(None, None, "tp")
    assert _match("blocks/attn/c_attn/outlier_idx", PARAM_RULES) == P()


def test_gptq_pipeline_end_to_end(rng):
    params = init_params(jax.random.PRNGKey(1), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(4, 16)), jnp.int32)
    qparams = gptq_quantize_model(
        params, CFG, calib, bits=8, micro_batch=2, progress=False
    )
    # all linears quantized
    assert "qweight" in qparams["blocks"]["attn"]["c_attn"]
    assert "qweight" in qparams["lm_head"]
    assert qparams["blocks"]["attn"]["c_attn"]["qweight"].shape[0] == CFG.n_layer
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(forward(params, idx, CFG))
    quant = np.asarray(forward(qparams, idx, CFG))
    assert np.abs(base - quant).max() < 0.2 * (np.abs(base).max() + 1)


def test_gptq_grouped_pipeline_end_to_end(rng):
    """Grouped scales (groupsize != -1) through the full calibrate->infer path."""
    params = init_params(jax.random.PRNGKey(3), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)), jnp.int32)
    qparams = gptq_quantize_model(
        params, CFG, calib, bits=4, groupsize=8, micro_batch=2, progress=False
    )
    # n_embd=16, groupsize=8 -> 2 scale groups on the qkv projection
    assert qparams["blocks"]["attn"]["c_attn"]["scales"].shape == (
        CFG.n_layer, 2, 3 * CFG.n_embd,
    )
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(forward(params, idx, CFG))
    quant = np.asarray(forward(qparams, idx, CFG))
    assert np.abs(base - quant).max() < 0.25 * (np.abs(base).max() + 1)


def test_gptq_int4_pipeline_packs(rng):
    params = init_params(jax.random.PRNGKey(2), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)), jnp.int32)
    qparams = gptq_quantize_model(
        params, CFG, calib, bits=4, micro_batch=2, progress=False
    )
    qw = qparams["blocks"]["attn"]["c_attn"]["qweight"]
    assert qw.dtype == jnp.uint8
    assert qw.shape == (CFG.n_layer, CFG.n_embd // 2, 3 * CFG.n_embd)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    forward(qparams, idx, CFG)  # runs without error


def _emulated_w8a8(x, params):
    """The int8 kernel's W8A8 numerics on CPU: activations int8-rounded per
    row (one k-group), weights dequantized exactly."""
    from lit_llama_ja_tpu.quant.linear import dequantize_with_k

    amax = np.max(np.abs(np.asarray(x, np.float64)), axis=1, keepdims=True)
    rsx = 127.0 / np.maximum(amax, 1e-30)
    xq = np.round(np.asarray(x) * rsx)
    w = np.asarray(dequantize_with_k(params, x.shape[-1], dtype=jnp.float32))
    return (xq @ w) / rsx


def test_dynamic_int8_outlier_decomposition(rng):
    """bnb threshold-6.0 semantics (reference `lit_llama/quantization.py:44-48`):
    on activations with emergent outlier columns, the per-forward decomposition
    must recover the precision that naive W8A8 loses, and must match the float
    oracle closely. VERDICT round-4 item #4."""
    from lit_llama_ja_tpu.quant.linear import (
        _dynamic_outlier_split,
        quant_matmul,
        quantize_int8_dynamic,
    )

    K, N, M = 128, 64, 8
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    out_cols = np.asarray([5, 42, 97])
    x[:, out_cols] *= 40.0  # emergent outliers: |x| >> 6

    params = quantize_int8_dynamic(jnp.asarray(w), threshold=6.0,
                                   max_outlier_frac=0.05)
    assert params["dyn_budget"].shape == (6,)

    # the split must find exactly the true outlier columns (live gate on)
    bulk, idx, live = _dynamic_outlier_split(
        jnp.asarray(x), params["dyn_threshold"], 6
    )
    chosen = {int(i) for i, l in zip(np.asarray(idx), np.asarray(live)) if l > 0}
    assert chosen == set(out_cols.tolist())
    np.testing.assert_allclose(np.asarray(bulk)[:, out_cols], 0.0)

    oracle = x @ w
    y_dyn = np.asarray(quant_matmul(jnp.asarray(x), params))
    # naive W8A8 with the outliers inside: activation scale amax/127 is huge
    y_naive = _emulated_w8a8(x, {k: v for k, v in params.items()
                                 if not k.startswith("dyn_")})
    err_dyn = np.abs(y_dyn - oracle).max()
    err_naive = np.abs(y_naive - oracle).max()
    # the decomposition must remove most of the activation-rounding error the
    # outliers induce; what remains is the weight-rounding floor BOTH paths
    # share (the fair lower bound)
    from lit_llama_ja_tpu.quant.linear import dequantize_with_k

    w_deq = np.asarray(dequantize_with_k(
        {k: v for k, v in params.items() if not k.startswith("dyn_")}, K,
        dtype=jnp.float32,
    ))
    err_wfloor = np.abs(x @ w_deq - oracle).max()
    assert err_dyn < 0.33 * err_naive, (err_dyn, err_naive)
    # CPU path: bulk is exact dequant, so only weight rounding remains
    assert err_dyn < err_wfloor * 1.2 + 1e-6, (err_dyn, err_wfloor)


def test_dynamic_int8_no_outliers_is_plain_int8(rng):
    """Below-threshold activations: the gate stays closed and the result equals
    the plain absmax-int8 matmul bit-for-bit (CPU path)."""
    from lit_llama_ja_tpu.quant.linear import (
        quant_matmul,
        quantize_int8_absmax,
        quantize_int8_dynamic,
    )

    K, N, M = 64, 32, 4
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)  # |x| ~ 1 << 6
    params_d = quantize_int8_dynamic(jnp.asarray(w))
    params_p = quantize_int8_absmax(jnp.asarray(w))
    y_d = np.asarray(quant_matmul(jnp.asarray(x), params_d))
    y_p = np.asarray(quant_matmul(jnp.asarray(x), params_p))
    np.testing.assert_array_equal(y_d, y_p)


def test_dynamic_int8_model_forward(rng):
    """int8_quantize_model(outliers='dynamic') produces a tree the model runs,
    and the sentinel leaves survive the stacked-layer scan."""
    params = init_params(jax.random.PRNGKey(4), CFG)
    qparams = int8_quantize_model(params, outliers="dynamic")
    leaf = qparams["blocks"]["attn"]["c_attn"]
    assert "dyn_threshold" in leaf and leaf["dyn_threshold"].shape == (CFG.n_layer,)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(forward(params, idx, CFG))
    quant = np.asarray(forward(qparams, idx, CFG))
    assert np.abs(base - quant).max() < 0.25 * (np.abs(base).max() + 1)
