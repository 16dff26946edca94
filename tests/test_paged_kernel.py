"""Pallas paged decode-attention kernel parity (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.infer.paged import _gathered, _paged_attention
from lit_llama_ja_tpu.ops.pallas.paged_attention import paged_decode_attention


def _setup(rng, B=3, nh=4, hd=32, page=8, AP=4):
    P = B * AP + 1
    q = jnp.asarray(rng.standard_normal((B, nh, hd)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, (P, nh, page, hd)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (P, nh, page, hd)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (P, nh, page)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (P, nh, page)), jnp.float32)
    # shuffled, non-contiguous page assignment
    tables = jnp.asarray(
        rng.permutation(P - 1)[: B * AP].reshape(B, AP) + 1, jnp.int32
    )
    return q, kp, ks, vp, vs, tables


def test_kernel_matches_gather_path(rng):
    q, kp, ks, vp, vs, tables = _setup(rng)
    pos = jnp.asarray([5, 17, 30], jnp.int32)  # mixed fill levels
    got = np.asarray(
        paged_decode_attention(q, kp, ks, vp, vs, tables, pos, interpret=True)
    )
    cache_l = {"k": kp, "v": vp, "k_scale": ks, "v_scale": vs}
    gath = _gathered(cache_l, tables)
    want = np.asarray(_paged_attention(q[:, :, None], gath, pos[:, None], True))[
        :, :, 0
    ]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_kernel_single_token_and_full(rng):
    q, kp, ks, vp, vs, tables = _setup(rng, B=2, AP=2)
    for pos in ([0, 0], [15, 15]):  # fresh slot / full region
        pos = jnp.asarray(pos, jnp.int32)
        got = np.asarray(
            paged_decode_attention(q[:2], kp, ks, vp, vs, tables, pos, interpret=True)
        )
        cache_l = {"k": kp, "v": vp, "k_scale": ks, "v_scale": vs}
        gath = _gathered(cache_l, tables)
        want = np.asarray(
            _paged_attention(q[:2, :, None], gath, pos[:, None], True)
        )[:, :, 0]
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_paged_forward_kernel_flag_matches(rng):
    """use_kernel=True end-to-end decode == the gather path (interpret on CPU)."""
    import lit_llama_ja_tpu.ops.pallas.paged_attention as pa
    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.infer.paged import init_page_pool, paged_forward
    from lit_llama_ja_tpu.models.llama import init_params

    cfg = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    pool = init_page_pool(cfg, 8, 4, quantized=True)
    tables = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    toks = jnp.asarray([[7]], jnp.int32)
    pos = jnp.asarray([[6]], jnp.int32)

    orig = pa.paged_decode_attention
    try:
        pa.paged_decode_attention = lambda *a, **k: orig(*a, interpret=True, **k)
        got, _ = paged_forward(
            params, toks, pos, tables, pool, cfg, True, True
        )
    finally:
        pa.paged_decode_attention = orig
    pool2 = init_page_pool(cfg, 8, 4, quantized=True)
    want, _ = paged_forward(params, toks, pos, tables, pool2, cfg, True, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_db_kernel_matches_gather_path(rng):
    """Double-buffered variant (manual DMA pipeline) parity, interpret mode."""
    from lit_llama_ja_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_db,
    )

    q, kp, ks, vp, vs, tables = _setup(rng)
    pos = jnp.asarray([5, 17, 30], jnp.int32)
    got = np.asarray(
        paged_decode_attention_db(q, kp, ks, vp, vs, tables, pos, interpret=True)
    )
    cache_l = {"k": kp, "v": vp, "k_scale": ks, "v_scale": vs}
    gath = _gathered(cache_l, tables)
    want = np.asarray(_paged_attention(q[:, :, None], gath, pos[:, None], True))[
        :, :, 0
    ]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
