"""Mixed per-projection-type bit widths (round 5).

`gptq.mix-a<B>m<B>h<B>[-g<N>]` quantizes the attention projections, the MLP
projections, and lm_head at independent bit widths — the middle points between
the int4 headline (quality-safe) and the int2 pack (+25% decode throughput at a
measured ppl cost). The stacked-scan model constrains bits to vary by
projection *type*, not layer index; dispatch stays shape-inferred per leaf
(`quant/linear.py::infer_bits_params`), so no metadata threads through jit.

Reference generality being extended: ColBlockQuantizedLinear / the GPTQ solver
take one global ``bits`` (`lit_llama/quantization.py:338-345`); the reference
has no per-projection mixing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward, forward_with_cache, init_kv_cache, init_params
from lit_llama_ja_tpu.quant.linear import (
    infer_bits_params,
    mixed_mode_tag,
    parse_quant_mode,
    resolve_bits,
    resolve_groupsize,
    sub4_pad_rows,
)
from lit_llama_ja_tpu.quant.pipeline import gptq_quantize_model

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2, n_embd=16)


def test_parse_mix_grammar():
    assert parse_quant_mode("gptq.mix-a4m2h4-g64") == (
        "gptq", {"attn": 4, "mlp": 2, "head": 4}, 64)
    assert parse_quant_mode("rtn.mix-a2m4h8") == (
        "rtn", {"attn": 2, "mlp": 4, "head": 8}, -1)
    # bare alias = the recommended split
    assert parse_quant_mode("gptq.mix") == (
        "gptq", {"attn": 4, "mlp": 2, "head": 4}, 64)
    assert parse_quant_mode("gptq.mix-g32") == (
        "gptq", {"attn": 4, "mlp": 2, "head": 4}, 32)
    # degenerate mix collapses to the uniform int mode
    assert parse_quant_mode("gptq.mix-a4m4h4") == ("gptq", 4, -1)
    for bad in ("gptq.mix-a5m2h4", "foo.mix-a4m2h4", "gptq.mix-a4m2"):
        with pytest.raises(ValueError):
            parse_quant_mode(bad)


def test_resolve_bits_and_groupsize():
    bits = {"attn": 4, "mlp": 2, "head": 8}
    assert resolve_bits(bits, "attn.c_attn") == 4
    assert resolve_bits(bits, "attn.c_proj") == 4
    assert resolve_bits(bits, "mlp.c_fc1") == 2
    assert resolve_bits(bits, "mlp.c_proj") == 2
    assert resolve_bits(bits, "lm_head") == 8
    assert resolve_bits(4, "mlp.c_fc1") == 4
    # groupsize applies only to the sub-4-bit projections in mixed mode
    assert resolve_groupsize(bits, "mlp.c_fc1", 64) == 64
    assert resolve_groupsize(bits, "attn.c_attn", 64) == -1
    assert resolve_groupsize(bits, "lm_head", 64) == -1
    assert resolve_groupsize(4, "attn.c_attn", 64) == 64  # uniform: unchanged
    assert mixed_mode_tag(bits) == "mix-a4m2h8"
    assert mixed_mode_tag(4) == "4bit"


def test_gptq_mixed_pipeline_shapes_and_forward(rng):
    params = init_params(jax.random.PRNGKey(5), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(4, 16)), jnp.int32)
    bits = {"attn": 4, "mlp": 2, "head": 4}
    qparams = gptq_quantize_model(
        params, CFG, calib, bits=bits, groupsize=8, micro_batch=2, progress=False
    )
    D = CFG.n_embd
    attn_qw = qparams["blocks"]["attn"]["c_attn"]["qweight"]
    assert attn_qw.shape == (CFG.n_layer, D // 2, 3 * D)  # int4 pack
    Dp = sub4_pad_rows(D, 8)
    mlp_qw = qparams["blocks"]["mlp"]["c_fc1"]["qweight"]
    assert mlp_qw.shape == (CFG.n_layer, Dp // 4, CFG.n_hidden)  # int2 pack
    # grouped scales on the int2 leaves only; whole-row on the int4 ones
    assert qparams["blocks"]["mlp"]["c_fc1"]["scales"].shape == (
        CFG.n_layer, Dp // 8, CFG.n_hidden)
    assert qparams["blocks"]["attn"]["c_attn"]["scales"].shape == (
        CFG.n_layer, 1, 3 * D)
    assert qparams["lm_head"]["qweight"].shape == (D // 2, CFG.padded_vocab_size)
    # per-leaf dispatch sees the right widths
    assert infer_bits_params(
        jax.tree.map(lambda a: a[0], qparams["blocks"]["attn"]["c_attn"]), D) == 4
    assert infer_bits_params(
        jax.tree.map(lambda a: a[0], qparams["blocks"]["mlp"]["c_fc1"]), D) == 2

    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 8)), jnp.int32)
    base = np.asarray(forward(params, idx, CFG))
    quant = np.asarray(forward(qparams, idx, CFG))
    assert np.isfinite(quant).all()
    assert np.abs(base - quant).max() < 0.35 * (np.abs(base).max() + 1)


def test_mixed_decode_path_matches_full_forward(rng):
    """forward_with_cache through a mixed tree == full forward (same logits)."""
    params = init_params(jax.random.PRNGKey(6), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)), jnp.int32)
    qparams = gptq_quantize_model(
        params, CFG, calib, bits={"attn": 4, "mlp": 2, "head": 4},
        groupsize=8, micro_batch=2, progress=False,
    )
    T = 6
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, T)), jnp.int32)
    full = np.asarray(forward(qparams, idx, CFG))
    cache = init_kv_cache(CFG, 1, CFG.block_size)
    logits = []
    for t in range(T):
        lg, cache = forward_with_cache(
            qparams, idx[:, t : t + 1], jnp.array([t], jnp.int32), cache, CFG
        )
        logits.append(np.asarray(lg[:, 0]))
    np.testing.assert_allclose(np.stack(logits, 1), full, rtol=2e-2, atol=2e-2)


def test_rtn_mixed_streaming_convert(rng):
    """Quantize-on-load of a lit state dict with a mixed mode (io/convert.py)."""
    import torch

    from lit_llama_ja_tpu.io.convert import lit_state_dict_to_native

    cfg = LLaMAConfig(block_size=16, vocab_size=32, n_layer=2, n_head=2, n_embd=8)
    D, H, V = cfg.n_embd, cfg.n_hidden, cfg.padded_vocab_size
    g = torch.Generator().manual_seed(0)
    sd = {
        "transformer.wte.weight": torch.randn(V, D, generator=g),
        "lm_head.weight": torch.randn(V, D, generator=g),
        "transformer.ln_f.scale": torch.ones(D),
    }
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}."
        sd[p + "rms_1.scale"] = torch.ones(D)
        sd[p + "rms_2.scale"] = torch.ones(D)
        sd[p + "attn.c_attn.weight"] = torch.randn(3 * D, D, generator=g)
        sd[p + "attn.c_proj.weight"] = torch.randn(D, D, generator=g)
        sd[p + "mlp.c_fc1.weight"] = torch.randn(H, D, generator=g)
        sd[p + "mlp.c_fc2.weight"] = torch.randn(H, D, generator=g)
        sd[p + "mlp.c_proj.weight"] = torch.randn(D, H, generator=g)
    params, out_cfg = lit_state_dict_to_native(
        sd, cfg, quantize="rtn.mix-a4m2h4-g8"
    )
    assert params["blocks"]["attn"]["c_attn"]["qweight"].shape == (
        cfg.n_layer, D // 2, 3 * D)
    assert params["blocks"]["mlp"]["c_fc1"]["qweight"].shape == (
        cfg.n_layer, sub4_pad_rows(D, 8) // 4, H)
    assert params["lm_head"]["qweight"].shape == (D // 2, V)
    idx = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 4)), jnp.int32)
    out = forward(jax.tree.map(jnp.asarray, params), idx, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_paged_engine_serves_mixed_tree(rng):
    """The paged serving engine consumes a mixed-bits tree unchanged (leaf
    dispatch is shape-inferred inside the engine's jitted programs) and
    matches single-stream `generate` on the same tree."""
    from lit_llama_ja_tpu.infer.generate import generate
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    params = init_params(jax.random.PRNGKey(7), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 16)), jnp.int32)
    qparams = gptq_quantize_model(
        params, CFG, calib, bits={"attn": 4, "mlp": 2, "head": 4},
        groupsize=8, micro_batch=2, progress=False,
    )
    prompt = rng.integers(0, CFG.vocab_size, size=(6,)).astype(np.int32)
    want = generate(qparams, CFG, jnp.asarray(prompt), 8, temperature=0.0)
    eng = PagedEngine(qparams, CFG, max_batch=2, n_pages=32, page_size=4)
    out = eng.run([(prompt, 8)])
    np.testing.assert_array_equal(out[0], np.asarray(want))
