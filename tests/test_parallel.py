"""Sharding tests on the 8-device simulated CPU mesh (SURVEY.md §4 test plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward, init_params
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.specs import param_specs, shard_params

CFG = LLaMAConfig(block_size=16, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


def test_make_mesh_shapes():
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dp", "fsdp", "tp")
    mesh = make_mesh(dp=1, fsdp=-1, tp=2)
    assert mesh.devices.shape == (1, 4, 2)


def test_param_specs_rules():
    params = init_params(jax.random.PRNGKey(0), CFG)
    specs = param_specs(params)
    assert specs["blocks"]["attn"]["c_attn"]["weight"] == P(None, "fsdp", "tp")
    assert specs["blocks"]["attn"]["c_proj"]["weight"] == P(None, "tp", "fsdp")
    assert specs["blocks"]["mlp"]["c_fc1"]["weight"] == P(None, "fsdp", "tp")
    assert specs["blocks"]["mlp"]["c_proj"]["weight"] == P(None, "tp", "fsdp")
    assert specs["wte"]["weight"] == P("tp", "fsdp")
    assert specs["lm_head"]["weight"] == P("fsdp", "tp")
    assert specs["ln_f"]["scale"] == P()


def test_sharded_forward_matches_single_device(rng):
    """TP+FSDP-sharded forward must be numerically identical to unsharded."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 8)), jnp.int32)
    want = np.asarray(forward(params, idx, CFG))

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    got = np.asarray(forward(sharded, idx, CFG))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_cached_decode_matches_single_device(rng):
    """TP-sharded decode with KV cache (the multi-chip serving path) must be
    numerically identical to unsharded decode."""
    import jax.numpy as jnp

    from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache
    from lit_llama_ja_tpu.parallel.specs import kv_cache_shardings

    params = init_params(jax.random.PRNGKey(5), CFG)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 6)), jnp.int32)

    cache = init_kv_cache(CFG, 1, 8)
    want, _ = forward_with_cache(params, ids, jnp.arange(6, dtype=jnp.int32), cache, CFG)

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    cache2 = init_kv_cache(CFG, 1, 8)
    cache2 = jax.device_put(cache2, kv_cache_shardings(cache2, mesh))
    got, new_cache = forward_with_cache(
        sharded, ids, jnp.arange(6, dtype=jnp.int32), cache2, CFG
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sharded_serving_engine(rng):
    """The continuous-batching engine runs with tensor-sharded params."""
    from lit_llama_ja_tpu.infer.serving import Engine

    params = init_params(jax.random.PRNGKey(6), CFG)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    eng = Engine(sharded, CFG, max_batch=2, max_seq_length=16)
    prompt = rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
    out = eng.run([(prompt, 4)])
    assert len(out[0]) == 8

    unsharded = Engine(params, CFG, max_batch=2, max_seq_length=16)
    want = unsharded.run([(prompt, 4)])
    np.testing.assert_array_equal(out[0], want[0])


def test_sharded_quantized_model(rng):
    """INT4-quantized params shard over (fsdp, tp) and produce identical logits —
    the tensor-sharded quantized serving configuration (BASELINE config #5)."""
    import jax.numpy as jnp

    from lit_llama_ja_tpu.quant.pipeline import gptq_quantize_model

    params = init_params(jax.random.PRNGKey(7), CFG)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(2, 8)), jnp.int32)
    qparams = gptq_quantize_model(params, CFG, calib, bits=4, micro_batch=2,
                                  progress=False)
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 6)), jnp.int32)
    want = np.asarray(forward(qparams, idx, CFG))

    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(qparams, mesh)
    qw = sharded["blocks"]["attn"]["c_attn"]["qweight"]
    assert {s.data.shape for s in qw.addressable_shards} == {
        (CFG.n_layer, CFG.n_embd // 2 // 2, 3 * CFG.n_embd // 4)
    }
    got = np.asarray(forward(sharded, idx, CFG))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sharded_params_actually_sharded():
    params = init_params(jax.random.PRNGKey(1), CFG)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    w = sharded["blocks"]["attn"]["c_attn"]["weight"]
    # 8 devices each hold 1/8 of the tensor (fsdp=2 × tp=4)
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    L, D = CFG.n_layer, CFG.n_embd
    assert shard_shapes == {(L, D // 2, 3 * D // 4)}
