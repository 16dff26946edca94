"""Pipeline-parallelism tests (simulated multi-device mesh): forward parity with
the plain scan model, dp×pp composition, and a full train-step parity check
against the single-device gradient-accumulation step."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models import llama
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.pipeline import (
    make_pp_train_step,
    pipeline_forward,
    pp_param_specs,
    shard_params_pp,
)
from lit_llama_ja_tpu.train.step import make_train_step


CFG = LLaMAConfig(block_size=16, vocab_size=96, n_layer=4, n_head=2, n_embd=16)


def _params():
    return llama.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_pp_specs_shard_only_blocks():
    specs = pp_param_specs(_params())
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )[0]
    for path, spec in flat:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if joined.startswith("blocks"):
            assert spec == jax.sharding.PartitionSpec("pp")
        else:
            assert spec == jax.sharding.PartitionSpec()


def test_pipeline_forward_matches_scan(rng):
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=4, devices=jax.devices()[:4])
    params = shard_params_pp(_params(), mesh)
    M, mb, T = 4, 2, 12
    idx = jnp.asarray(rng.integers(0, 96, (M, mb, T)), jnp.int32)
    got = np.asarray(pipeline_forward(params, idx, CFG, mesh))
    want = np.asarray(llama.forward(_params(), idx.reshape(M * mb, T), CFG))
    np.testing.assert_allclose(got.reshape(M * mb, T, -1), want, atol=2e-4, rtol=2e-4)


def test_pipeline_forward_dp_pp(rng):
    """dp=2 × pp=4 on 8 virtual devices; batch dim sharded over dp."""
    mesh = make_mesh(dp=2, fsdp=1, tp=1, pp=4)
    params = shard_params_pp(_params(), mesh)
    M, mb, T = 3, 4, 8
    idx = jnp.asarray(rng.integers(0, 96, (M, mb, T)), jnp.int32)
    got = np.asarray(pipeline_forward(params, idx, CFG, mesh))
    want = np.asarray(llama.forward(_params(), idx.reshape(M * mb, T), CFG))
    np.testing.assert_allclose(got.reshape(M * mb, T, -1), want, atol=2e-4, rtol=2e-4)


def test_pipeline_remat_matches(rng):
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    params = shard_params_pp(_params(), mesh)
    idx = jnp.asarray(rng.integers(0, 96, (2, 2, 8)), jnp.int32)
    plain = np.asarray(pipeline_forward(params, idx, CFG, mesh, "pp", False))
    remat = np.asarray(pipeline_forward(params, idx, CFG, mesh, "pp", True))
    np.testing.assert_allclose(plain, remat, atol=1e-6)


def test_pp_train_step_matches_single_device(rng):
    """One optimizer step through the pipeline == one step of the plain
    grad-accumulation path (same batch, same optimizer)."""
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=4, devices=jax.devices()[:4])
    opt = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.1)
    M, mb, T = 4, 2, 12
    batch = jnp.asarray(rng.integers(0, 96, (M, mb, T + 1)), jnp.int32)

    params_pp = shard_params_pp(_params(), mesh)
    opt_state_pp = opt.init(params_pp)
    step_pp = make_pp_train_step(CFG, opt, mesh).jit_with(params_pp)
    new_pp, _, loss_pp = step_pp(params_pp, opt_state_pp, batch)

    params_ref = _params()
    opt_state_ref = opt.init(params_ref)
    step_ref = jax.jit(make_train_step(CFG, opt))
    new_ref, _, loss_ref = step_ref(params_ref, opt_state_ref, batch)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), atol=1e-5, rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves_with_path(new_ref)
    pp_leaves = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(new_pp)
    )
    for path, want in ref_leaves:
        got = pp_leaves[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            got, np.asarray(want), atol=2e-4, rtol=2e-3,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pp_tp_forward_matches_scan(rng):
    """pp=2 × tp=2: megatron in-stage TP inside the pipeline."""
    from lit_llama_ja_tpu.parallel.pipeline import relayout_qkv

    mesh = make_mesh(dp=1, fsdp=1, tp=2, pp=2, devices=jax.devices()[:4])
    params = shard_params_pp(_params(), mesh, tp=True)
    M, mb, T = 3, 2, 12
    idx = jnp.asarray(rng.integers(0, 96, (M, mb, T)), jnp.int32)
    got = np.asarray(pipeline_forward(params, idx, CFG, mesh, "pp", False, "tp"))
    want = np.asarray(llama.forward(_params(), idx.reshape(M * mb, T), CFG))
    np.testing.assert_allclose(got.reshape(M * mb, T, -1), want, atol=2e-4, rtol=2e-4)


def test_pp_tp_dp_forward(rng):
    """Full 3-way composition: dp=2 × tp=2 × pp=2 on 8 virtual devices."""
    mesh = make_mesh(dp=2, fsdp=1, tp=2, pp=2)
    params = shard_params_pp(_params(), mesh, tp=True)
    M, mb, T = 2, 4, 8
    idx = jnp.asarray(rng.integers(0, 96, (M, mb, T)), jnp.int32)
    got = np.asarray(pipeline_forward(params, idx, CFG, mesh, "pp", False, "tp"))
    want = np.asarray(llama.forward(_params(), idx.reshape(M * mb, T), CFG))
    np.testing.assert_allclose(got.reshape(M * mb, T, -1), want, atol=2e-4, rtol=2e-4)


def test_pp_tp_train_step_matches_single_device(rng):
    mesh = make_mesh(dp=1, fsdp=1, tp=2, pp=2, devices=jax.devices()[:4])
    opt = optax.adamw(1e-3, b1=0.9, b2=0.95, weight_decay=0.1)
    M, mb, T = 4, 2, 12
    batch = jnp.asarray(rng.integers(0, 96, (M, mb, T + 1)), jnp.int32)

    params_pp = shard_params_pp(_params(), mesh, tp=True)
    opt_state = opt.init(params_pp)
    step_pp = make_pp_train_step(CFG, opt, mesh, tp_axis="tp").jit_with(params_pp)
    new_pp, _, loss_pp = step_pp(params_pp, opt_state, batch)

    params_ref = _params()
    step_ref = jax.jit(make_train_step(CFG, opt))
    new_ref, _, loss_ref = step_ref(params_ref, opt.init(params_ref), batch)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), atol=1e-5, rtol=1e-5)
    # compare the qkv leaf through the relayout and one ordinary leaf
    want_qkv = np.asarray(new_ref["blocks"]["attn"]["c_attn"]["weight"])
    got_qkv = np.asarray(new_pp["blocks"]["attn"]["c_attn"]["weight"]).reshape(
        want_qkv.shape
    )
    np.testing.assert_allclose(got_qkv, want_qkv, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(new_pp["blocks"]["mlp"]["c_proj"]["weight"]),
        np.asarray(new_ref["blocks"]["mlp"]["c_proj"]["weight"]),
        atol=2e-4, rtol=2e-3,
    )
