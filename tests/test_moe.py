"""MoE model family + expert parallelism (models/moe.py, parallel/ep.py).

The reference has no MoE (SURVEY.md §2.3); these are beyond-reference
capability tests following the repo's strategy: NumPy-oracle parity for the
routing math, single-device vs ep-sharded parity on the 8-virtual-device CPU
mesh, and train-step equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lit_llama_ja_tpu.models import moe as moe_mod
from lit_llama_ja_tpu.models.moe import (
    MoEConfig,
    forward_moe,
    forward_moe_with_cache,
    init_moe_params,
    moe_loss,
    moe_mlp,
    route_tokens,
)
from lit_llama_ja_tpu.models.llama import init_kv_cache
from lit_llama_ja_tpu.parallel.ep import (
    ep_param_specs,
    forward_moe_ep,
    make_moe_train_step_ep,
    shard_params_ep,
)
from lit_llama_ja_tpu.parallel.mesh import make_mesh


CFG = MoEConfig(
    block_size=16, vocab_size=96, n_layer=2, n_head=2, n_embd=16,
    n_expert=8, n_expert_active=2, capacity_factor=8.0,  # ample → no drops
)


def _params(key=0, dtype=jnp.float32):
    return init_moe_params(jax.random.PRNGKey(key), CFG, dtype)


# ---------------------------------------------------------------------------
# Routing oracle
# ---------------------------------------------------------------------------

def test_route_tokens_matches_numpy_oracle(rng):
    N, D, E, k, C = 12, 8, 4, 2, 6
    router = jnp.asarray(rng.normal(size=(D, E)), jnp.float32)
    xf = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    gate, expert, pos, keep, stats = jax.jit(route_tokens, static_argnums=(2, 3))(
        router, xf, k, C
    )
    aux = moe_mod.finalize_aux(stats)
    gate, expert, pos, keep = map(np.asarray, (gate, expert, pos, keep))

    probs = np.asarray(jax.nn.softmax(xf @ router, axis=-1))
    counts = np.zeros(E, np.int64)
    # k-major claim order: all primaries first, then secondaries
    exp_pos = np.zeros((N, k), np.int64)
    for kk in range(k):
        for n in range(N):
            order = np.argsort(-probs[n])
            e = order[kk]
            assert expert[n, kk] == e
            exp_pos[n, kk] = counts[e]
            counts[e] += 1
    np.testing.assert_array_equal(pos, exp_pos)
    np.testing.assert_array_equal(keep, exp_pos < C)
    # gates renormalize the selected probs
    sel = np.take_along_axis(probs, expert, axis=1)
    np.testing.assert_allclose(gate, sel / sel.sum(1, keepdims=True), rtol=1e-5)
    # balanced-ish random routing: load_balance near 1, dropped fraction matches
    assert 0.5 < float(aux["load_balance"]) < 2.0
    assert float(aux["dropped"]) == pytest.approx(1.0 - keep.mean(), abs=1e-6)


def test_moe_mlp_matches_per_token_loop(rng):
    """Dispatch/einsum/combine == looping tokens through their experts."""
    B, T = 2, 6
    cfg = CFG
    params = _params()
    layer0 = jax.tree.map(lambda a: a[0], params["blocks"]["moe"])
    x = jnp.asarray(rng.normal(size=(B, T, cfg.n_embd)), jnp.float32)

    y, aux = jax.jit(moe_mlp, static_argnums=(2,))(layer0, x, cfg)
    assert float(aux["dropped"]) == pytest.approx(0.0, abs=1e-6)

    xf = np.asarray(x.reshape(-1, cfg.n_embd))
    router = np.asarray(layer0["router"]["weight"])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(xf @ router), axis=-1))
    w1, w2, wp = (
        np.asarray(layer0["c_fc1"]["weight"]),
        np.asarray(layer0["c_fc2"]["weight"]),
        np.asarray(layer0["c_proj"]["weight"]),
    )

    def silu(v):
        return v / (1 + np.exp(-v))

    want = np.zeros_like(xf)
    for n in range(xf.shape[0]):
        order = np.argsort(-probs[n])[: cfg.n_expert_active]
        sel = probs[n][order]
        sel = sel / sel.sum()
        for g, e in zip(sel, order):
            h = silu(xf[n] @ w1[e]) * (xf[n] @ w2[e])
            want[n] += g * (h @ wp[e])
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1, cfg.n_embd), want, rtol=2e-4, atol=2e-5
    )


def test_capacity_overflow_drops_and_stays_finite(rng):
    cfg = CFG.replace(capacity_factor=0.25)  # force congestion
    params = _params()
    layer0 = jax.tree.map(lambda a: a[0], params["blocks"]["moe"])
    x = jnp.asarray(rng.normal(size=(4, 8, cfg.n_embd)), jnp.float32)
    y, aux = jax.jit(moe_mlp, static_argnums=(2,))(layer0, x, cfg)
    assert float(aux["dropped"]) > 0.0
    assert bool(jnp.all(jnp.isfinite(y)))


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def test_forward_moe_shapes_and_aux():
    params = _params()
    idx = jnp.ones((2, 8), jnp.int32)
    logits, aux = forward_moe(params, idx, CFG)
    assert logits.shape == (2, 8, CFG.padded_vocab_size)
    for k in ("load_balance", "router_z", "dropped"):
        assert np.isfinite(float(aux[k]))
    total, parts = moe_loss(params, idx, idx, CFG)
    assert np.isfinite(float(total)) and float(parts["ce"]) > 0


def test_cached_decode_matches_full_forward(rng):
    """Greedy decode through the KV cache reproduces the full forward's
    logits (ample capacity → no routing drops on either path)."""
    params = _params()
    T = 7
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, T)), jnp.int32)
    full, _ = forward_moe(params, idx, CFG)

    cache = init_kv_cache(CFG, 1, CFG.block_size)
    logits_p, cache = forward_moe_with_cache(
        params, idx[:, :3], jnp.arange(3), cache, CFG
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, :3]), rtol=1e-4, atol=1e-5
    )
    for t in range(3, T):
        step, cache = forward_moe_with_cache(
            params, idx[:, t : t + 1], jnp.asarray([t]), cache, CFG
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]), rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# Expert parallelism on the virtual mesh
# ---------------------------------------------------------------------------

def test_ep_specs_shard_only_expert_leaves():
    params = _params()
    specs = ep_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    from jax.sharding import PartitionSpec as P

    for path, s in flat:
        keys = [str(getattr(p, "key", "")) for p in path]
        if "moe" in keys and any(k in ("c_fc1", "c_fc2", "c_proj") for k in keys):
            assert s == P(None, "ep"), keys
        else:
            assert s == P(), keys


def test_forward_ep_matches_single_device(rng):
    mesh = make_mesh(ep=4, devices=jax.devices()[:4])
    params = _params()
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(4, 8)), jnp.int32)

    ref, ref_aux = forward_moe(params, idx, CFG)
    sharded = shard_params_ep(params, mesh)
    got, aux = forward_moe_ep(sharded, idx, CFG, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
    assert float(aux["dropped"]) == pytest.approx(0.0, abs=1e-6)
    # global aux equals the single-device value when nothing drops
    np.testing.assert_allclose(
        float(aux["load_balance"]), float(ref_aux["load_balance"]), rtol=1e-4
    )


def test_ep_train_step_matches_single_device(rng):
    mesh = make_mesh(ep=4, devices=jax.devices()[:4])
    params = _params()
    batch = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(4, 9)), jnp.int32)
    opt = optax.adamw(1e-3)

    # single-device reference step
    def ref_loss(p):
        return moe_loss(p, batch[:, :-1], batch[:, 1:], CFG)[0]

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    upd, _ = opt.update(ref_g, opt.init(params), params)
    ref_p = optax.apply_updates(params, upd)

    sharded = shard_params_ep(params, mesh)
    step = make_moe_train_step_ep(CFG, opt, mesh).jit_with(sharded)
    new_p, _, loss = step(sharded, opt.init(sharded), batch)

    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for path in (
        ("blocks", "moe", "c_fc1", "weight"),
        ("blocks", "attn", "c_attn", "weight"),
        ("lm_head", "weight"),
        # the replicated router weight: its grad flows through the pmean'd
        # load-balance stats and the top_k/scatter routing path — the leaf
        # most likely to silently diverge under the shard_map transpose
        ("blocks", "moe", "router", "weight"),
    ):
        a = ref_p
        b = new_p
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_moe_train_step_fsdp_tp_mesh(rng):
    """`make_moe_train_step` runs sharded on a dp×fsdp×tp mesh (experts shard
    E over fsdp, hidden over tp via specs.PARAM_RULES) and matches the
    unsharded step."""
    from lit_llama_ja_tpu.models.moe import make_moe_train_step
    from lit_llama_ja_tpu.parallel.specs import shard_params
    from lit_llama_ja_tpu.train.step import jit_train_step, make_adamw

    opt = make_adamw(lambda _: 1e-3, grad_clip=None)
    step_fn = make_moe_train_step(CFG, opt)
    batch = jnp.asarray(
        rng.integers(0, CFG.vocab_size, size=(1, 4, CFG.block_size + 1)), jnp.int32
    )

    params = _params()
    ref_p, _, ref_loss = jax.jit(step_fn)(params, opt.init(params), batch)

    mesh = make_mesh(dp=1, fsdp=2, tp=2, devices=jax.devices()[:4])
    sp = shard_params(_params(), mesh)
    step = jit_train_step(step_fn, mesh=mesh, params=sp)
    new_p, _, loss = step(sp, opt.init(sp), batch)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_p["blocks"]["moe"]["c_fc1"]["weight"]),
        np.asarray(ref_p["blocks"]["moe"]["c_fc1"]["weight"]),
        rtol=2e-4, atol=2e-5,
    )


def test_moe_checkpoint_config_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint preserve the MoEConfig subclass and
    its expert fields (config.json carries n_expert etc.)."""
    from lit_llama_ja_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    params = _params()
    save_checkpoint(tmp_path / "ckpt", params, CFG)
    loaded, cfg = load_checkpoint(tmp_path / "ckpt", template=params)
    assert isinstance(cfg, MoEConfig)
    assert cfg == CFG
    np.testing.assert_array_equal(
        np.asarray(loaded["blocks"]["moe"]["c_fc1"]["weight"]),
        np.asarray(params["blocks"]["moe"]["c_fc1"]["weight"]),
    )


def test_generate_with_moe_config(rng):
    """`infer/generate.generate` dispatches to the MoE cached forward when the
    config is an MoEConfig — MoE checkpoints generate through the standard
    CLI path. Greedy output must match teacher-forced argmax of the full
    forward."""
    from lit_llama_ja_tpu.infer.generate import generate

    params = _params()
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(5,)), jnp.int32)
    out = generate(params, CFG, prompt, 4, temperature=0.0)

    seq = list(np.asarray(prompt))
    for _ in range(4):
        logits, _ = forward_moe(params, jnp.asarray([seq], jnp.int32), CFG)
        seq.append(int(np.asarray(logits)[0, -1].argmax()))
    np.testing.assert_array_equal(out, np.asarray(seq, out.dtype))


def test_moe_paged_engine_matches_generate(rng):
    """The paged serving engine serves MoE checkpoints: greedy token streams
    bitwise match `infer/generate.generate` on the same MoE model (routing is
    per-token, orthogonal to the page pool)."""
    from lit_llama_ja_tpu.infer.generate import generate
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    params = _params()
    prompts = [
        jnp.asarray(rng.integers(0, CFG.vocab_size, size=(n,)), jnp.int32)
        for n in (5, 3)
    ]
    want = [
        generate(params, CFG, p, 4, temperature=0.0).tolist() for p in prompts
    ]

    eng = PagedEngine(params, CFG, max_batch=2, n_pages=24, page_size=4)
    out = eng.run([(np.asarray(p), 4) for p in prompts])
    got = [out[rid].tolist() for rid in sorted(out)]
    assert got == want
