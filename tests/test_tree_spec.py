"""Tree-speculative serving tests.

Load-bearing properties:
  * temperature=0 → outputs bitwise identical to the plain PagedEngine for
    every tree shape (the acceptance walk reduces to exact argmax matching,
    and the committed-path KV must reproduce the plain engine's cache);
  * temperature>0 → the first emitted token of a round follows the TARGET
    distribution exactly (Monte-Carlo test on the walk in isolation).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import PagedEngine
from lit_llama_ja_tpu.infer.tree_spec import (
    TreeSpeculativePagedEngine,
    tree_accept_walk,
    tree_topology,
)
from lit_llama_ja_tpu.models.llama import init_params

TCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=2, n_head=4, n_embd=32)
DCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=1, n_head=2, n_embd=16)


@pytest.fixture(scope="module")
def target():
    return init_params(jax.random.PRNGKey(0), TCFG)


@pytest.fixture(scope="module")
def draft():
    return init_params(jax.random.PRNGKey(1), DCFG)


def _tree(target, draft, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("n_pages", 48)
    kw.setdefault("page_size", 4)
    kw.setdefault("tree", (2, 2))
    return TreeSpeculativePagedEngine(
        target, TCFG, draft_params=draft, draft_config=DCFG, **kw
    )


def _plain(target, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("n_pages", 48)
    kw.setdefault("page_size", 4)
    return PagedEngine(target, TCFG, **kw)


def test_topology_shapes():
    t = tree_topology((4, 2, 2))
    assert t["n_nodes"] == 1 + 4 + 8 + 16
    assert t["depth"] == 3 and t["c_max"] == 4
    # every non-root node's ancestor set: itself + parents up to root
    assert t["anc"][0].sum() == 1
    leaf = t["levels"][3][0]
    assert t["anc"][leaf].sum() == 4  # self + 3 ancestors
    assert t["anc"][leaf, 0]


def test_greedy_matches_plain_engine(target, draft, rng):
    prompts = [
        rng.integers(0, 64, size=(n,)).astype(np.int32) for n in (5, 9, 3)
    ]
    want = _plain(target).run([(p, 12) for p in prompts])
    got = _tree(target, draft).run([(p, 12) for p in prompts])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


@pytest.mark.parametrize("tree", [(1,), (3,), (2, 2), (2, 1, 1), (4, 2)])
@pytest.mark.slow
def test_greedy_matches_across_tree_shapes(target, draft, rng, tree):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = _plain(target).run([(prompt, 15)])
    got = _tree(target, draft, tree=tree).run([(prompt, 15)])
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.slow
def test_exact_lengths_and_budget(target, draft, rng):
    prompt = rng.integers(0, 64, size=(4,)).astype(np.int32)
    for mnt in (1, 2, 7):
        out = _tree(target, draft, tree=(2, 2, 2)).run([(prompt, mnt)])
        assert len(out[0]) == len(prompt) + mnt


def test_eos_stops_mid_round(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    ref = _plain(target).run([(prompt, 12)])[0]
    eos = int(ref[len(prompt) + 2])
    eng = _tree(target, draft, tree=(2, 2, 2), eos_id=eos)
    out = eng.run([(prompt, 12)])
    assert out[0][-1] == eos
    assert len(out[0]) == len(prompt) + 3


@pytest.mark.slow
def test_self_draft_full_acceptance(target, rng):
    """Draft == target: the top-1 child is always accepted, so every round
    emits depth+1 tokens and outputs stay exact."""
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    want = _plain(target).run([(prompt, 12)])
    eng = TreeSpeculativePagedEngine(
        target, TCFG, draft_params=target, draft_config=TCFG,
        max_batch=2, n_pages=48, page_size=4, tree=(2, 2),
    )
    got = eng.run([(prompt, 12)])
    np.testing.assert_array_equal(got[0], want[0])
    st = eng.stats()
    assert st["acceptance_rate"] == 1.0


def test_prefix_sharing_composes(target, draft, rng):
    prefix = rng.integers(0, 64, size=(9,)).astype(np.int32)
    cont = rng.integers(0, 64, size=(4,)).astype(np.int32)
    plain = _plain(target)
    pid_p = plain.register_prefix(prefix)
    want = plain.run([(cont, 8)], prefix_id=pid_p)
    eng = _tree(target, draft)
    pid = eng.register_prefix(prefix)
    got = eng.run([(cont, 8)], prefix_id=pid)
    np.testing.assert_array_equal(got[0], want[0])


def test_chunked_prefill_composes(target, draft, rng):
    prompt = rng.integers(0, 64, size=(21,)).astype(np.int32)
    want = _plain(target).run([(prompt, 8)])
    got = _tree(target, draft, prefill_chunk=8).run([(prompt, 8)])
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.parametrize("qkv", [True, "int4"])
@pytest.mark.slow
def test_quantized_kv_pool_greedy_match(target, draft, rng, qkv):
    """The commit path quantizes the accepted tree K/V with the same math the
    plain engine's write path uses — greedy streams must stay identical."""
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = _plain(target, quantize_kv=qkv).run([(prompt, 10)])
    got = _tree(target, draft, quantize_kv=qkv).run([(prompt, 10)])
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.slow
def test_sampling_smoke(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    out = _tree(target, draft, tree=(3, 2)).run(
        [(prompt, 10)], temperature=0.8, top_k=20, top_p=0.95
    )
    assert len(out[0]) == len(prompt) + 10
    assert (out[0] >= 0).all() and (out[0] < 64).all()


@pytest.mark.slow
def test_walk_preserves_target_distribution(rng):
    """Monte-Carlo exactness of the recursive rejection walk: whatever the
    draft proposes, the FIRST emitted token of a round must be distributed as
    the target's root distribution."""
    V, B = 8, 1
    branching = (2, 2)
    topo = tree_topology(branching)
    NT = topo["n_nodes"]
    r = np.random.default_rng(7)
    p_root = r.dirichlet(np.ones(V)).astype(np.float32)
    q_node = r.dirichlet(np.ones(V), size=NT).astype(np.float32)
    p_all = np.broadcast_to(p_root, (B, NT, V)).copy()
    # make deeper target dists arbitrary — only the root's matters here
    p_all[:, 1:] = r.dirichlet(np.ones(V), size=NT - 1)
    q_all = q_node[None]
    temps = jnp.ones(B)

    def one_round(key):
        ks, kw = jax.random.split(key)
        # draft children sampled i.i.d. from their parent's q (parent-major)
        toks = jnp.zeros((B, NT), jnp.int32)
        parent = topo["parents"]
        draws = jax.random.categorical(
            ks, jnp.log(jnp.asarray(q_node[parent[1:]]) + 1e-30)[None], axis=-1
        ).astype(jnp.int32)  # (B, NT-1)
        toks = toks.at[:, 1:].set(draws)
        out, n_out, _, _ = tree_accept_walk(
            jnp.asarray(p_all), jnp.asarray(q_all), toks, branching, kw, temps
        )
        return out[0, 0]

    n = 20000
    first = jax.vmap(one_round)(jax.random.split(jax.random.PRNGKey(3), n))
    counts = np.bincount(np.asarray(first), minlength=V)
    emp = counts / n
    # generous 5-sigma binomial tolerance per bucket
    tol = 5 * np.sqrt(p_root * (1 - p_root) / n) + 1e-3
    assert (np.abs(emp - p_root) < tol).all(), (emp, p_root)


def test_telemetry(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    eng = _tree(target, draft, tree=(2, 2))
    eng.run([(prompt, 9)])
    st = eng.stats()
    assert st["spec_rounds"] >= 1
    assert 0.0 <= st["acceptance_rate"] <= 1.0
    assert st["tokens_per_round"] >= 1.0
