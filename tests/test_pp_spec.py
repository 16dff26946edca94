"""Speculative serving over a pipeline-parallel mesh (simulated devices).

Load-bearing property: the pp speculative engine emits the EXACT token
streams of (a) the single-mesh speculative engine and (b) at temperature 0
the plain engine — the verify wavefront is the same paged program with the
layer axis sharded, and the rejection math is the shared single-mesh code."""
import numpy as np
import jax
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import PagedEngine
from lit_llama_ja_tpu.infer.spec_serving import SpeculativePagedEngine
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.parallel.mesh import make_mesh

TCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=4, n_head=4, n_embd=32)
DCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=1, n_head=2, n_embd=16)
KW = dict(max_batch=4, n_pages=64, page_size=4)


@pytest.fixture(scope="module")
def target():
    return init_params(jax.random.PRNGKey(0), TCFG)


@pytest.fixture(scope="module")
def draft():
    return init_params(jax.random.PRNGKey(1), DCFG)


def _pp_spec(target, draft, pp=2, **kw):
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=pp, devices=jax.devices()[:pp])
    kw = {**KW, **kw}
    kw.setdefault("pp_microbatches", 2)
    return SpeculativePagedEngine(
        target, TCFG, draft_params=draft, draft_config=DCFG,
        pp_mesh=mesh, **kw,
    )


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_spec_matches_single_mesh(target, draft, rng, pp):
    prompts = [
        rng.integers(0, 64, size=(n,)).astype(np.int32) for n in (5, 9, 3)
    ]
    reqs = [(p, 12) for p in prompts]
    want = SpeculativePagedEngine(
        target, TCFG, draft_params=draft, draft_config=DCFG, draft_k=3, **KW
    ).run(reqs)
    got = _pp_spec(target, draft, pp=pp, draft_k=3).run(reqs)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_pp_spec_greedy_matches_plain(target, draft, rng):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = PagedEngine(target, TCFG, **KW).run([(prompt, 14)])
    got = _pp_spec(target, draft, draft_k=4).run([(prompt, 14)])
    np.testing.assert_array_equal(got[0], want[0])


def test_pp_spec_quantized_kv(target, draft, rng):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = PagedEngine(target, TCFG, quantize_kv=True, **KW).run([(prompt, 10)])
    got = _pp_spec(target, draft, draft_k=3, quantize_kv=True).run(
        [(prompt, 10)]
    )
    np.testing.assert_array_equal(got[0], want[0])


def test_pp_spec_adaptive_k(target, draft, rng):
    """adaptive_k recompiles per K — each K gets its own pp round program."""
    prompts = [rng.integers(0, 64, size=(5,)).astype(np.int32)] * 2
    eng = _pp_spec(target, draft, draft_k=4, adaptive_k=True, k_min=1)
    out = eng.run([(p, 16) for p in prompts])
    assert all(len(v) == 5 + 16 for v in out.values())
    st = eng.stats()
    assert 1 <= st["draft_k"] <= 4


def test_pp_spec_sampling_smoke(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    out = _pp_spec(target, draft, draft_k=3).run(
        [(prompt, 10)], temperature=0.8, top_k=20, top_p=0.95
    )
    assert len(out[0]) == len(prompt) + 10
    assert (out[0] >= 0).all() and (out[0] < 64).all()


# --------------------------------------------------------------------------
# tree speculation over pp (parallel/pp_spec.make_pp_tree_round)
# --------------------------------------------------------------------------
def _pp_tree(target, draft, pp=2, **kw):
    from lit_llama_ja_tpu.infer.tree_spec import TreeSpeculativePagedEngine

    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=pp, devices=jax.devices()[:pp])
    kw = {**KW, **kw}
    kw.setdefault("pp_microbatches", 2)
    return TreeSpeculativePagedEngine(
        target, TCFG, draft_params=draft, draft_config=DCFG,
        pp_mesh=mesh, **kw,
    )


@pytest.mark.parametrize("pp,tree", [(2, (2, 2)), (4, (3, 1))])
def test_pp_tree_matches_single_mesh(target, draft, rng, pp, tree):
    from lit_llama_ja_tpu.infer.tree_spec import TreeSpeculativePagedEngine

    prompts = [
        rng.integers(0, 64, size=(n,)).astype(np.int32) for n in (5, 9, 3)
    ]
    reqs = [(p, 12) for p in prompts]
    want = TreeSpeculativePagedEngine(
        target, TCFG, draft_params=draft, draft_config=DCFG, tree=tree, **KW
    ).run(reqs)
    got = _pp_tree(target, draft, pp=pp, tree=tree).run(reqs)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_pp_tree_greedy_matches_plain(target, draft, rng):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = PagedEngine(target, TCFG, **KW).run([(prompt, 14)])
    got = _pp_tree(target, draft, tree=(2, 2, 2)).run([(prompt, 14)])
    np.testing.assert_array_equal(got[0], want[0])


def test_pp_tree_quantized_kv(target, draft, rng):
    prompt = rng.integers(0, 64, size=(7,)).astype(np.int32)
    want = PagedEngine(target, TCFG, quantize_kv=True, **KW).run([(prompt, 10)])
    got = _pp_tree(target, draft, tree=(2, 2), quantize_kv=True).run(
        [(prompt, 10)]
    )
    np.testing.assert_array_equal(got[0], want[0])


def test_pp_tree_sampling_smoke(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    eng = _pp_tree(target, draft, tree=(2, 2))
    out = eng.run([(prompt, 8)], temperature=0.8, top_k=20)
    assert len(out[0]) >= len(prompt) + 1
    assert (out[0] >= 0).all() and (out[0] < 64).all()


def test_pp_tree_pp_split_false(target, draft, rng):
    """Regression (ADVICE r1): tree engine + pp_mesh + pp_split=False must not
    overload the base engine's _pp_commit — the fused 2-tuple prefill program
    would then be unpacked as the 4-tuple two-dispatch one at first prefill."""
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = PagedEngine(target, TCFG, **KW).run([(prompt, 14)])
    got = _pp_tree(target, draft, tree=(2, 2), pp_split=False).run(
        [(prompt, 14)]
    )
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.parametrize("engine_kind", ["chain", "tree"])
def test_pp_tp_speculative_matches_single_mesh(target, draft, rng, engine_kind):
    """Speculative engines on a pp × tp mesh (in-stage GSPMD tensor
    parallelism, round 3): bitwise vs the single-device engine for chain and
    tree verification."""
    prompts = [rng.integers(0, 64, size=(n,)).astype(np.int32) for n in (5, 9)]
    reqs = [(p, 10) for p in prompts]
    mesh = make_mesh(dp=1, fsdp=1, tp=2, pp=2, devices=jax.devices()[:4])
    if engine_kind == "chain":
        from lit_llama_ja_tpu.infer.spec_serving import SpeculativePagedEngine

        want = SpeculativePagedEngine(
            target, TCFG, draft_params=draft, draft_config=DCFG, draft_k=3, **KW
        ).run(reqs)
        got = SpeculativePagedEngine(
            target, TCFG, draft_params=draft, draft_config=DCFG, draft_k=3,
            pp_mesh=mesh, pp_microbatches=2, **KW
        ).run(reqs)
    else:
        from lit_llama_ja_tpu.infer.tree_spec import TreeSpeculativePagedEngine

        want = TreeSpeculativePagedEngine(
            target, TCFG, draft_params=draft, draft_config=DCFG, tree=(2, 2), **KW
        ).run(reqs)
        got = TreeSpeculativePagedEngine(
            target, TCFG, draft_params=draft, draft_config=DCFG, tree=(2, 2),
            pp_mesh=mesh, pp_microbatches=2, **KW
        ).run(reqs)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
