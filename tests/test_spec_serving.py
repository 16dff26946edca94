"""Batched speculative serving tests.

Load-bearing property: with temperature=0 the speculative engine's outputs are
bitwise identical to the plain PagedEngine's, regardless of the draft model —
the batched rejection chain preserves the target distribution per slot."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import PagedEngine
from lit_llama_ja_tpu.infer.spec_serving import SpeculativePagedEngine
from lit_llama_ja_tpu.models.llama import init_params

TCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=2, n_head=4, n_embd=32)
DCFG = LLaMAConfig(block_size=96, vocab_size=64, n_layer=1, n_head=2, n_embd=16)


@pytest.fixture(scope="module")
def target():
    return init_params(jax.random.PRNGKey(0), TCFG)


@pytest.fixture(scope="module")
def draft():
    return init_params(jax.random.PRNGKey(1), DCFG)


def _spec(target, draft, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("n_pages", 48)
    kw.setdefault("page_size", 4)
    return SpeculativePagedEngine(
        target, TCFG, draft_params=draft, draft_config=DCFG, **kw
    )


def _plain(target, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("n_pages", 48)
    kw.setdefault("page_size", 4)
    return PagedEngine(target, TCFG, **kw)


def test_greedy_matches_plain_engine(target, draft, rng):
    prompts = [
        rng.integers(0, 64, size=(n,)).astype(np.int32) for n in (5, 9, 3)
    ]
    want = _plain(target).run([(p, 12) for p in prompts])
    got = _spec(target, draft, draft_k=3).run([(p, 12) for p in prompts])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


@pytest.mark.parametrize("K", [1, 4])
def test_greedy_matches_across_k(target, draft, rng, K):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    want = _plain(target).run([(prompt, 15)])
    got = _spec(target, draft, draft_k=K).run([(prompt, 15)])
    np.testing.assert_array_equal(got[0], want[0])


def test_exact_lengths_and_budget(target, draft, rng):
    """A round can overshoot max_new_tokens by up to K; emission must not."""
    prompt = rng.integers(0, 64, size=(4,)).astype(np.int32)
    for mnt in (1, 2, 7):
        out = _spec(target, draft, draft_k=4).run([(prompt, mnt)])
        assert len(out[0]) == len(prompt) + mnt


def test_eos_stops_mid_round(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    ref = _plain(target).run([(prompt, 12)])[0]
    eos = int(ref[len(prompt) + 2])
    eng = _spec(target, draft, draft_k=4, eos_id=eos)
    out = eng.run([(prompt, 12)])
    assert out[0][-1] == eos
    assert len(out[0]) == len(prompt) + 3


def test_self_draft_matches_plain(target, rng):
    """Draft == target: everything accepted, outputs still exact."""
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    want = _plain(target).run([(prompt, 10)])
    eng = SpeculativePagedEngine(
        target, TCFG, draft_params=target, draft_config=TCFG,
        max_batch=2, n_pages=48, page_size=4, draft_k=4,
    )
    got = eng.run([(prompt, 10)])
    np.testing.assert_array_equal(got[0], want[0])


def test_prefix_sharing_composes(target, draft, rng):
    prefix = rng.integers(0, 64, size=(9,)).astype(np.int32)
    cont = rng.integers(0, 64, size=(4,)).astype(np.int32)
    plain = _plain(target)
    pid_p = plain.register_prefix(prefix)
    want = plain.run([(cont, 8)], prefix_id=pid_p)
    eng = _spec(target, draft, draft_k=3)
    pid = eng.register_prefix(prefix)
    got = eng.run([(cont, 8)], prefix_id=pid)
    np.testing.assert_array_equal(got[0], want[0])


def test_chunked_prefill_composes(target, draft, rng):
    prompt = rng.integers(0, 64, size=(21,)).astype(np.int32)
    want = _plain(target).run([(prompt, 8)])
    got = _spec(target, draft, draft_k=3, prefill_chunk=8).run([(prompt, 8)])
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.slow
def test_sampling_smoke(target, draft, rng):
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    out = _spec(target, draft, draft_k=3).run(
        [(prompt, 10)], temperature=0.8, top_k=20, top_p=0.95
    )
    assert len(out[0]) == len(prompt) + 10
    assert (out[0] >= 0).all() and (out[0] < 64).all()


def test_pages_freed_after_run(target, draft, rng):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    eng = _spec(target, draft, draft_k=3)
    full = len(eng.free)
    eng.run([(prompt, 8)])
    assert len(eng.free) == full


def test_acceptance_telemetry(target, draft, rng):
    prompt = rng.integers(0, 64, size=(6,)).astype(np.int32)
    eng = _spec(target, draft, draft_k=3)
    eng.run([(prompt, 10)])
    s = eng.stats()
    assert s["spec_rounds"] > 0
    assert s["tokens_drafted"] == 3 * s["spec_rounds"]
    assert 0.0 <= s["acceptance_rate"] <= 1.0
    assert 0.0 <= s["acceptance_ema"] <= 1.0
    # one slot was used; its per-slot rate matches the aggregate
    rates = [r for r in s["per_slot_acceptance"] if r is not None]
    assert len(rates) == 1
    assert abs(rates[0] - s["acceptance_rate"]) < 1e-9


def test_self_draft_telemetry_all_accepted(target, rng):
    """Draft == target with greedy sampling: every draft token accepted."""
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    eng = SpeculativePagedEngine(
        target, TCFG, draft_params=target, draft_config=TCFG,
        max_batch=2, n_pages=48, page_size=4, draft_k=4,
    )
    eng.run([(prompt, 12)])
    s = eng.stats()
    assert s["acceptance_rate"] == 1.0


def test_pick_k_monotone_in_acceptance(target, draft):
    """Higher acceptance must never pick a smaller K; extremes hit the ends."""
    eng = _spec(target, draft, draft_k=16, adaptive_k=True, k_min=1)
    best = lambda a: max(
        eng._k_ladder, key=lambda k: eng._predicted_rate(a, k)
    )
    picks = [best(a) for a in (0.0, 0.2, 0.5, 0.8, 0.95, 1.0)]
    assert picks == sorted(picks)
    assert picks[0] == 1          # useless draft -> minimum K
    assert picks[-1] == 16        # perfect draft -> maximum K


def test_pick_k_hysteresis(target, draft):
    """_pick_k stays put unless the predicted gain exceeds 3%."""
    eng = _spec(target, draft, draft_k=8, adaptive_k=True, k_min=1)
    eng.K = 4
    # acceptance where K=4 and its ladder neighbors predict nearly the same
    # rate: find an alpha whose best-K gain over K=4 is under the threshold
    for alpha in np.linspace(0.0, 1.0, 101):
        best = max(eng._k_ladder, key=lambda k: eng._predicted_rate(alpha, k))
        gain = eng._predicted_rate(alpha, best) / eng._predicted_rate(alpha, 4)
        if best != 4 and gain < 1.03:
            assert eng._pick_k(float(alpha)) == 4
            break
    else:
        pytest.skip("no sub-threshold alpha on this ladder/cost")


def test_adaptive_k_matches_plain_engine(target, draft, rng):
    """Exactness is K-independent, so it must survive K changing mid-run."""
    prompts = [
        rng.integers(0, 64, size=(n,)).astype(np.int32) for n in (5, 9)
    ]
    want = _plain(target).run([(p, 14) for p in prompts])
    eng = _spec(
        target, draft, draft_k=4, adaptive_k=True, k_min=1, k_ema_decay=0.0
    )
    got = eng.run([(p, 14) for p in prompts])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


@pytest.mark.slow
def test_adaptive_k_grows_on_perfect_draft(target, rng):
    """Self-draft (acceptance 1.0) should drive K up from k_min."""
    prompt = rng.integers(0, 64, size=(5,)).astype(np.int32)
    eng = SpeculativePagedEngine(
        target, TCFG, draft_params=target, draft_config=TCFG,
        max_batch=2, n_pages=48, page_size=4,
        draft_k=8, adaptive_k=True, k_min=1, k_ema_decay=0.0,
    )
    eng.K = 1  # start at the bottom of the ladder
    eng.run([(prompt, 24)])
    assert eng.K > 1
    assert eng.stats()["draft_k"] == eng.K
