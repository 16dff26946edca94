"""Paged KV-cache engine tests: exact parity with `generate`, page-crossing,
pool backpressure, prefix sharing, preemption-and-resume, page accounting."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.generate import generate
from lit_llama_ja_tpu.infer.paged import PagedEngine, init_page_pool, paged_forward
from lit_llama_ja_tpu.models.llama import init_params

CFG = LLaMAConfig(block_size=64, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


@pytest.fixture(scope="module")
def model():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_single_request_matches_generate(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(6,)).astype(np.int32)
    want = generate(model, CFG, jnp.asarray(prompt), 8, temperature=0.0)
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=32, page_size=4)
    out = eng.run([(prompt, 8)])
    np.testing.assert_array_equal(out[0], np.asarray(want))


def test_batched_page_crossing_matches_individual(model, rng):
    """Small pages force mid-decode page-boundary crossings for every slot."""
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (4, 7, 5)
    ]
    singles = [
        np.asarray(generate(model, CFG, jnp.asarray(p), 9, temperature=0.0))
        for p in prompts
    ]
    eng = PagedEngine(model, CFG, max_batch=3, n_pages=32, page_size=4)
    outs = eng.run([(p, 9) for p in prompts])
    for rid, want in enumerate(singles):
        np.testing.assert_array_equal(outs[rid], want)


def test_queue_drains_through_small_pool(model, rng):
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
        for _ in range(5)
    ]
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=9, page_size=4)
    outs = eng.run([(p, 4) for p in prompts])
    assert len(outs) == 5
    for rid, p in enumerate(prompts):
        assert len(outs[rid]) == len(p) + 4
        np.testing.assert_array_equal(outs[rid][: len(p)], p)


def test_pages_freed_on_retire(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(6,)).astype(np.int32)
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=16, page_size=4)
    full = len(eng.free)
    eng.run([(prompt, 5)])
    assert len(eng.free) == full
    assert (eng.page_refs[1:] == 0).all()


def test_quantized_paged_engine(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(5,)).astype(np.int32)
    eng = PagedEngine(
        model, CFG, max_batch=2, n_pages=32, page_size=4, quantize_kv=True
    )
    out = eng.run([(prompt, 6)])
    assert len(out[0]) == len(prompt) + 6


def test_eos_retires_and_frees(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
    ref = np.asarray(generate(model, CFG, jnp.asarray(prompt), 6, temperature=0.0))
    eos = int(ref[len(prompt) + 1])
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=16, page_size=4, eos_id=eos)
    out = eng.run([(prompt, 6)])
    assert out[0][-1] == eos
    assert len(out[0]) == len(prompt) + 2


def test_prefix_sharing_matches_full_prompt(model, rng):
    """Requests sharing a registered prefix must produce exactly the tokens of
    the same full prompt without sharing — and hold ONE copy of the prefix KV."""
    prefix = rng.integers(0, CFG.vocab_size, size=(11,)).astype(np.int32)  # 2 full pages + tail
    conts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32) for n in (3, 5)
    ]
    singles = [
        np.asarray(
            generate(model, CFG, jnp.concatenate([prefix, c]), 6, temperature=0.0)
        )
        for c in conts
    ]
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=32, page_size=4)
    free_before = len(eng.free)
    pid = eng.register_prefix(prefix)
    assert pid is not None
    assert free_before - len(eng.free) == 11 // 4  # only full pages held
    outs = eng.run([(c, 6) for c in conts], prefix_id=pid)
    for rid, (c, want) in enumerate(zip(conts, singles)):
        got = np.concatenate([prefix, outs[rid]])
        np.testing.assert_array_equal(got, want)
    # requests retired: only the prefix's own pages remain held
    assert free_before - len(eng.free) == 11 // 4
    eng.release_prefix(pid)
    assert len(eng.free) == free_before


def test_preemption_resumes_exactly(model, rng):
    """Pool too small for two long streams: one gets preempted mid-decode,
    resumes after the other finishes, and still emits exactly its single-stream
    tokens."""
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(10,)).astype(np.int32)
        for _ in range(2)
    ]
    singles = [
        np.asarray(generate(model, CFG, jnp.asarray(p), 16, temperature=0.0))
        for p in prompts
    ]
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=9, page_size=4)
    outs = eng.run([(p, 16) for p in prompts])
    assert len(outs) == 2
    for rid, want in enumerate(singles):
        np.testing.assert_array_equal(outs[rid], want)


def test_pool_too_small_raises(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(30,)).astype(np.int32)
    eng = PagedEngine(model, CFG, max_batch=1, n_pages=3, page_size=4)
    with pytest.raises(RuntimeError, match="page pool too small"):
        eng.run([(prompt, 4)])


def test_paged_forward_matches_dense_prefill(model, rng):
    """paged_forward logits over scattered pages == the contiguous-cache model."""
    from lit_llama_ja_tpu.models.llama import forward

    T = 10
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)), jnp.int32)
    pool = init_page_pool(CFG, 16, 4, jnp.float32)
    # non-contiguous, shuffled pages
    table = jnp.asarray([[7, 3, 11, 5, 0, 0, 0, 0]], jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    logits, pool = paged_forward(
        model, toks, pos, table, pool, CFG, False
    )
    want = np.asarray(forward(model, toks[:, :T], CFG))
    np.testing.assert_allclose(
        np.asarray(logits)[:, :T], want, atol=2e-4, rtol=2e-4
    )


def test_sharded_paged_engine(rng):
    """The paged engine runs unchanged with tensor-sharded params and matches
    its single-device output exactly."""
    from lit_llama_ja_tpu.parallel.mesh import make_mesh
    from lit_llama_ja_tpu.parallel.specs import shard_params

    params = init_params(jax.random.PRNGKey(6), CFG)
    mesh = make_mesh(dp=1, fsdp=2, tp=4)
    sharded = shard_params(params, mesh)
    prompt = rng.integers(0, CFG.vocab_size, size=(5,)).astype(np.int32)
    eng = PagedEngine(sharded, CFG, max_batch=2, n_pages=16, page_size=4)
    out = eng.run([(prompt, 5)])
    ref = PagedEngine(params, CFG, max_batch=2, n_pages=16, page_size=4)
    want = ref.run([(prompt, 5)])
    np.testing.assert_array_equal(out[0], want[0])


def test_chunked_prefill_matches_unchunked(model, rng):
    """prefill_chunk changes dispatch granularity only — outputs are exact."""
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (19, 4, 11)
    ]
    ref = PagedEngine(model, CFG, max_batch=3, n_pages=32, page_size=4)
    want = ref.run([(p, 7) for p in prompts])
    eng = PagedEngine(
        model, CFG, max_batch=3, n_pages=32, page_size=4, prefill_chunk=8
    )
    got = eng.run([(p, 7) for p in prompts])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_chunked_prefill_interleaves_with_decode(model, rng):
    """An active stream keeps emitting tokens while a long prompt prefills."""
    short = rng.integers(0, CFG.vocab_size, size=(4,)).astype(np.int32)
    long = rng.integers(0, CFG.vocab_size, size=(33,)).astype(np.int32)
    eng = PagedEngine(
        model, CFG, max_batch=2, n_pages=32, page_size=4, prefill_chunk=8
    )
    rid_short = eng.add_request(short, 30)
    eng.step()  # admits + starts decoding the short request
    rid_long = eng.add_request(long, 4)
    tokens_during_prefill = 0
    saw_prefilling = False
    while eng.prefilling or any(
        r is not None and r.req_id == rid_long for r in eng.slot_req
    ) or eng.queue:
        emitted = eng.step()
        if eng.prefilling:
            saw_prefilling = True
            tokens_during_prefill += sum(
                1 for rid, _, _ in emitted if rid == rid_short
            )
        if all(r is None for r in eng.slot_req) and not eng.queue:
            break
    assert saw_prefilling
    assert tokens_during_prefill >= 2  # short stream progressed during prefill
    # drain remaining work so the engine ends idle
    for _ in range(50):
        if not eng.step() and not eng.prefilling and not eng.queue:
            break


def test_chunked_prefill_with_prefix_and_quant(model, rng):
    prefix = rng.integers(0, CFG.vocab_size, size=(13,)).astype(np.int32)
    cont = rng.integers(0, CFG.vocab_size, size=(18,)).astype(np.int32)
    ref = PagedEngine(
        model, CFG, max_batch=2, n_pages=32, page_size=4, quantize_kv=True
    )
    pid_r = ref.register_prefix(prefix)
    want = ref.run([(cont, 6)], prefix_id=pid_r)
    eng = PagedEngine(
        model, CFG, max_batch=2, n_pages=32, page_size=4, quantize_kv=True,
        prefill_chunk=4,
    )
    pid = eng.register_prefix(prefix)
    got = eng.run([(cont, 6)], prefix_id=pid)
    np.testing.assert_array_equal(got[0], want[0])


def test_page_size_differs_from_n_head(model, rng):
    """Regression: page_size must come from the pool's axis-3 (heads-major
    layout), not axis-2 — the two are different here (page=8, nh=4)."""
    prompt = rng.integers(0, CFG.vocab_size, size=(11,)).astype(np.int32)
    want = generate(model, CFG, jnp.asarray(prompt), 8, temperature=0.0)
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=16, page_size=8)
    out = eng.run([(prompt, 8)])
    np.testing.assert_array_equal(out[0], np.asarray(want))
    engq = PagedEngine(
        model, CFG, max_batch=2, n_pages=16, page_size=8, quantize_kv=True
    )
    outq = engq.run([(prompt, 8)])
    assert len(outq[0]) == len(prompt) + 8


def test_top_p_paged_engine(model, rng):
    prompt = rng.integers(0, CFG.vocab_size, size=(5,)).astype(np.int32)
    eng = PagedEngine(model, CFG, max_batch=2, n_pages=32, page_size=4)
    out = eng.run([(prompt, 6)], temperature=0.9, top_p=0.8)
    assert len(out[0]) == len(prompt) + 6
    assert (out[0] >= 0).all() and (out[0] < CFG.vocab_size).all()


def test_attn_chunk_outputs_identical(model, rng):
    """attn_chunk changes XLA scheduling only — greedy outputs are exact, and
    the auto-chunk kicks in for max_batch > 8."""
    prompts = [
        rng.integers(0, CFG.vocab_size, size=(n,)).astype(np.int32)
        for n in (5, 9, 3, 7)
    ]
    plain = PagedEngine(model, CFG, max_batch=4, n_pages=48, page_size=4)
    assert plain.attn_chunk is None
    want = plain.run([(p, 8) for p in prompts])
    chunked = PagedEngine(model, CFG, max_batch=12, n_pages=96, page_size=4)
    assert chunked.attn_chunk == 4
    got = chunked.run([(p, 8) for p in prompts])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
