"""Pipeline-parallel paged decode tests (simulated multi-device mesh).

Load-bearing property: the pp step is the SAME paged program as the
single-mesh engine — logits, sampled tokens, and the page pool's contents
must match `paged_forward`/`_paged_decode_and_sample` exactly (same math,
layer axis merely sharded over stages)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import (
    PagedEngine,
    _paged_decode_and_sample,
    init_page_pool,
    paged_forward,
)
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.parallel.mesh import make_mesh
from lit_llama_ja_tpu.parallel.pipeline import shard_params_pp
from lit_llama_ja_tpu.parallel.pp_decode import (
    make_pp_commit,
    make_pp_decode_read,
    make_pp_decode_step,
    make_pp_prefill,
    make_pp_prefill_read,
    shard_pool_pp,
)

CFG = LLaMAConfig(block_size=32, vocab_size=96, n_layer=4, n_head=2, n_embd=16)
PAGE = 4
NPAGES = 24


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def _prefill_two_slots(params, rng, quantized=False):
    """Prefill slots 0/1 (lengths 6 and 9) via the single-mesh path; returns
    (pool, tables (2, 4), pos (2,), cur (2,), prompts)."""
    pool = init_page_pool(CFG, NPAGES, PAGE, jnp.bfloat16, quantized)
    tables = np.zeros((2, 4), np.int32)
    tables[0, :2] = [1, 2]
    tables[1, :3] = [3, 4, 5]
    prompts = [
        rng.integers(0, 96, size=(6,)).astype(np.int32),
        rng.integers(0, 96, size=(9,)).astype(np.int32),
    ]
    curs = []
    for b, p in enumerate(prompts):
        logits, pool = paged_forward(
            params,
            jnp.asarray(p[None]),
            jnp.asarray(np.arange(len(p), dtype=np.int32)[None]),
            jnp.asarray(tables[b : b + 1]),
            pool,
            CFG,
            quantized,
        )
        curs.append(int(np.argmax(np.asarray(logits)[0, -1])))
    pos = np.array([len(p) for p in prompts], np.int32)
    return pool, tables, pos, np.array(curs, np.int32), prompts


def _gather(tree):
    return jax.tree.map(np.asarray, tree)


@pytest.mark.parametrize("pp,n_micro", [(2, 1), (2, 2), (4, 2)])
def test_pp_decode_step_matches_single_mesh(params, rng, pp, n_micro):
    pool, tables, pos, cur, _ = _prefill_two_slots(params, rng)
    key = jax.random.PRNGKey(7)
    temps = jnp.zeros(2, jnp.float32)

    want_tok, want_pool = _paged_decode_and_sample(
        params, jnp.asarray(cur), jnp.asarray(pos), jnp.asarray(tables),
        jax.tree.map(jnp.copy, pool), key, temps, CFG, False, None,
    )

    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=pp, devices=jax.devices()[:pp])
    sparams = shard_params_pp(params, mesh)
    spool = shard_pool_pp(pool, mesh)
    step = make_pp_decode_step(CFG, mesh, params, pool, n_micro=n_micro)
    got_tok, got_pool = step(
        sparams, jnp.asarray(cur), jnp.asarray(pos), jnp.asarray(tables),
        spool, key, temps,
    )

    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(want_tok))
    # page 0 is the trash page: the pp step's idle ticks scribble on it (by
    # design), the single-mesh step doesn't — compare the real pages only
    for k in want_pool:
        np.testing.assert_allclose(
            np.asarray(got_pool[k])[:, 1:],
            np.asarray(want_pool[k])[:, 1:],
            rtol=0, atol=0,
        )


def test_pp_decode_multi_step_greedy_chain(params, rng):
    """6 chained greedy steps: the pp engine must emit the exact same tokens."""
    pool, tables, pos, cur, _ = _prefill_two_slots(params, rng)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    sparams = shard_params_pp(params, mesh)
    temps = jnp.zeros(2, jnp.float32)

    want, wpool = [], jax.tree.map(jnp.copy, pool)
    wcur, wpos = cur.copy(), pos.copy()
    for i in range(6):
        tok, wpool = _paged_decode_and_sample(
            params, jnp.asarray(wcur), jnp.asarray(wpos), jnp.asarray(tables),
            wpool, jax.random.PRNGKey(i), temps, CFG, False, None,
        )
        wcur = np.asarray(tok)
        wpos = wpos + 1
        want.append(wcur.copy())

    step = make_pp_decode_step(CFG, mesh, params, pool, n_micro=2)
    spool = shard_pool_pp(pool, mesh)
    gcur, gpos = cur.copy(), pos.copy()
    for i in range(6):
        tok, spool = step(
            sparams, jnp.asarray(gcur), jnp.asarray(gpos), jnp.asarray(tables),
            spool, jax.random.PRNGKey(i), temps,
        )
        gcur = np.asarray(tok)
        gpos = gpos + 1
        np.testing.assert_array_equal(gcur, want[i])


def test_pp_prefill_matches_paged_forward(params, rng):
    prompt = rng.integers(0, 96, size=(7,)).astype(np.int32)
    tables = np.zeros((1, 4), np.int32)
    tables[0, :2] = [1, 2]
    posv = np.arange(7, dtype=np.int32)[None]

    pool0 = init_page_pool(CFG, NPAGES, PAGE, jnp.bfloat16, False)
    want_lg, want_pool = paged_forward(
        params, jnp.asarray(prompt[None]), jnp.asarray(posv),
        jnp.asarray(tables), jax.tree.map(jnp.copy, pool0), CFG, False,
    )

    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    sparams = shard_params_pp(params, mesh)
    spool = shard_pool_pp(pool0, mesh)
    prefill = make_pp_prefill(CFG, mesh, params, pool0)
    got_lg, got_pool = prefill(
        sparams, jnp.asarray(prompt[None]), jnp.asarray(posv),
        jnp.asarray(tables), spool,
    )
    np.testing.assert_allclose(
        np.asarray(got_lg), np.asarray(want_lg), rtol=2e-4, atol=2e-4
    )
    for k in want_pool:
        np.testing.assert_allclose(
            np.asarray(got_pool[k])[:, 1:],
            np.asarray(want_pool[k])[:, 1:],
            rtol=0, atol=0,
        )


def test_pp_decode_quantized_kv(params, rng):
    """int8 KV pool composes with the pp step."""
    pool, tables, pos, cur, _ = _prefill_two_slots(params, rng, quantized=True)
    key = jax.random.PRNGKey(3)
    temps = jnp.zeros(2, jnp.float32)
    want_tok, _ = _paged_decode_and_sample(
        params, jnp.asarray(cur), jnp.asarray(pos), jnp.asarray(tables),
        jax.tree.map(jnp.copy, pool), key, temps, CFG, True, None,
    )
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    step = make_pp_decode_step(CFG, mesh, params, pool, n_micro=2, quantized=True)
    got_tok, _ = step(
        shard_params_pp(params, mesh), jnp.asarray(cur), jnp.asarray(pos),
        jnp.asarray(tables), shard_pool_pp(pool, mesh), key, temps,
    )
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(want_tok))


def test_paged_engine_pp_matches_single_mesh(params, rng):
    """Full engine parity: PagedEngine(pp_mesh=...) must emit the exact token
    streams of the plain engine — admission, chunked prefill, prefix pages,
    eviction all run the same host logic; only the device programs differ."""
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    prompts = [
        rng.integers(0, 96, size=(n,)).astype(np.int32) for n in (5, 11, 3, 8)
    ]
    reqs = [(p, 10) for p in prompts]
    kw = dict(max_batch=4, n_pages=NPAGES, page_size=PAGE)
    want = PagedEngine(params, CFG, **kw).run(reqs)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    eng = PagedEngine(params, CFG, pp_mesh=mesh, pp_microbatches=2, **kw)
    got = eng.run(reqs)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_paged_engine_pp_chunked_prefill(params, rng):
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    prompt = rng.integers(0, 96, size=(17,)).astype(np.int32)
    kw = dict(max_batch=2, n_pages=NPAGES, page_size=PAGE, prefill_chunk=8)
    want = PagedEngine(params, CFG, **kw).run([(prompt, 6)])
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    got = PagedEngine(params, CFG, pp_mesh=mesh, pp_microbatches=2, **kw).run(
        [(prompt, 6)]
    )
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.parametrize("pp,n_micro", [(2, 1), (2, 2), (4, 2)])
def test_pp_split_decode_matches_fused(params, rng, pp, n_micro):
    """Two-dispatch pp decode (read + write-only commit) must be bitwise
    identical to the fused pp step: same sampled tokens, same pool contents
    (real pages; the fused step's idle ticks scribble on trash page 0, the
    split never commits them — by design)."""
    pool, tables, pos, cur, _ = _prefill_two_slots(params, rng)
    key = jax.random.PRNGKey(7)
    temps = jnp.zeros(2, jnp.float32)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=pp, devices=jax.devices()[:pp])
    sparams = shard_params_pp(params, mesh)

    fused = make_pp_decode_step(CFG, mesh, params, pool, n_micro=n_micro)
    want_tok, want_pool = fused(
        sparams, jnp.asarray(cur), jnp.asarray(pos), jnp.asarray(tables),
        shard_pool_pp(jax.tree.map(jnp.copy, pool), mesh), key, temps,
    )

    read = make_pp_decode_read(CFG, mesh, params, pool, n_micro=n_micro)
    commit = make_pp_commit(mesh, pool)
    got_tok, writes, pi, of = read(
        sparams, jnp.asarray(cur), jnp.asarray(pos), jnp.asarray(tables),
        shard_pool_pp(pool, mesh), key, temps,
    )
    got_pool = commit(shard_pool_pp(pool, mesh), writes, pi, of)

    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(want_tok))
    for k in want_pool:
        np.testing.assert_array_equal(
            np.asarray(got_pool[k])[:, 1:], np.asarray(want_pool[k])[:, 1:]
        )


def test_pp_split_prefill_matches_paged_forward(params, rng):
    prompt = rng.integers(0, 96, size=(7,)).astype(np.int32)
    tables = np.zeros((1, 4), np.int32)
    tables[0, :2] = [1, 2]
    posv = np.arange(7, dtype=np.int32)[None]

    pool0 = init_page_pool(CFG, NPAGES, PAGE, jnp.bfloat16, False)
    want_lg, want_pool = paged_forward(
        params, jnp.asarray(prompt[None]), jnp.asarray(posv),
        jnp.asarray(tables), jax.tree.map(jnp.copy, pool0), CFG, False,
    )

    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    sparams = shard_params_pp(params, mesh)
    prefill = make_pp_prefill_read(CFG, mesh, params, pool0)
    commit = make_pp_commit(mesh, pool0)
    got_lg, writes, pi, of = prefill(
        sparams, jnp.asarray(prompt[None]), jnp.asarray(posv),
        jnp.asarray(tables), shard_pool_pp(pool0, mesh),
    )
    got_pool = commit(shard_pool_pp(pool0, mesh), writes, pi, of)
    np.testing.assert_allclose(
        np.asarray(got_lg), np.asarray(want_lg), rtol=2e-4, atol=2e-4
    )
    for k in want_pool:
        np.testing.assert_array_equal(
            np.asarray(got_pool[k])[:, 1:], np.asarray(want_pool[k])[:, 1:]
        )


@pytest.mark.parametrize("quantized", [False, "int8"])
def test_paged_engine_pp_split_matches_single_mesh(params, rng, quantized):
    """Full engine parity for the default (split) pp path, fp and int8 KV."""
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    prompts = [
        rng.integers(0, 96, size=(n,)).astype(np.int32) for n in (5, 11, 3, 8)
    ]
    reqs = [(p, 10) for p in prompts]
    qkv = quantized == "int8"
    kw = dict(max_batch=4, n_pages=NPAGES, page_size=PAGE, quantize_kv=qkv)
    want = PagedEngine(params, CFG, **kw).run(reqs)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    got = PagedEngine(
        params, CFG, pp_mesh=mesh, pp_microbatches=2, pp_split=True, **kw
    ).run(reqs)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])


def test_paged_engine_pp_split_chunked_prefill_and_prefix(params, rng):
    """Split pp engine composes with chunked prefill + shared prefix pages."""
    from lit_llama_ja_tpu.infer.paged import PagedEngine

    prefix = rng.integers(0, 96, size=(9,)).astype(np.int32)
    prompt = rng.integers(0, 96, size=(17,)).astype(np.int32)
    kw = dict(max_batch=2, n_pages=NPAGES, page_size=PAGE, prefill_chunk=8)

    ref = PagedEngine(params, CFG, **kw)
    want = ref.run([(prompt, 6)], prefix_id=ref.register_prefix(prefix))
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    eng = PagedEngine(params, CFG, pp_mesh=mesh, pp_microbatches=2, **kw)
    got = eng.run([(prompt, 6)], prefix_id=eng.register_prefix(prefix))
    np.testing.assert_array_equal(got[0], want[0])


def test_pp_decode_sampled_smoke(params, rng):
    pool, tables, pos, cur, _ = _prefill_two_slots(params, rng)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, pp=2, devices=jax.devices()[:2])
    step = make_pp_decode_step(CFG, mesh, params, pool, n_micro=1)
    tok, _ = step(
        shard_params_pp(params, mesh), jnp.asarray(cur), jnp.asarray(pos),
        jnp.asarray(tables), shard_pool_pp(pool, mesh),
        jax.random.PRNGKey(0), jnp.full(2, 0.8, jnp.float32),
        top_k=20, top_p=0.9,
    )
    tok = np.asarray(tok)
    assert tok.shape == (2,) and (tok >= 0).all() and (tok < 96).all()


@pytest.mark.parametrize("quantized", [False, True, "int4"])
def test_paged_engine_pp_tp_matches_single_mesh(params, rng, quantized):
    """pp × tp serving: the wavefront shard_maps are manual over 'pp' only
    (axis_names), so a pp=2×tp=4 mesh runs each stage's math tp-sharded under
    GSPMD — bitwise identical to the single-device engine, for fp, int8-KV
    and head-pair int4-KV pools."""
    prompts = [rng.integers(0, 96, size=(n,)).astype(np.int32) for n in (5, 9)]
    kw = dict(max_batch=2, n_pages=NPAGES, page_size=PAGE, quantize_kv=quantized)

    ref = PagedEngine(params, CFG, **kw)
    want = ref.run([(p, 5) for p in prompts])

    mesh = make_mesh(dp=1, fsdp=1, tp=4, pp=2)
    eng = PagedEngine(params, CFG, pp_mesh=mesh, pp_microbatches=2, **kw)
    got = eng.run([(p, 5) for p in prompts])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
