"""Measure speculative round cost at 7B serving shapes on the real chip:
plain decode step vs chain rounds (K=3/4) vs tree rounds, int4 weights +
int8 KV, batch 8, 1024-token region. A tree shape is worth running when its
expected tokens/round gain over the chain exceeds its cost ratio — this bench
supplies the cost side; the acceptance side comes from serving telemetry
(`stats()['acceptance_ema']`). Run: PYTHONPATH=/root/repo python tools/bench_tree_spec.py
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import synth_int4_params
from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import _paged_decode_and_sample, init_page_pool
from lit_llama_ja_tpu.infer.spec_serving import _batched_spec_round
from lit_llama_ja_tpu.infer.tree_spec import _tree_spec_round, tree_topology
from lit_llama_ja_tpu.models.llama import init_params

import os

B, S, PAGE, ROUNDS = 8, 1024, 16, 8
# target KV-cache mode: int8 (default) or int4 via KV=int4 (round 3: int4 is
# the serving default; spec round costs must be re-checked under it)
KVMODE = {"int8": True, "int4": "int4"}[os.environ.get("KV", "int8")]
tcfg = LLaMAConfig.from_name("7B")
# synthetic draft in the 7B tokenizer's vocab (~50M-param class)
dcfg = LLaMAConfig(
    block_size=tcfg.block_size, vocab_size=tcfg.vocab_size,
    n_layer=4, n_head=8, n_embd=512,
)
tparams = synth_int4_params(tcfg, jax.random.PRNGKey(0))
dparams = init_params(jax.random.PRNGKey(1), dcfg)

AP = S // PAGE
tables = jnp.asarray(1 + np.arange(B * AP, dtype=np.int32).reshape(B, AP))
pos = jnp.full((B,), 512, jnp.int32)
cur = jnp.ones((B,), jnp.int32)
prev = jnp.ones((B,), jnp.int32)
temps = jnp.zeros((B,), jnp.float32)
key = jax.random.PRNGKey(0)


def fresh_pools():
    return (
        init_page_pool(tcfg, B * AP + 1, PAGE, quantized=KVMODE),
        init_page_pool(dcfg, B * AP + 1, PAGE, quantized=False),
    )


def time_rounds(fn):
    """fn(tpool, dpool) -> (tokens, n_out, tcommit, dpool); measures the full
    round INCLUDING the separate target-pool commit dispatch; returns ms."""
    from lit_llama_ja_tpu.infer.paged import commit_writes_jit

    tpool, dpool = fresh_pools()
    toks, _, tcommit, dpool = fn(tpool, dpool)  # compile
    tpool = commit_writes_jit(tpool, *tcommit)
    _ = np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        toks, _, tcommit, dpool = fn(tpool, dpool)
        tpool = commit_writes_jit(tpool, *tcommit)
    _ = np.asarray(toks)
    return (time.perf_counter() - t0) / ROUNDS * 1e3


# --- plain decode step baseline (two-dispatch, same as the engine) ----------
from lit_llama_ja_tpu.infer.paged import (
    _paged_decode_read_and_sample,
    commit_writes_jit,
)

tpool, _ = fresh_pools()


def plain_step(nxt, tpool):
    nxt, writes, pi, of = _paged_decode_read_and_sample(
        tparams, nxt, pos, tables, tpool, key, temps, tcfg, KVMODE, None
    )
    return nxt, commit_writes_jit(tpool, writes, pi, of)


nxt, tpool = plain_step(cur, tpool)
_ = np.asarray(nxt)
t0 = time.perf_counter()
for _ in range(ROUNDS):
    nxt, tpool = plain_step(nxt, tpool)
_ = np.asarray(nxt)
step_ms = (time.perf_counter() - t0) / ROUNDS * 1e3
print(f"plain decode step:        {step_ms:6.1f} ms  (cost 1.00x)")
del tpool


def report(label, ms, depth):
    # breakeven CHAIN acceptance a* at which this round matches the plain
    # engine only if E[tokens] = cost: E = sum_{i<=depth} a^i
    cost = ms / step_ms
    print(
        f"{label:<25} {ms:6.1f} ms  (cost {cost:.2f}x, breaks even at "
        f"E[tokens/round] > {cost:.2f} of max {depth + 1})"
    )


# --- chain rounds -------------------------------------------------------------
for K in (3, 4):
    ms = time_rounds(
        lambda tp, dp, K=K: _batched_spec_round(
            tparams, dparams, prev, cur, pos, tables, tp, dp, key, temps,
            tcfg, dcfg, K, KVMODE, None, None,
        )
    )
    report(f"chain K={K}:", ms, K)

# --- tree rounds ---------------------------------------------------------------
for tree in ((4, 1, 1), (2, 2, 2), (4, 2, 2), (3, 2)):
    nt = tree_topology(tree)["n_nodes"]
    ms = time_rounds(
        lambda tp, dp, tree=tree: _tree_spec_round(
            tparams, dparams, cur, pos, tp, dp, tables, key, temps,
            tcfg, dcfg, tree, KVMODE, None, None,
        )
    )
    report(f"tree {tree} ({nt} nodes):", ms, len(tree))
