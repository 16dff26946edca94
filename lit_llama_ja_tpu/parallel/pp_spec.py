"""Speculative serving over a pipeline-parallel mesh.

Composes the two serving scalers: GPipe layer sharding for models beyond one
host's HBM (`parallel/pp_decode.py`) and batched chain speculation for
tokens-per-weight-stream (`infer/spec_serving.py`). Division of labor:

* The DRAFT model is small by construction — it runs fully REPLICATED on every
  stage (same program, same inputs, no communication; its page pool is
  replicated too). This costs nothing vs a single-mesh draft and keeps the
  draft's sequential K-step scan off the wavefront's critical path structure.
* The TARGET verify — one forward over the (B, K+1) spans — runs the same
  GPipe microgroup wavefront as pipeline decode, just with T = K+1 tokens per
  slot: stage s at tick t processes microgroup t−s, idle ticks write to the
  trash page, the last stage's logits are psum-broadcast.
* The rejection chain and cache bookkeeping are the exact shared functions of
  the single-mesh round (`_draft_propose` / `_accept_chain`), so token streams
  are bitwise identical to the single-mesh speculative engine (tested in
  `tests/test_pp_spec.py`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import PagePool
from lit_llama_ja_tpu.infer.spec_serving import (
    _accept_chain,
    _dist_batch,
    _draft_propose,
)
from lit_llama_ja_tpu.parallel.pp_decode import make_pp_span_forward


def make_pp_verify(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    T: int,
    n_micro: int = 1,
    quantized=False,
    axis: str = "pp",
    defer_commit: bool = False,
):
    """Pipeline forward over (B, T) token spans with per-token positions —
    the shared wavefront (`pp_decode.make_pp_span_forward`) at the speculative
    verify width. Returns ``verify(params, toks (B, T), pos (B, T),
    tables (B, AP), pool) -> (logits (B, T, V), pool)`` (NOT jitted — meant to
    be called inside the round program).

    ``defer_commit=True``: the pool stays a read-only loop-invariant and the
    span's K/V comes back as pp-sharded ``writes`` (leaves (L, B, T, ...)) for
    a separate `make_pp_commit` dispatch — ``verify(...) -> (logits, writes)``.
    Two-dispatch rationale at `infer/paged.commit_writes_jit`."""
    return make_pp_span_forward(
        config, mesh, params, pool, T=T, n_micro=n_micro,
        quantized=quantized, axis=axis, defer_commit=defer_commit,
    )


def make_pp_spec_round(
    tcfg: LLaMAConfig,
    dcfg: LLaMAConfig,
    mesh: Mesh,
    params,
    tpool: PagePool,
    *,
    K: int,
    n_micro: int = 1,
    quantized=False,
    axis: str = "pp",
    defer_commit: bool = False,
):
    """Build the jitted pipeline speculative round. Same contract as
    `infer/spec_serving._batched_spec_round` minus the config/K statics:
    ``round(tparams, dparams, prev, cur, pos, tables, tpool, dpool, key,
    temps, top_k, top_p) -> (tokens (B, K+1), n_out (B,), tpool, dpool)``.

    ``defer_commit=True`` (two-dispatch): the target pool stays read-only and
    the third return value is ``(writes, page_idx, offs)`` for a separate
    `make_pp_commit` dispatch instead of the committed pool — matching the
    single-mesh `_batched_spec_round` contract."""
    verify = make_pp_verify(
        tcfg, mesh, params, tpool, T=K + 1, n_micro=n_micro,
        quantized=quantized, axis=axis, defer_commit=defer_commit,
    )
    page = jax.tree.leaves(tpool)[0].shape[3]

    @partial(
        jax.jit,
        static_argnames=("top_k", "top_p"),
        donate_argnums=(7,) if defer_commit else (6, 7),
    )
    def spec_round(
        tparams,
        dparams,
        prev: jax.Array,
        cur: jax.Array,
        pos: jax.Array,
        tables: jax.Array,
        tpool: PagePool,
        dpool: PagePool,
        key: jax.Array,
        temps: jax.Array,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> Tuple[jax.Array, jax.Array, object, PagePool]:
        kd, kacc, kfin = jax.random.split(key, 3)
        draft_toks, p_d, dpool = _draft_propose(
            dparams, prev, cur, pos, tables, dpool, dcfg, K, temps,
            top_k, top_p, kd,
        )
        tin = jnp.concatenate([cur[:, None], draft_toks], axis=1)
        tpos = pos[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None]
        if defer_commit:
            tlogits, twrites = verify(tparams, tin, tpos, tables, tpool)
            pi = jnp.take_along_axis(tables, tpos // page, axis=1)
            third = (twrites, pi, tpos % page)
        else:
            tlogits, third = verify(tparams, tin, tpos, tables, tpool)
        tokens, n_out = _accept_chain(
            tlogits, draft_toks, p_d, temps, top_k, top_p, kacc, kfin
        )
        return tokens, n_out, third, dpool

    return spec_round


def make_pp_tree_verify(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    branching: Tuple[int, ...],
    n_micro: int = 1,
    quantized=False,
    axis: str = "pp",
):
    """Pipeline wavefront over (B, NT) TREE-node spans — `make_pp_verify`
    generalized from chain spans to tree-attention verification
    (`infer/tree_spec.tree_block_chain` per stage, on the stage's local layer
    shard). The pool is read-only by construction (tree nodes can't be cache-
    written: siblings share a position), so the pipeline gets the two-dispatch
    structure for free: each stage's fresh per-layer K/V comes back pp-sharded
    for the post-walk `make_pp_commit` dispatch. Returns ``verify(params,
    toks (B, NT), pos (B,), tables (B, AP), pool) -> (logits (B, NT, V),
    ks (L, B, NT, nh, hd), vs)`` (NOT jitted — called inside the round)."""
    from lit_llama_ja_tpu.infer.tree_spec import tree_block_chain, tree_topology

    topo = tree_topology(branching)
    depths = topo["depths"]
    tmask = topo["anc"]
    NT = topo["n_nodes"]

    def chain(blocks, pool, x, pos_m, tab_m):
        # pos_m is the (mbs,) BASE position — the tree chain derives each
        # node's position from it via `depths`
        return tree_block_chain(
            blocks, pool, x, pos_m, tab_m, config, depths, tmask, quantized
        )

    inner = make_pp_span_forward(
        config, mesh, params, pool, T=NT, n_micro=n_micro,
        quantized=quantized, axis=axis, defer_commit=True,
        chain=chain, write_proto=(0, 0),
    )

    def verify(params, toks, pos, tables, pool):
        logits, (ks, vs) = inner(params, toks, pos, tables, pool)
        return logits, ks, vs

    return verify


def make_pp_tree_round(
    tcfg: LLaMAConfig,
    dcfg: LLaMAConfig,
    mesh: Mesh,
    params,
    tpool: PagePool,
    *,
    branching: Tuple[int, ...],
    n_micro: int = 1,
    quantized=False,
    axis: str = "pp",
):
    """Build the jitted pipeline TREE-speculative round. Same contract as
    `infer/tree_spec._tree_spec_round` minus the config/branching statics:
    ``round(tparams, dparams, cur, pos, tables, tpool, dpool, key, temps,
    top_k, top_p) -> (tokens (B, D+1), n_out (B,), tcommit, dpool)`` where
    ``tcommit = (writes, page_idx, offs)`` feeds `make_pp_commit` (the target
    pool stays read-only in the round — two-dispatch, pp-sharded). The draft
    runs replicated; token streams are bitwise the single-mesh tree engine's
    (tested in tests/test_pp_spec.py)."""
    from lit_llama_ja_tpu.infer.paged import commit_writes
    from lit_llama_ja_tpu.infer.tree_spec import (
        _path_writes,
        _tree_draft_propose,
        tree_accept_walk,
        tree_topology,
    )

    topo = tree_topology(branching)
    NT, D = topo["n_nodes"], topo["depth"]
    verify = make_pp_tree_verify(
        tcfg, mesh, params, tpool, branching=branching, n_micro=n_micro,
        quantized=quantized, axis=axis,
    )

    @partial(jax.jit, static_argnames=("top_k", "top_p"), donate_argnums=(6,))
    def tree_round(
        tparams,
        dparams,
        cur: jax.Array,  # (B,)
        pos: jax.Array,  # (B,)
        tables: jax.Array,  # (B, AP)
        tpool: PagePool,
        dpool: PagePool,
        key: jax.Array,
        temps: jax.Array,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ):
        B = cur.shape[0]
        kexp, kwalk = jax.random.split(key)
        toks, q_all, dks, dvs = _tree_draft_propose(
            dparams, cur, pos, tables, dpool, dcfg, branching, temps,
            top_k, top_p, kexp,
        )
        tlogits, tks, tvs = verify(tparams, toks, pos, tables, tpool)
        TV = tlogits.shape[-1]
        p_all = _dist_batch(
            tlogits.reshape(B * NT, TV), jnp.repeat(temps, NT), top_k, top_p
        ).reshape(B, NT, TV)
        tokens, n_out, path, n_acc = tree_accept_walk(
            p_all, q_all, toks, branching, kwalk, temps
        )
        keep = jnp.arange(D + 1, dtype=jnp.int32)[None, :] <= n_acc[:, None]
        page = dpool["k"].shape[3]
        tcommit = _path_writes(
            tks, tvs, path, keep, pos, tables, page, quantized
        )
        dpool = commit_writes(
            dpool,
            *_path_writes(dks, dvs, path, keep, pos, tables, page, False),
        )
        return tokens, n_out, tcommit, dpool

    return tree_round
