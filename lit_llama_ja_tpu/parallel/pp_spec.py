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
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import PagePool, paged_block_chain
from lit_llama_ja_tpu.infer.spec_serving import (
    _accept_chain,
    _dist_batch,
    _draft_propose,
)
from lit_llama_ja_tpu.models.llama import apply_linear
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.parallel.pipeline import pp_param_specs
from lit_llama_ja_tpu.parallel.pp_decode import pp_pool_specs


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
    `make_pp_decode_step`'s wavefront generalized from T=1 to the speculative
    verify width. Returns ``verify(params, toks (B, T), pos (B, T),
    tables (B, AP), pool) -> (logits (B, T, V), pool)`` (NOT jitted — meant to
    be called inside the round program).

    ``defer_commit=True``: the pool stays a read-only loop-invariant and the
    span's K/V comes back as pp-sharded ``writes`` (leaves (L, B, T, ...)) for
    a separate `make_pp_commit` dispatch — ``verify(...) -> (logits, writes)``.
    Two-dispatch rationale at `infer/paged.commit_writes_jit`."""
    S = int(mesh.shape[axis])
    M = n_micro
    assert config.n_layer % S == 0
    pspecs = pp_param_specs(params)
    poolspecs = pp_pool_specs(pool, axis)
    wspecs = jax.tree.map(lambda _: P(axis), pool)
    perm = [(i, i + 1) for i in range(S - 1)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, P(), P(), P(), poolspecs),
        out_specs=(P(), wspecs if defer_commit else poolspecs),
        check_vma=False,
    )
    def inner(params, toks, pos, tables, pool):
        s = jax.lax.axis_index(axis)
        B = toks.shape[0]
        assert B % M == 0, f"batch {B} not divisible by n_micro={M}"
        mbs = B // M
        emb_all = params["wte"]["weight"][toks]  # (B, T, D)
        buf = jnp.zeros((mbs, T, emb_all.shape[-1]), emb_all.dtype)
        parts = []
        bufs = None
        for t in range(M + S - 1):
            m = t - s
            active = (m >= 0) & (m < M)
            start = jnp.clip(m, 0, M - 1) * mbs
            emb = jax.lax.dynamic_slice_in_dim(emb_all, start, mbs, 0)
            pos_m = jax.lax.dynamic_slice_in_dim(pos, start, mbs, 0)
            tab_m = jax.lax.dynamic_slice_in_dim(tables, start, mbs, 0)
            pos_m = jnp.where(active, pos_m, 0)
            tab_m = jnp.where(active, tab_m, 0)
            x_in = jnp.where(s == 0, emb, buf)
            if defer_commit:
                h, w_t, _, _ = paged_block_chain(
                    params["blocks"], pool, x_in, pos_m, tab_m, config,
                    quantized, defer_commit=True,
                )
                if bufs is None:
                    bufs = jax.tree.map(
                        lambda w: jnp.zeros(
                            (w.shape[0], B) + w.shape[2:], w.dtype
                        ),
                        w_t,
                    )

                def place(b, w):
                    cur = jax.lax.dynamic_slice_in_dim(b, start, mbs, axis=1)
                    return jax.lax.dynamic_update_slice_in_dim(
                        b, jnp.where(active, w, cur), start, axis=1
                    )

                bufs = jax.tree.map(place, bufs, w_t)
            else:
                h, pool = paged_block_chain(
                    params["blocks"], pool, x_in, pos_m, tab_m, config,
                    quantized,
                )
            if t >= S - 1:
                y = rmsnorm(h, params["ln_f"]["scale"], config.norm_eps)
                parts.append(apply_linear(params["lm_head"], y))  # (mbs, T, V)
            if S > 1:
                buf = jax.lax.ppermute(h, axis, perm)
        logits = jnp.concatenate(parts, axis=0)  # (B, T, V)
        logits = jnp.where(s == S - 1, logits, 0)
        return jax.lax.psum(logits, axis), bufs if defer_commit else pool

    return inner


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
    S = int(mesh.shape[axis])
    M = n_micro
    assert config.n_layer % S == 0
    pspecs = pp_param_specs(params)
    poolspecs = pp_pool_specs(pool, axis)
    perm = [(i, i + 1) for i in range(S - 1)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, P(), P(), P(), poolspecs),
        out_specs=(P(), P(axis), P(axis)),
        check_vma=False,
    )
    def inner(params, toks, pos, tables, pool):
        s = jax.lax.axis_index(axis)
        B = toks.shape[0]
        assert B % M == 0, f"batch {B} not divisible by n_micro={M}"
        mbs = B // M
        emb_all = params["wte"]["weight"][toks]  # (B, NT, D)
        buf = jnp.zeros((mbs, NT, emb_all.shape[-1]), emb_all.dtype)
        parts = []
        kbuf = vbuf = None
        for t in range(M + S - 1):
            m = t - s
            active = (m >= 0) & (m < M)
            start = jnp.clip(m, 0, M - 1) * mbs
            emb = jax.lax.dynamic_slice_in_dim(emb_all, start, mbs, 0)
            pos_m = jax.lax.dynamic_slice_in_dim(pos, start, mbs, 0)
            tab_m = jax.lax.dynamic_slice_in_dim(tables, start, mbs, 0)
            pos_m = jnp.where(active, pos_m, 0)
            tab_m = jnp.where(active, tab_m, 0)
            x_in = jnp.where(s == 0, emb, buf)
            h, (k_t, v_t) = tree_block_chain(
                params["blocks"], pool, x_in, pos_m, tab_m, config,
                depths, tmask, quantized,
            )
            if kbuf is None:
                kbuf = jnp.zeros((k_t.shape[0], B) + k_t.shape[2:], k_t.dtype)
                vbuf = jnp.zeros((v_t.shape[0], B) + v_t.shape[2:], v_t.dtype)

            def place(b, w):
                cur = jax.lax.dynamic_slice_in_dim(b, start, mbs, axis=1)
                return jax.lax.dynamic_update_slice_in_dim(
                    b, jnp.where(active, w, cur), start, axis=1
                )

            kbuf, vbuf = place(kbuf, k_t), place(vbuf, v_t)
            if t >= S - 1:
                y = rmsnorm(h, params["ln_f"]["scale"], config.norm_eps)
                parts.append(apply_linear(params["lm_head"], y))
            if S > 1:
                buf = jax.lax.ppermute(h, axis, perm)
        logits = jnp.concatenate(parts, axis=0)  # (B, NT, V)
        logits = jnp.where(s == S - 1, logits, 0)
        return jax.lax.psum(logits, axis), kbuf, vbuf

    return inner


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
