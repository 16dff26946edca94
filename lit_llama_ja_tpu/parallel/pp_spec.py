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
from lit_llama_ja_tpu.infer.spec_serving import _accept_chain, _draft_propose
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
):
    """Pipeline forward over (B, T) token spans with per-token positions —
    `make_pp_decode_step`'s wavefront generalized from T=1 to the speculative
    verify width. Returns ``verify(params, toks (B, T), pos (B, T),
    tables (B, AP), pool) -> (logits (B, T, V), pool)`` (NOT jitted — meant to
    be called inside the round program)."""
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
        out_specs=(P(), poolspecs),
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
            h, pool = paged_block_chain(
                params["blocks"], pool, x_in, pos_m, tab_m, config, quantized
            )
            if t >= S - 1:
                y = rmsnorm(h, params["ln_f"]["scale"], config.norm_eps)
                parts.append(apply_linear(params["lm_head"], y))  # (mbs, T, V)
            if S > 1:
                buf = jax.lax.ppermute(h, axis, perm)
        logits = jnp.concatenate(parts, axis=0)  # (B, T, V)
        logits = jnp.where(s == S - 1, logits, 0)
        return jax.lax.psum(logits, axis), pool

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
):
    """Build the jitted pipeline speculative round. Same contract as
    `infer/spec_serving._batched_spec_round` minus the config/K statics:
    ``round(tparams, dparams, prev, cur, pos, tables, tpool, dpool, key,
    temps, top_k, top_p) -> (tokens (B, K+1), n_out (B,), tpool, dpool)``."""
    verify = make_pp_verify(
        tcfg, mesh, params, tpool, T=K + 1, n_micro=n_micro,
        quantized=quantized, axis=axis,
    )

    @partial(jax.jit, static_argnames=("top_k", "top_p"), donate_argnums=(6, 7))
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
    ) -> Tuple[jax.Array, jax.Array, PagePool, PagePool]:
        kd, kacc, kfin = jax.random.split(key, 3)
        draft_toks, p_d, dpool = _draft_propose(
            dparams, prev, cur, pos, tables, dpool, dcfg, K, temps,
            top_k, top_p, kd,
        )
        tin = jnp.concatenate([cur[:, None], draft_toks], axis=1)
        tpos = pos[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None]
        tlogits, tpool = verify(tparams, tin, tpos, tables, tpool)
        tokens, n_out = _accept_chain(
            tlogits, draft_toks, p_d, temps, top_k, top_p, kacc, kfin
        )
        return tokens, n_out, tpool, dpool

    return spec_round
