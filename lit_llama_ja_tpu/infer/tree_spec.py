"""Tree-structured speculative decoding in the paged serving engine.

SpecInfer/Medusa-style generalization of `infer/spec_serving`: instead of ONE
draft chain of K tokens per slot, the draft proposes a static TREE of
candidates (e.g. branching ``(4, 2, 2)`` = 4 children of the current token,
each with 2 children, each with 2). The target verifies ALL tree nodes in one
batched forward with a tree-attention mask (each node attends to the committed
cache plus its own ancestors only), then a per-slot recursive rejection walk
(SpecInfer's multi-round speculative sampling) picks a root-to-node path whose
emitted tokens follow the target distribution EXACTLY — greedy output is
bitwise the target-only engine's (tested).

Why trees beat chains at equal depth: a chain round dies at the first
rejection; a tree retries each level with ``b`` i.i.d. alternatives, so the
per-level survival rate rises from ``a`` to ``1-(1-a)^b`` (acceptance ``a``).

Mechanics that differ from the chain engine (`infer/spec_serving`):

* Sibling nodes share a cache position (same depth), so tree tokens can NOT be
  written into the paged KV pool during the forward (writes would collide).
  `tree_forward` runs cache-write-FREE: fresh K/V for the tree nodes attend via
  an explicit ancestor mask, concatenated column-wise with the gathered page
  cache (masked strictly below the committed length `pos`), and come out of the
  layer scan as per-layer ys.
* After the acceptance walk, `_commit_path` scatters ONLY the accepted path's
  per-layer K/V into the pool (one fused scan over layers; rejected slots and
  idle engine slots route to the trash page 0, exactly like prefill padding).
* The draft expands the tree level-by-level on the SAME cacheless forward
  (recompute over the partial tree — widths are tiny, the draft is small); a
  final full-width draft forward captures draft-side K/V so the draft pool
  commits the same accepted path. Both pools are therefore complete below
  ``pos`` at the start of every round — no (prev, cur) hole-filling pair is
  needed at all.

Reference baseline: the chain engine extends `generate.py:61-87`'s loop with
draft lookahead; this module is beyond-reference capability (ROADMAP item 3).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import (
    PagePool,
    _gathered,
    _masked_softmax,
    commit_writes,
    commit_writes_jit,
)
from lit_llama_ja_tpu.infer.spec_serving import (
    SpeculativePagedEngine,
    _dist_batch,
)
from lit_llama_ja_tpu.models.llama import apply_linear, mlp_block
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import build_rope_cache


# --------------------------------------------------------------------------
# static tree topology (derived from the branching tuple at trace time)
# --------------------------------------------------------------------------
def tree_topology(branching: Tuple[int, ...]):
    """Node arrays for the static candidate tree.

    Node 0 is the root (the committed-position token `cur`); level ``d`` nodes
    sit at cache position ``pos + d``. Returns a dict of numpy arrays:
    parents (NT,), depths (NT,), ancestor mask (NT, NT) (self-inclusive),
    children table (NT, c_max) (-1 padded), per-level node index lists, and
    sibling ranks (rank of each node among its parent's children).
    """
    assert len(branching) >= 1 and all(b >= 1 for b in branching)
    parents = [-1]
    depths = [0]
    ranks = [0]
    levels = [[0]]
    prev = [0]
    for b in branching:
        new = []
        for p in prev:
            for r in range(b):
                new.append(len(parents))
                parents.append(p)
                depths.append(depths[p] + 1)
                ranks.append(r)
        levels.append(new)
        prev = new
    NT = len(parents)
    anc = np.zeros((NT, NT), bool)
    for i in range(NT):
        j = i
        while j != -1:
            anc[i, j] = True
            j = parents[j]
    c_max = max(branching)
    children = -np.ones((NT, c_max), np.int32)
    fill = np.zeros(NT, np.int32)
    for i in range(1, NT):
        p = parents[i]
        children[p, fill[p]] = i
        fill[p] += 1
    return {
        "parents": np.asarray(parents, np.int32),
        "depths": np.asarray(depths, np.int32),
        "anc": anc,
        "children": children,
        "levels": [np.asarray(l, np.int32) for l in levels],
        "ranks": np.asarray(ranks, np.int32),
        "n_nodes": NT,
        "depth": len(branching),
        "c_max": c_max,
    }


# --------------------------------------------------------------------------
# cache-write-free tree attention + forward
# --------------------------------------------------------------------------
def _tree_attention(q, gath, fk, fv, pos_base, tmask, quantized):
    """Attention of W tree-node queries against [paged cache | fresh tree K/V].

    q/fk/fv: (B, nh, W, hd); gath: page-cache views (B, nh, S, ...);
    pos_base: (B,) committed length (cache columns >= pos_base are masked —
    they hold stale writes from earlier rounds); tmask: (W, W) ancestor mask.
    Same folded-scale math as `infer/paged._paged_attention` on the cache side;
    the fresh side is always bf16. One softmax over the concatenated columns.
    """
    B, nh, W, hd = q.shape
    S = gath["k"].shape[2]
    scale = 1.0 / (hd**0.5)
    cmask = (
        jnp.arange(S, dtype=pos_base.dtype)[None, :] < pos_base[:, None]
    )[:, None, None, :]  # (B, 1, 1, S)
    cmask = jnp.broadcast_to(cmask, (B, 1, W, S))
    tm = jnp.broadcast_to(tmask[None, None], (B, 1, W, W))
    mask = jnp.concatenate([cmask, tm], axis=-1)  # (B, 1, W, S+W)

    att_t = jnp.einsum("bhqd,bhsd->bhqs", q, fk.astype(q.dtype))
    if quantized and gath["k"].dtype == jnp.uint8:  # int4 head-pair packed
        from lit_llama_ja_tpu.ops.attention import int4_scores, int4_values

        att_c = int4_scores(q, gath["k"])
        att_c = att_c * gath["k_scale"][:, :, None, :].astype(jnp.float32)
        att = _masked_softmax(
            jnp.concatenate([att_c, att_t.astype(att_c.dtype)], -1) * scale,
            mask,
        )
        ac, at = att[..., :S], att[..., S:].astype(q.dtype)
        ac = (ac * gath["v_scale"][:, :, None, :]).astype(q.dtype)
        y_c = int4_values(ac, gath["v"])
        return y_c + jnp.einsum("bhqs,bhsd->bhqd", at, fv.astype(q.dtype))
    if quantized:
        att_c = jnp.einsum("bhqd,bhsd->bhqs", q, gath["k"].astype(q.dtype))
        att_c = att_c * gath["k_scale"][:, :, None, :].astype(jnp.float32)
        att = _masked_softmax(
            jnp.concatenate([att_c, att_t.astype(att_c.dtype)], -1) * scale,
            mask,
        )
        ac = (att[..., :S] * gath["v_scale"][:, :, None, :]).astype(q.dtype)
        at = att[..., S:].astype(q.dtype)
        return jnp.einsum(
            "bhqs,bhsd->bhqd", ac, gath["v"].astype(q.dtype)
        ) + jnp.einsum("bhqs,bhsd->bhqd", at, fv.astype(q.dtype))
    att_c = jnp.einsum("bhqd,bhsd->bhqs", q, gath["k"].astype(q.dtype))
    att = _masked_softmax(
        (jnp.concatenate([att_c, att_t], -1) * scale).astype(jnp.float32),
        mask,
    ).astype(q.dtype)
    return jnp.einsum(
        "bhqs,bhsd->bhqd", att[..., :S], gath["v"].astype(q.dtype)
    ) + jnp.einsum("bhqs,bhsd->bhqd", att[..., S:], fv.astype(q.dtype))


def tree_block_chain(
    blocks,
    pool: PagePool,
    x: jax.Array,  # (B, W, D) embedded tree-node inputs
    pos: jax.Array,  # (B,) committed length; node i sits at pos + depth[i]
    tables: jax.Array,  # (B, AP)
    config: LLaMAConfig,
    depths: np.ndarray,  # (W,) static
    tmask: np.ndarray,  # (W, W) static ancestor mask
    quantized,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The cache-write-free transformer chain of `tree_forward` (between the
    embedding and the final norm), factored out so pipeline-parallel tree
    verification (`parallel/pp_spec.make_pp_tree_verify`) can run it on a
    stage's LOCAL layer shard: the ``blocks``/``pool`` leading L axis may be
    any contiguous layer slice. Returns (x, ks (L, B, W, nh, hd), vs)."""
    B, W = x.shape[:2]
    nh, hd = config.n_head, config.head_dim
    page = pool["k"].shape[3]
    node_pos = pos[:, None] + jnp.asarray(depths, jnp.int32)[None, :]  # (B, W)
    rope_len = max(config.block_size, tables.shape[1] * page)
    rope_full = build_rope_cache(rope_len, hd, config.rope_base)
    rope_t = rope_full[jnp.clip(node_pos, 0, rope_len - 1)]  # (B, W, hd/2, 2)
    tmask_j = jnp.asarray(tmask)

    def rot(t):
        t32 = t.astype(jnp.float32).reshape(B, W, nh, hd // 2, 2)
        rc = rope_t.astype(jnp.float32)[:, :, None]
        cos, sin = rc[..., 0], rc[..., 1]
        x0, x1 = t32[..., 0], t32[..., 1]
        out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
        return out.reshape(B, W, nh, hd).astype(t.dtype)

    def body(x, layer_in):
        block_params, cache_l = layer_in
        h = rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps)
        qkv = apply_linear(block_params["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rot(q.reshape(B, W, nh, hd))
        k = rot(k.reshape(B, W, nh, hd))
        v = v.reshape(B, W, nh, hd)
        gath = _gathered(cache_l, tables)
        y = _tree_attention(
            q.transpose(0, 2, 1, 3),
            gath,
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            pos,
            tmask_j,
            quantized,
        )
        y = y.transpose(0, 2, 1, 3).reshape(B, W, config.n_embd)
        x = x + apply_linear(block_params["attn"]["c_proj"], y)
        x = x + mlp_block(
            block_params["mlp"],
            rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps),
        )
        return x, (k, v)

    return jax.lax.scan(body, x, (blocks, pool))


def tree_forward(
    params,
    toks: jax.Array,  # (B, W) tree-node tokens (node 0 = cur)
    pos: jax.Array,  # (B,) committed length; node i sits at pos + depth[i]
    tables: jax.Array,  # (B, AP)
    pool: PagePool,
    config: LLaMAConfig,
    depths: np.ndarray,  # (W,) static
    tmask: np.ndarray,  # (W, W) static ancestor mask
    quantized,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cache-write-free forward over W tree nodes. Returns
    (logits (B, W, V), fresh k (L, B, W, nh, hd), fresh v (same)) — the K/V ys
    feed `_commit_path` after the acceptance walk."""
    x = params["wte"]["weight"][toks]
    x, (ks, vs) = tree_block_chain(
        params["blocks"], pool, x, pos, tables, config, depths, tmask,
        quantized,
    )
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    return apply_linear(params["lm_head"], x), ks, vs


def _path_writes(ks, vs, path, keep, pos, tables, page, quantized):
    """Commit payload for the accepted path's fresh K/V.

    ks/vs: (L, B, W, nh, hd) from `tree_forward`; path: (B, J) node indices
    (path[:, 0] = 0 = root); keep: (B, J) bool (False → trash page 0);
    depth j commits at position ``pos + j``. Returns (writes, page_idx, offs)
    for `commit_writes`/`commit_writes_jit`.
    """
    B, J = path.shape
    positions = pos[:, None] + jnp.arange(J, dtype=jnp.int32)[None, :]
    pg = jnp.take_along_axis(
        tables, jnp.clip(positions // page, 0, tables.shape[1] - 1), axis=1
    )
    page_idx = jnp.where(keep, pg, 0)
    offs = positions % page
    bar = jnp.arange(B)[:, None]
    selk = ks[:, bar, path]  # (L, B, J, nh, hd)
    selv = vs[:, bar, path]
    if quantized == "int4":
        from lit_llama_ja_tpu.ops.attention import quantize_kv4

        kq, ksc, vq, vsc = quantize_kv4(selk, selv)
        writes = {"k": kq, "v": vq,
                  "k_scale": ksc[..., 0], "v_scale": vsc[..., 0]}
    elif quantized:
        from lit_llama_ja_tpu.ops.attention import quantize_kv

        kq, ksc, vq, vsc = quantize_kv(selk, selv)
        writes = {"k": kq, "v": vq,
                  "k_scale": ksc[..., 0], "v_scale": vsc[..., 0]}
    else:
        # commit_writes casts to the pool leaf dtype at write time
        writes = {"k": selk, "v": selv}
    return writes, page_idx, offs


# --------------------------------------------------------------------------
# acceptance walk (SpecInfer multi-round rejection, vectorized over slots)
# --------------------------------------------------------------------------
def tree_accept_walk(
    p_all: jax.Array,  # (B, NT, V) target dists per node
    q_all: jax.Array,  # (B, NT, V) draft dists (valid at non-leaf nodes)
    toks: jax.Array,  # (B, NT) tree tokens
    branching: Tuple[int, ...],
    key: jax.Array,
    temps: jax.Array,  # (B,) — only used to pick deterministic-vs-sampled u
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Walk the tree root-down. At each node, try its children in order:
    accept child token x with prob min(1, r(x)/q(x)); on rejection fold the
    draft mass out of the residual, r ← norm(max(r − q, 0)). On a fully
    rejected level (or a leaf) emit one final token from r and stop. Output
    distribution is exactly the target's (SpecInfer alg. 2; i.i.d. siblings).

    Returns (tokens (B, D+1), n_out (B,), path (B, D+1) node idx, n_acc (B,)).
    ``tokens[b, :n_out[b]]`` are the emitted tokens; greedy (temp 0, one-hot
    dists) reduces to exact argmax matching, bitwise the plain engine's.
    """
    topo = tree_topology(branching)
    D, c_max, NT = topo["depth"], topo["c_max"], topo["n_nodes"]
    B, _, V = p_all.shape
    children = jnp.asarray(topo["children"])  # (NT, c_max)
    bar = jnp.arange(B)

    keys = jax.random.split(key, D * c_max + 1)
    kfin, kuse = keys[0], keys[1:]

    r = p_all[:, 0]  # residual starts at the target's root dist
    cur = jnp.zeros(B, jnp.int32)
    alive = jnp.ones(B, bool)
    n_acc = jnp.zeros(B, jnp.int32)
    path = jnp.zeros((B, D + 1), jnp.int32)
    out = jnp.zeros((B, D + 1), jnp.int32)

    ki = 0
    for d in range(1, D + 1):
        q_par = q_all[bar, cur]  # (B, V) draft dist the children came from
        accepted = jnp.zeros(B, bool)
        nxt = jnp.zeros(B, jnp.int32)
        for ci in range(c_max):
            child = children[cur, ci]
            valid = alive & ~accepted & (child >= 0)
            childc = jnp.maximum(child, 0)
            x = toks[bar, childc]
            rx = r[bar, x]
            qx = q_par[bar, x]
            u = jax.random.uniform(kuse[ki], (B,))
            ki += 1
            acc = valid & (u < rx / jnp.maximum(qx, 1e-30))
            rej = valid & ~acc
            rnew = jnp.maximum(r - q_par, 0.0)
            rsum = rnew.sum(axis=-1, keepdims=True)
            rnew = jnp.where(rsum > 1e-30, rnew / jnp.maximum(rsum, 1e-30), r)
            r = jnp.where(rej[:, None], rnew, r)
            accepted = accepted | acc
            nxt = jnp.where(acc, childc, nxt)
        cur = jnp.where(accepted, nxt, cur)
        n_acc = n_acc + accepted
        path = path.at[:, d].set(jnp.where(accepted, nxt, 0))
        out = out.at[:, d - 1].set(toks[bar, cur])
        p_new = p_all[bar, cur]
        r = jnp.where(accepted[:, None], p_new, r)
        alive = alive & accepted

    final = jax.random.categorical(kfin, jnp.log(r + 1e-30), axis=-1).astype(
        jnp.int32
    )
    out = out.at[bar, n_acc].set(final)
    return out, n_acc + 1, path, n_acc


def _tree_draft_propose(
    dparams,
    cur: jax.Array,  # (B,)
    pos: jax.Array,  # (B,)
    tables: jax.Array,  # (B, AP)
    dpool: PagePool,
    dcfg: LLaMAConfig,
    branching: Tuple[int, ...],
    temps: jax.Array,
    top_k: Optional[int],
    top_p: Optional[float],
    key: jax.Array,
):
    """Draft side of a tree round: expand the candidate tree level-by-level
    with cacheless partial-tree forwards (the draft is small — recompute is
    cheaper than a colliding cache write), then one full-width forward to
    capture the draft's per-layer K/V for the post-walk path commit. Shared by
    the single-mesh round and the pipeline-parallel round (the draft runs
    REPLICATED over the pp mesh). Returns (toks (B, NT), q_all (B, NT, V)
    draft dists at non-leaf nodes, dks, dvs (L, B, NT, nh, hd))."""
    topo = tree_topology(branching)
    NT, D = topo["n_nodes"], topo["depth"]
    B = cur.shape[0]
    V = dcfg.padded_vocab_size

    toks = jnp.zeros((B, NT), jnp.int32).at[:, 0].set(cur)
    q_all = jnp.zeros((B, NT, V), jnp.float32)
    exp_keys = jax.random.split(key, D)

    for d in range(D):
        W = int(topo["levels"][d][-1]) + 1  # nodes 0 .. end of level d
        logits, _, _ = tree_forward(
            dparams, toks[:, :W], pos, tables, dpool, dcfg,
            topo["depths"][:W], topo["anc"][:W, :W], False,
        )
        par_idx = topo["levels"][d]  # (n_par,) static
        n_par = len(par_idx)
        par_logits = logits[:, par_idx]  # (B, n_par, V)
        dists = _dist_batch(
            par_logits.reshape(B * n_par, V),
            jnp.repeat(temps, n_par),
            top_k,
            top_p,
        ).reshape(B, n_par, V)
        q_all = q_all.at[:, par_idx].set(dists)
        b = branching[d]
        new_idx = topo["levels"][d + 1]  # (n_par * b,) parent-major
        # i.i.d. samples from each parent's dist (temp > 0) ...
        rep = jnp.repeat(dists, b, axis=1)  # (B, n_par*b, V)
        sampled = jax.random.categorical(
            exp_keys[d], jnp.log(rep + 1e-30), axis=-1
        ).astype(jnp.int32)
        # ... or the draft's top-b logit tokens (temp == 0, distinct): new
        # nodes are parent-major, so node m belongs to parent m//b at sibling
        # rank m%b — both static index arrays
        top_toks = jax.lax.top_k(par_logits, b)[1].astype(jnp.int32)
        ranks = topo["ranks"][new_idx]  # (n_par*b,) static sibling ranks
        greedy = top_toks[:, np.repeat(np.arange(n_par), b), ranks]
        chosen = jnp.where((temps > 0)[:, None], sampled, greedy)
        toks = toks.at[:, new_idx].set(chosen)

    # draft K/V capture (full tree, all tokens now filled)
    _, dks, dvs = tree_forward(
        dparams, toks, pos, tables, dpool, dcfg,
        topo["depths"], topo["anc"], False,
    )
    return toks, q_all, dks, dvs


# --------------------------------------------------------------------------
# the fused round program
# --------------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "branching", "quantized", "top_k", "top_p"),
    donate_argnums=(5,),
)
def _tree_spec_round(
    tparams,
    dparams,
    cur: jax.Array,  # (B,) token at pos (not yet in either cache)
    pos: jax.Array,  # (B,)
    tpool: PagePool,
    dpool: PagePool,
    tables: jax.Array,  # (B, AP)
    key: jax.Array,
    temps: jax.Array,  # (B,)
    tcfg: LLaMAConfig,
    dcfg: LLaMAConfig,
    branching: Tuple[int, ...],
    quantized,
    top_k: Optional[int],
    top_p: Optional[float],
):
    """One batched tree round: draft-expand level by level (cacheless partial-
    tree forwards), verify all nodes in one target forward, walk, commit the
    accepted path. Returns (tokens (B, D+1), n_out (B,), target commit
    payload for `commit_writes_jit` (the big target pool stays read-only
    here — a fused read+write program pays full pool copies, see
    `infer/paged.commit_writes_jit`), draft pool (small, committed
    in-program))."""
    topo = tree_topology(branching)
    NT, D = topo["n_nodes"], topo["depth"]
    B = cur.shape[0]
    kexp, kwalk = jax.random.split(key)

    # --- draft expansion + K/V capture ---------------------------------------
    toks, q_all, dks, dvs = _tree_draft_propose(
        dparams, cur, pos, tables, dpool, dcfg, branching, temps,
        top_k, top_p, kexp,
    )

    # --- target verify -------------------------------------------------------
    tlogits, tks, tvs = tree_forward(
        tparams, toks, pos, tables, tpool, tcfg,
        topo["depths"], topo["anc"], quantized,
    )
    TV = tlogits.shape[-1]
    p_all = _dist_batch(
        tlogits.reshape(B * NT, TV), jnp.repeat(temps, NT), top_k, top_p
    ).reshape(B, NT, TV)

    # --- walk + commit --------------------------------------------------------
    tokens, n_out, path, n_acc = tree_accept_walk(
        p_all, q_all, toks, branching, kwalk, temps
    )
    keep = jnp.arange(D + 1, dtype=jnp.int32)[None, :] <= n_acc[:, None]
    page = dpool["k"].shape[3]
    tcommit = _path_writes(tks, tvs, path, keep, pos, tables, page, quantized)
    dpool = commit_writes(
        dpool, *_path_writes(dks, dvs, path, keep, pos, tables, page, False)
    )
    return tokens, n_out, tcommit, dpool


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------
class TreeSpeculativePagedEngine(SpeculativePagedEngine):
    """Paged continuous-batching engine whose decode step is a batched TREE
    speculative round: up to ``len(tree) + 1`` tokens per slot per step, with
    per-level retry width ``tree[d]``. ``tree=(k,)`` is multi-sample chain
    speculation of depth 1; ``tree=(1, 1, ..)`` degenerates to the chain
    engine's K-token lookahead."""

    def __init__(self, params, config, *, tree: Tuple[int, ...] = (4, 2, 2),
                 pp_microbatches: int = 1, **kwargs):
        tree = tuple(int(b) for b in tree)
        super().__init__(
            params, config, draft_k=len(tree),
            pp_microbatches=pp_microbatches, **kwargs
        )
        self.tree = tree
        self._topo = tree_topology(tree)
        self._pp_tree_round = None
        self._pp_tree_commit = None
        if self._pp_mesh is not None:
            from lit_llama_ja_tpu.parallel.pp_decode import make_pp_commit
            from lit_llama_ja_tpu.parallel.pp_spec import make_pp_tree_round

            # The tree round's target side is two-dispatch by construction
            # (tree nodes cannot be cache-written), regardless of pp_split.
            # Kept in a SEPARATE attribute: overloading self._pp_commit would
            # flip PagedEngine._prefill_span into the 4-tuple two-dispatch
            # unpack while pp_split=False leaves _pp_prefill as the fused
            # 2-tuple program.
            self._pp_tree_commit = (
                self._pp_commit
                if self._pp_commit is not None
                else make_pp_commit(self._pp_mesh, self.pool)
            )

            # self.params/self.pool are already pp-sharded by PagedEngine's
            # init; the maker only uses them for spec construction
            self._pp_tree_round = make_pp_tree_round(
                config, self.dcfg, self._pp_mesh, self.params, self.pool,
                branching=tree, n_micro=pp_microbatches,
                quantized=self.quantized,
            )

    def step(self) -> List[Tuple[int, int, bool]]:
        from lit_llama_ja_tpu.infer.generate import bucket_length

        self._admit()
        self._advance_prefills()
        while not self._ensure_capacity():
            active = self._decoding()
            if not active:
                return []
            victim = max(active, key=lambda r: self.pos[r.slot])
            self._retire(victim)
            victim.preempts += 1
            self._preempts += 1
            if victim.preempts > 3 or not victim.tokens:
                victim.done = True
            else:
                self.queue.insert(0, victim)
        active = self._decoding()
        if not active:
            return []
        max_pages = max(
            (int(self.pos[r.slot]) + self.K) // self.page + 1 for r in active
        )
        ap = min(bucket_length(max_pages, minimum=1), self.maxP)
        self.key, sub = jax.random.split(self.key)
        if self._pp_tree_round is not None:
            tokens, n_out, tcommit, self.dpool = self._pp_tree_round(
                self.params,
                self.dparams,
                jnp.asarray(self.cur),
                jnp.asarray(self.pos),
                jnp.asarray(self.tables[:, :ap]),
                self.pool,
                self.dpool,
                sub,
                jnp.asarray(self.temps),
                self.top_k,
                self.top_p,
            )
            self.pool = self._pp_tree_commit(self.pool, *tcommit)
        else:
            tokens, n_out, tcommit, self.dpool = _tree_spec_round(
                self.params,
                self.dparams,
                jnp.asarray(self.cur),
                jnp.asarray(self.pos),
                self.pool,
                self.dpool,
                jnp.asarray(self.tables[:, :ap]),
                sub,
                jnp.asarray(self.temps),
                self.config,
                self.dcfg,
                self.tree,
                self.quantized,
                self.top_k,
                self.top_p,
            )
            self.pool = commit_writes_jit(self.pool, *tcommit)
        tokens = np.asarray(tokens)
        n_out = np.asarray(n_out)
        round_drafted = round_accepted = 0
        for r in active:
            acc = int(np.clip(n_out[r.slot] - 1, 0, self.K))
            self.slot_drafted[r.slot] += self.K
            self.slot_accepted[r.slot] += acc
            round_drafted += self.K
            round_accepted += acc
        self._spec_rounds += 1
        self._drafted += round_drafted
        self._accepted += round_accepted
        if round_drafted:
            rate = round_accepted / round_drafted
            self._accept_ema = (
                rate
                if self._accept_ema is None
                else self.k_ema_decay * self._accept_ema
                + (1.0 - self.k_ema_decay) * rate
            )
        emitted = []
        for slot, req in enumerate(self.slot_req):
            if req is None or slot in self.prefilling:
                continue
            budget = req.max_new_tokens - len(req.tokens)
            n = min(int(n_out[slot]), budget)
            toks = tokens[slot, :n].tolist()
            if self.eos_id is not None and self.eos_id in toks:
                n = toks.index(self.eos_id) + 1
                toks = toks[:n]
            req.tokens.extend(toks)
            self.pos[slot] += n
            self.cur[slot] = toks[-1]
            self._maybe_finish(req)
            if req.done:
                self._completed += 1
            for t in toks:
                emitted.append((req.req_id, t, req.done))
        self._steps += 1
        self._tokens_out += len(emitted)
        return emitted
