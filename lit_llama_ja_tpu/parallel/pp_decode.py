"""Pipeline-parallel paged decode: serving across meshes tensor parallelism
alone cannot reach.

The reference has no pipeline parallelism and no serving runtime at all
(SURVEY.md §2.3); `parallel/pipeline.py` added GPipe *training*. This module
adds the inference side: the paged serving engine's decode step executed with
the transformer layers (and their slice of the page pool) sharded over a
``'pp'`` mesh axis. Use case: models whose weights exceed one host's HBM even
int4-quantized, where 'tp' over ICI runs out of devices — pp spans hosts with
one activation hop per stage boundary (DCN-friendly: (mbs, T, D) bytes per
tick, vs tp's per-layer all-reduces).

Schedule: the B engine slots are split into M microgroups; at tick ``t`` stage
``s`` decodes microgroup ``t − s`` (the classic GPipe wavefront, M + S − 1
ticks per engine step). Stage 0 embeds, every stage runs its local
`paged_block_chain` (`infer/paged.py` — the SAME code the single-mesh engine
runs; the leading layer axis of blocks/pool is simply the local shard), the
last stage projects logits. Steady-state stage utilization is M/(M+S−1).

ONE wavefront, many programs: `make_pp_span_forward` is the single
implementation of the microgroup schedule (slicing, active masking, ppermute,
logits concat/psum, deferred-write placement). Decode (T=1), speculative
verify (T=K+1, `parallel/pp_spec.make_pp_verify`) and tree verify (T=NT with
a tree-attention chain, `make_pp_tree_verify`) are thin parameterizations —
`T`, `defer_commit`, and the per-tick ``chain`` callable. A schedule fix lands
once. Prefill (a single (1, T) span — M=1 cannot wavefront) keeps its own
S-tick loop, shared between the fused and two-dispatch variants.

Idle-tick hygiene: a stage with no microgroup in range still executes the
chain (SPMD — everyone runs the same program); its writes are pointed at the
reserved trash page (page 0) at position 0, the same convention the engines
use for idle slots, and its outputs are masked out. `_masked_softmax` keeps
those garbage rows finite, so they can never poison real slots through the
shared pool.

KV-cache layout: the page pool's leaves are ``(L, n_pages, ...)`` — the layer
axis shards over 'pp' with NO resharding (`shard_pool_pp`), exactly like the
parameter blocks (`pipeline.shard_params_pp`). Page tables, the allocator, and
all engine bookkeeping are layer-oblivious, so prefix sharing / preemption /
chunked prefill work unchanged on top of this step.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import (
    PagePool,
    commit_writes,
    paged_block_chain,
    sample_next_token,
)
from lit_llama_ja_tpu.models.llama import apply_linear
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.parallel.pipeline import pp_param_specs, shard_params_pp


def pp_pool_specs(pool: PagePool, axis: str = "pp"):
    """Every pool leaf is ``(L, ...)`` → shard the layer axis."""
    return jax.tree.map(lambda _: P(axis), pool)


def shard_pool_pp(pool: PagePool, mesh: Mesh, axis: str = "pp") -> PagePool:
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(axis))), pool
    )


# ---------------------------------------------------------------------------
# pp × tp serving (GSPMD-auto in-stage tensor parallelism)
#
# The wavefront shard_maps above are manual over 'pp' ONLY
# (``axis_names={axis}``): any other mesh axis stays under GSPMD control
# inside the body, so in-stage tensor parallelism needs no tp-aware chain —
# place the params/pool with the combined specs below and XLA partitions each
# stage's block math over 'tp'/'fsdp' exactly as it does for the single-mesh
# tensor-sharded engine (tests/test_paged.py::test_sharded_paged_engine).
# ---------------------------------------------------------------------------

def pp_auto_param_shardings(params, mesh: Mesh, axis: str = "pp"):
    """Combined placement: blocks lead with the 'pp' layer shard and keep
    their `parallel/specs.py` col/row (tp × fsdp) dims; non-block leaves keep
    the base specs. No qkv relayout — GSPMD handles the fused (L, D, 3D)
    column shard automatically (the training-side megatron path in
    `parallel/pipeline.py` needs the relayout only because its in-stage math
    is hand-written)."""
    from lit_llama_ja_tpu.parallel.specs import param_specs

    specs = param_specs(params)

    def with_pp(sp):
        t = tuple(sp)
        return P(axis, *t[1:]) if t else P(axis)

    specs["blocks"] = jax.tree.map(
        with_pp, specs["blocks"], is_leaf=lambda x: isinstance(x, P)
    )
    return jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def pp_auto_pool_shardings(pool: PagePool, mesh: Mesh, axis: str = "pp"):
    """Pool leaves (L, n_pages, nh[, page[, hd]]): layer axis over 'pp',
    heads over 'tp' (the `parallel/specs.KV_CACHE_SPEC` head split) when the
    head count divides — otherwise heads replicate (GSPMD reshards around the
    attention as needed; int4 pools have nh/2 head-pair planes)."""
    tp_ways = mesh.shape["tp"] if "tp" in mesh.axis_names else 1

    def sh(a):
        tp = "tp" if tp_ways > 1 and a.shape[2] % tp_ways == 0 else None
        return NamedSharding(mesh, P(axis, None, tp, *(None,) * (a.ndim - 3)))

    return jax.tree.map(sh, pool)


def mesh_has_auto_axes(mesh: Mesh, axis: str = "pp") -> bool:
    return any(
        mesh.shape[a] > 1 for a in mesh.axis_names if a != axis
    )


def make_pp_span_forward(
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
    chain: Optional[Callable] = None,
    write_proto=None,
):
    """THE GPipe microgroup wavefront (see module docstring). Returns the
    un-jitted shard_map program ``inner(params, toks, pos, tables, pool)``:

    * ``toks`` is ``(B, T)``; ``pos``/``tables`` are sliced along axis 0 per
      microgroup and handed to ``chain`` as-is otherwise (so per-token
      ``(B, T)`` positions and per-slot ``(B,)`` base positions both work).
    * fused (``defer_commit=False``): each tick's chain threads the pool;
      returns ``(logits (B, T, V), pool)``.
    * two-dispatch (``defer_commit=True``): the pool stays a read-only
      loop-invariant; each tick's fresh K/V is placed into per-microgroup
      write buffers (leaves ``(L_local, B, T, ...)``, pp-sharded) for a
      separate `make_pp_commit`; returns ``(logits, writes)``. Rationale at
      `infer/paged.commit_writes_jit` (donated read+write programs pay full
      pool copies).

    ``chain(blocks, pool, x (mbs, T, D), pos_m, tab_m)`` runs one stage's
    local layer shard: → ``(h, pool)`` fused, ``(h, writes_pytree)`` deferred.
    Defaults to `paged_block_chain`. ``write_proto`` fixes the deferred
    writes' pytree STRUCTURE for shard_map out_specs (defaults to the pool's).
    """
    S = int(mesh.shape[axis])
    M = n_micro
    L = config.n_layer
    assert L % S == 0, f"n_layer={L} not divisible by pp={S}"
    pspecs = pp_param_specs(params)
    poolspecs = pp_pool_specs(pool, axis)
    if chain is None:
        if defer_commit:

            def chain(blocks, pool, x, pos_m, tab_m):
                h, w, _, _ = paged_block_chain(
                    blocks, pool, x, pos_m, tab_m, config, quantized,
                    defer_commit=True,
                )
                return h, w

        else:

            def chain(blocks, pool, x, pos_m, tab_m):
                return paged_block_chain(
                    blocks, pool, x, pos_m, tab_m, config, quantized
                )

    proto = pool if write_proto is None else write_proto
    wspecs = jax.tree.map(lambda _: P(axis), proto)
    perm = [(i, i + 1) for i in range(S - 1)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspecs, P(), P(), P(), poolspecs),
        out_specs=(P(), wspecs if defer_commit else poolspecs),
        check_vma=False,
        axis_names=frozenset({axis}),
    )
    def inner(params, toks, pos, tables, pool):
        s = jax.lax.axis_index(axis)
        B = toks.shape[0]
        assert B % M == 0, f"batch {B} not divisible by n_micro={M}"
        mbs = B // M
        emb_all = params["wte"]["weight"][toks]  # (B, T, D)
        buf = jnp.zeros((mbs, T, emb_all.shape[-1]), emb_all.dtype)
        parts = []
        bufs = None  # deferred mode: per-pool-key (L_local, B, T, ...) buffers
        for t in range(M + S - 1):
            m = t - s  # this stage's microgroup at this tick (traced)
            active = (m >= 0) & (m < M)
            start = jnp.clip(m, 0, M - 1) * mbs
            emb = jax.lax.dynamic_slice_in_dim(emb_all, start, mbs, 0)
            pos_m = jax.lax.dynamic_slice_in_dim(pos, start, mbs, 0)
            tab_m = jax.lax.dynamic_slice_in_dim(tables, start, mbs, 0)
            # idle ticks write to the trash page at position 0
            pos_m = jnp.where(active, pos_m, 0)
            tab_m = jnp.where(active, tab_m, 0)
            x_in = jnp.where(s == 0, emb, buf)
            if defer_commit:
                h, w_t = chain(params["blocks"], pool, x_in, pos_m, tab_m)
                if bufs is None:
                    bufs = jax.tree.map(
                        lambda w: jnp.zeros(
                            (w.shape[0], B) + w.shape[2:], w.dtype
                        ),
                        w_t,
                    )

                def place(b, w):
                    # each stage sees each microgroup exactly once (active);
                    # the clipped start on inactive ticks must not clobber
                    # real writes, so inactive ticks keep the existing slice
                    cur = jax.lax.dynamic_slice_in_dim(b, start, mbs, axis=1)
                    return jax.lax.dynamic_update_slice_in_dim(
                        b, jnp.where(active, w, cur), start, axis=1
                    )

                bufs = jax.tree.map(place, bufs, w_t)
            else:
                h, pool = chain(params["blocks"], pool, x_in, pos_m, tab_m)
            if t >= S - 1:
                # on the last stage this is microgroup t-(S-1); garbage on
                # other stages (masked below)
                y = rmsnorm(h, params["ln_f"]["scale"], config.norm_eps)
                parts.append(apply_linear(params["lm_head"], y))  # (mbs,T,V)
            if S > 1:
                buf = jax.lax.ppermute(h, axis, perm)
        logits = jnp.concatenate(parts, axis=0)  # (B, T, V)
        logits = jnp.where(s == S - 1, logits, 0)
        return jax.lax.psum(logits, axis), bufs if defer_commit else pool

    return inner


def make_pp_decode_step(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    n_micro: int = 1,
    quantized=False,
    axis: str = "pp",
):
    """Build the jitted FUSED pipeline decode program (T=1 wavefront).

    ``params``/``pool`` are used for spec construction only (any placement).
    Returns ``step(params, toks (B,), pos (B,), tables (B, AP), pool, key,
    temps, top_k, top_p) -> (next_tokens (B,), pool)`` — same contract as the
    single-mesh `_paged_decode_and_sample`, with ``B % n_micro == 0``.
    """
    inner = make_pp_span_forward(
        config, mesh, params, pool, T=1, n_micro=n_micro,
        quantized=quantized, axis=axis, defer_commit=False,
    )

    @partial(jax.jit, static_argnames=("top_k", "top_p"), donate_argnums=(4,))
    def step(
        params,
        toks: jax.Array,  # (B,)
        pos: jax.Array,  # (B,)
        tables: jax.Array,  # (B, AP)
        pool: PagePool,
        key: jax.Array,
        temps: jax.Array,  # (B,)
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> Tuple[jax.Array, PagePool]:
        logits, pool = inner(
            params, toks[:, None], pos[:, None], tables, pool
        )
        next_tok = sample_next_token(logits[:, 0], key, temps, top_k, top_p)
        return next_tok, pool

    return step


def make_pp_commit(mesh: Mesh, pool: PagePool, axis: str = "pp"):
    """Write-only pipeline commit: each stage scatters its local layer shard
    of ``writes`` into its local pool shard. The pool is donated and never
    read, so XLA updates it in place — the same two-dispatch rationale as the
    single-mesh `commit_writes_jit` (a fused read+write program pays full pool
    copies; see infer/paged.py). ``writes`` leaves are ``(L, B, T, ...)`` with
    the layer axis sharded over ``axis`` (as produced by the read programs
    above). Returns ``commit(pool, writes, page_idx, offs) -> pool``."""
    poolspecs = pp_pool_specs(pool, axis)
    wspecs = jax.tree.map(lambda _: P(axis), pool)  # same dict keys as writes

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(poolspecs, wspecs, P(), P()),
        out_specs=poolspecs,
        check_vma=False,
        axis_names=frozenset({axis}),
    )
    def inner(pool, writes, page_idx, offs):
        return commit_writes(pool, writes, page_idx, offs)

    return jax.jit(inner, donate_argnums=(0,))


def make_pp_decode_read(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    n_micro: int = 1,
    quantized=False,
    axis: str = "pp",
):
    """Read half of the two-dispatch pipeline decode: the T=1 wavefront with
    the pool a read-only loop-invariant — the span's K/V comes back as
    ``writes`` (layer axis pp-sharded) for a separate `make_pp_commit`
    dispatch. Within one engine step every slot is decoded exactly once, so no
    microgroup ever needs another's same-step writes (they are different slots
    → different pages), and the deferred `paged_block_chain` path already
    attends to the span's own tokens through explicit fresh columns — the
    split is bitwise-exact vs the fused step.

    Returns ``read(params, toks (B,), pos (B,), tables (B, AP), pool, key,
    temps, top_k, top_p) -> (next_tokens (B,), writes, page_idx (B, 1),
    offs (B, 1))``.
    """
    inner = make_pp_span_forward(
        config, mesh, params, pool, T=1, n_micro=n_micro,
        quantized=quantized, axis=axis, defer_commit=True,
    )
    page = jax.tree.leaves(pool)[0].shape[3]

    @partial(jax.jit, static_argnames=("top_k", "top_p"))
    def read(
        params,
        toks: jax.Array,  # (B,)
        pos: jax.Array,  # (B,)
        tables: jax.Array,  # (B, AP)
        pool: PagePool,
        key: jax.Array,
        temps: jax.Array,  # (B,)
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ):
        logits, writes = inner(
            params, toks[:, None], pos[:, None], tables, pool
        )
        pos2 = pos[:, None]
        page_idx = jnp.take_along_axis(tables, pos2 // page, axis=1)
        return (
            sample_next_token(logits[:, 0], key, temps, top_k, top_p),
            writes,
            page_idx,
            pos2 % page,
        )

    return read


def _make_pp_prefill_inner(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    quantized,
    axis: str,
    defer_commit: bool,
):
    """Shared S-tick pipeline prefill program: one (1, T) span flows through
    the stages (M=1 — a single prompt cannot wavefront; chunked prefill
    interleaves multiple prompts' chunks at the engine level instead).

    Fused: stage ``s`` consumes the previous stage's output on tick ``t==s``;
    off-tick chains recompute over stale x and their garbage pool writes are
    overwritten on the real tick (same pages — last-write-wins). Deferred: the
    pool is never written, so there are no garbage writes to overwrite — only
    the real tick's (``s == t``) K/V is kept."""
    S = int(mesh.shape[axis])
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
        axis_names=frozenset({axis}),
    )
    def inner(params, toks, pos, tables, pool):
        s = jax.lax.axis_index(axis)
        x = params["wte"]["weight"][toks]  # (1, T, D)
        bufs = None
        for t in range(S):
            if defer_commit:
                h, w_t, _, _ = paged_block_chain(
                    params["blocks"], pool, x, pos, tables, config,
                    quantized, defer_commit=True,
                )
                # keep the writes from this stage's real tick only
                bufs = w_t if bufs is None else jax.tree.map(
                    lambda b, w: jnp.where(s == t, w, b), bufs, w_t
                )
            else:
                h, pool = paged_block_chain(
                    params["blocks"], pool, x, pos, tables, config, quantized
                )
            if S > 1:
                h_next = jax.lax.ppermute(h, axis, perm)
                x = jnp.where(s == t + 1, h_next, x)
        y = rmsnorm(h, params["ln_f"]["scale"], config.norm_eps)
        logits = apply_linear(params["lm_head"], y)
        logits = jnp.where(s == S - 1, logits, 0)
        return jax.lax.psum(logits, axis), bufs if defer_commit else pool

    return inner


def make_pp_prefill(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    quantized=False,
    axis: str = "pp",
):
    """Jitted FUSED pipeline prefill. Returns ``prefill(params, toks (1, T),
    pos (1, T), tables (1, AP), pool) -> (logits (1, T, V), pool)`` — same
    contract as `paged_forward`."""
    inner = _make_pp_prefill_inner(
        config, mesh, params, pool, quantized=quantized, axis=axis,
        defer_commit=False,
    )
    return jax.jit(inner, donate_argnums=(4,))


def make_pp_prefill_read(
    config: LLaMAConfig,
    mesh: Mesh,
    params,
    pool: PagePool,
    *,
    quantized=False,
    axis: str = "pp",
):
    """Read half of the two-dispatch pipeline prefill. Returns
    ``prefill(params, toks (1, T), pos (1, T), tables (1, AP), pool) ->
    (logits (1, T, V), writes, page_idx (1, T), offs (1, T))``."""
    inner = _make_pp_prefill_inner(
        config, mesh, params, pool, quantized=quantized, axis=axis,
        defer_commit=True,
    )
    page = jax.tree.leaves(pool)[0].shape[3]

    @jax.jit
    def prefill(params, toks, pos, tables, pool):
        logits, writes = inner(params, toks, pos, tables, pool)
        page_idx = jnp.take_along_axis(tables, pos // page, axis=1)
        return logits, writes, page_idx, pos % page

    return prefill
