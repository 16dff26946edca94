"""Batched speculative decoding inside the paged serving engine.

Combines the two throughput levers: continuous batching amortizes the weight
stream across slots, speculation amortizes it across tokens. Each engine step
runs ONE draft+verify round for all active slots — the draft model proposes K
tokens per slot (batched, its own paged KV pool), the target verifies all
``K+1`` positions per slot in ONE batched forward, and the per-slot rejection
chain emits ``accepted+1 ∈ [1, K+1]`` tokens with the output distribution
exactly the target's (greedy output is bitwise the target-only engine's —
tested).

Infrastructure reuse: the draft pool is a second `init_page_pool` indexed by
the SAME page tables (positions are identical per slot, only L/nh/hd differ),
so the allocator, prefix sharing, preemption/resume, and chunked prefill all
work unchanged — the draft cache is simply prefilled alongside the target's.

Cache bookkeeping per round mirrors `infer/speculative` (write-then-mask for
rejected suffixes; the draft consumes a (prev, cur) pair to fill the
one-position hole an all-accepted round leaves), vectorized over slots.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import (
    PagedEngine,
    PagePool,
    commit_writes_jit,
    init_page_pool,
    paged_forward,
    paged_forward_read,
)


def _dist_batch(logits, temps, top_k, top_p):
    """Per-slot sampling distributions (B, V): temperature array (0 = greedy
    point mass), engine-wide static top-k/top-p. Mirrors
    `ops/sampling.sample_token` filter order."""
    logits = logits.astype(jnp.float32)
    safe_t = jnp.where(temps > 0, temps, 1.0)[:, None]
    scaled = logits / safe_t
    if top_k is not None:
        kth = jax.lax.top_k(scaled, min(top_k, scaled.shape[-1]))[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p is not None and top_p < 1.0:
        from lit_llama_ja_tpu.ops.sampling import top_p_filter

        scaled = top_p_filter(scaled, top_p)
    sampled = jax.nn.softmax(scaled, axis=-1)
    greedy = jax.nn.one_hot(
        jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
    )
    return jnp.where((temps > 0)[:, None], sampled, greedy)


def _draft_propose(
    dparams,
    prev: jax.Array,  # (B,) token at pos-1 (cached in the draft pool)
    cur: jax.Array,  # (B,) token at pos (not yet in any cache)
    pos: jax.Array,  # (B,)
    tables: jax.Array,  # (B, AP)
    dpool: PagePool,
    dcfg: LLaMAConfig,
    K: int,
    temps: jax.Array,
    top_k: Optional[int],
    top_p: Optional[float],
    kd: jax.Array,
) -> Tuple[jax.Array, jax.Array, PagePool]:
    """Draft K tokens per slot: a (prev, cur) pair forward (fills the
    one-position cache hole an all-accepted round leaves), then K-1 batched
    single steps. Returns (draft_toks (B, K), p_d (B, K, V), dpool). Shared by
    the single-mesh round and the pipeline-parallel round (`parallel/pp_spec`),
    where the small draft runs replicated on every stage."""
    pair = jnp.stack([prev, cur], axis=1)  # (B, 2)
    # clamp: idle slots sit at pos=0 and would otherwise query position -1 —
    # an all-masked row whose NaN output poisons the shared trash page (active
    # slots were NaN-poisoned through it before _masked_softmax hardened the
    # attention; keep the positions in-range regardless)
    pair_pos = jnp.stack([jnp.maximum(pos - 1, 0), pos], axis=1)
    logits, dpool = paged_forward(
        dparams, pair, pair_pos, tables, dpool, dcfg, False
    )
    d_keys = jax.random.split(kd, K)
    p0 = _dist_batch(logits[:, -1], temps, top_k, top_p)  # (B, V)
    tok0 = jax.random.categorical(d_keys[0], jnp.log(p0 + 1e-30), axis=-1).astype(
        jnp.int32
    )

    def dstep(carry, k_i):
        dpool, tok, p = carry
        logits, dpool = paged_forward(
            dparams, tok[:, None], p[:, None], tables, dpool, dcfg, False
        )
        probs = _dist_batch(logits[:, -1], temps, top_k, top_p)
        nxt = jax.random.categorical(k_i, jnp.log(probs + 1e-30), axis=-1).astype(
            jnp.int32
        )
        return (dpool, nxt, p + 1), (tok, probs)

    (dpool, last_draft, _), (consumed, probs_out) = jax.lax.scan(
        dstep, (dpool, tok0, pos + 1), d_keys[1:]
    )
    # consumed: (K-1, B) = drafts[0..K-2]; probs_out: (K-1, B, V) = p_d[1..K-1]
    draft_toks = jnp.concatenate(
        [jnp.moveaxis(consumed, 0, 1), last_draft[:, None]], axis=1
    )  # (B, K)
    p_d = jnp.concatenate(
        [p0[:, None], jnp.moveaxis(probs_out, 0, 1)], axis=1
    )  # (B, K, V)
    return draft_toks, p_d, dpool


def _accept_chain(
    tlogits: jax.Array,  # (B, K+1, V) target logits over [cur, drafts]
    draft_toks: jax.Array,  # (B, K)
    p_d: jax.Array,  # (B, K, V)
    temps: jax.Array,
    top_k: Optional[int],
    top_p: Optional[float],
    kacc: jax.Array,
    kfin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per-slot rejection chain over the verified logits; returns
    (tokens (B, K+1), n_out (B,)). Exact target distribution (greedy bitwise).
    Shared by the single-mesh and pipeline-parallel rounds."""
    B, K1, BV = tlogits.shape
    K = K1 - 1
    p_t = _dist_batch(
        tlogits.reshape(B * (K + 1), BV),
        jnp.repeat(temps, K + 1),
        top_k,
        top_p,
    ).reshape(B, K + 1, BV)

    # --- per-slot rejection chain -------------------------------------------
    u = jax.random.uniform(kacc, (B, K))
    pt_x = jnp.take_along_axis(p_t[:, :K], draft_toks[..., None], axis=2)[..., 0]
    pd_x = jnp.take_along_axis(p_d, draft_toks[..., None], axis=2)[..., 0]
    accept = u < jnp.minimum(1.0, pt_x / jnp.maximum(pd_x, 1e-30))
    keep = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    n_acc = keep.sum(axis=1)  # (B,)

    barange = jnp.arange(B)
    p_t_at = p_t[barange, n_acc]  # (B, V)
    p_d_at = jnp.where(
        (n_acc == K)[:, None],
        jnp.zeros_like(p_t_at),
        p_d[barange, jnp.minimum(n_acc, K - 1)],
    )
    resid = jnp.maximum(p_t_at - p_d_at, 0.0)
    rs = resid.sum(axis=1, keepdims=True)
    final_dist = jnp.where(rs > 1e-30, resid / jnp.maximum(rs, 1e-30), p_t_at)
    final = jax.random.categorical(
        kfin, jnp.log(final_dist + 1e-30), axis=-1
    ).astype(jnp.int32)

    tokens = jnp.concatenate(
        [draft_toks, jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    tokens = tokens.at[barange, n_acc].set(final)
    return tokens, n_acc + 1


@partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "K", "quantized", "top_k", "top_p"),
    donate_argnums=(7,),
)
def _batched_spec_round(
    tparams,
    dparams,
    prev: jax.Array,  # (B,) token at pos-1 (cached in both pools)
    cur: jax.Array,  # (B,) token at pos (not yet in any cache)
    pos: jax.Array,  # (B,)
    tables: jax.Array,  # (B, AP)
    tpool: PagePool,
    dpool: PagePool,
    key: jax.Array,
    temps: jax.Array,  # (B,)
    tcfg: LLaMAConfig,
    dcfg: LLaMAConfig,
    K: int,
    quantized: bool,
    top_k: Optional[int],
    top_p: Optional[float],
):
    """One batched draft+verify round; returns (tokens (B, K+1), n_out (B,),
    target writes + indices for `commit_writes_jit`, draft pool).

    The TARGET pool stays read-only here — its span writes commit in a
    separate write-only dispatch (a fused read+write program pays full pool
    copies, see `infer/paged.commit_writes_jit`). The DRAFT pool still
    updates in-program (its K-step scan needs each token's K/V on the next
    step, and the pool is small)."""
    kd, kacc, kfin = jax.random.split(key, 3)
    draft_toks, p_d, dpool = _draft_propose(
        dparams, prev, cur, pos, tables, dpool, dcfg, K, temps, top_k, top_p, kd
    )
    # --- target: verify all K+1 positions per slot in one forward -----------
    tin = jnp.concatenate([cur[:, None], draft_toks], axis=1)  # (B, K+1)
    tpos = pos[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None]
    tlogits, twrites, t_pi, t_of = paged_forward_read(
        tparams, tin, tpos, tables, tpool, tcfg, quantized
    )
    tokens, n_out = _accept_chain(
        tlogits, draft_toks, p_d, temps, top_k, top_p, kacc, kfin
    )
    return tokens, n_out, (twrites, t_pi, t_of), dpool


class SpeculativePagedEngine(PagedEngine):
    """Paged continuous-batching engine whose decode step is a batched
    speculative round: up to ``draft_k + 1`` tokens per slot per step."""

    def __init__(
        self,
        params,
        config: LLaMAConfig,
        *,
        draft_params,
        draft_config: LLaMAConfig,
        draft_k: int = 4,
        adaptive_k: bool = False,
        k_min: int = 1,
        k_ema_decay: float = 0.9,
        k_step_cost: Optional[float] = None,
        **kwargs,
    ):
        """``adaptive_k``: pick K each step from a small ladder in
        ``[k_min, draft_k]`` to maximize predicted tokens/sec under the
        measured acceptance rate. The predictor is E[tokens]/cost with
        E[tokens] = sum_{i<=K} a^i (chain acceptance at EMA rate ``a``) and
        cost(K) = 1 + k_step_cost*K. ``k_step_cost=None`` derives the
        constant from the target pool's KV mode (PERF.md round-3
        calibration): int4-KV makes the plain step faster, so a K=4 round
        costs 1.26x one step => ~0.065/draft-token; int8/bf16 pools measure
        1.11-1.13x => ~0.03. Pass a float to override. Each distinct K
        compiles the round program once; the ladder is small so compiles are
        bounded."""
        super().__init__(params, config, **kwargs)
        if k_step_cost is None:
            k_step_cost = 0.065 if kwargs.get("quantize_kv") == "int4" else 0.03
        # pp composition (`parallel/pp_spec.py`): the target verify runs the
        # GPipe wavefront with T=K+1; the small draft runs replicated on every
        # stage; rejection math is the shared single-mesh code. Round programs
        # are built lazily per K (adaptive_k's ladder is small).
        self._pp_mesh = kwargs.get("pp_mesh")
        self._pp_micro = kwargs.get("pp_microbatches", 1)
        self._pp_rounds: Dict[int, object] = {}
        self.dparams = draft_params
        self.dcfg = draft_config
        self.K = draft_k
        self.K_max = draft_k
        self.adaptive_k = adaptive_k
        self.k_min = max(1, min(k_min, draft_k))
        self.k_ema_decay = k_ema_decay
        self.k_step_cost = k_step_cost
        self._k_ladder = sorted(
            {self.k_min, self.K_max}
            | {k for k in (1, 2, 4, 8, 16) if self.k_min <= k <= self.K_max}
        )
        # draft pool shares the page TABLES (same positions); bf16 values —
        # the draft is small, quantizing its cache buys nothing
        self.dpool = init_page_pool(
            draft_config, self.n_pages, self.page, jnp.bfloat16, quantized=False
        )
        if self._pp_mesh is not None:
            # the round program spans the pp mesh's device set: the draft side
            # must live there too, fully replicated (it computes identically
            # on every stage, no communication)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self._pp_mesh, PartitionSpec())
            self.dparams = jax.device_put(self.dparams, rep)
            self.dpool = jax.device_put(self.dpool, rep)
        self.prev = np.zeros(self.B, np.int32)
        # acceptance telemetry (see stats())
        self._spec_rounds = 0
        self._drafted = 0
        self._accepted = 0
        self._accept_ema: Optional[float] = None
        self.slot_drafted = np.zeros(self.B, np.int64)
        self.slot_accepted = np.zeros(self.B, np.int64)

    # -- hooks into the base engine's prefill/admission ---------------------
    def _prefill_span(self, toks, start_pos, table_pages, want_logits=True):
        """Prefill BOTH pools over the same span (the draft model sees the
        same tokens at the same positions through the same tables)."""
        if len(toks) == 0:
            raise ValueError(
                "speculative engine requires a non-empty prefill span "
                "(give requests at least one prompt token past the prefix)"
            )
        logits = super()._prefill_span(toks, start_pos, table_pages, want_logits)
        # draft-side prefill (reuse the parent's bucketing/table logic by
        # calling paged_forward directly with the same shapes)
        from lit_llama_ja_tpu.infer.generate import bucket_length

        T = len(toks)
        P = bucket_length(T)
        ap = bucket_length((start_pos + P + self.page - 1) // self.page, minimum=1)
        table = np.zeros(ap, np.int32)
        usable = min(len(table_pages), ap)
        table[:usable] = table_pages[:usable]
        padded = np.zeros(P, np.int32)
        padded[:T] = toks
        posv = start_pos + np.arange(P, dtype=np.int32)
        _, self.dpool = paged_forward(
            self.dparams,
            jnp.asarray(padded[None]),
            jnp.asarray(posv[None]),
            jnp.asarray(table[None]),
            self.dpool,
            self.dcfg,
            False,
        )
        return logits

    def _activate(self, slot, req, logits, resuming, total_len):
        # token at total_len - 1 is the last prefilled one = `prev` for round 1
        if resuming and len(req.tokens) >= 2:
            self.prev[slot] = req.tokens[-2]
        elif len(req.prompt):
            self.prev[slot] = req.prompt[-1]
        else:
            # prompt fully covered by a shared prefix: use the prefix tail
            _, sprefix_tail = self._prefixes[req.prefix_id]
            self.prev[slot] = sprefix_tail[-1]
        self.slot_drafted[slot] = 0
        self.slot_accepted[slot] = 0
        super()._activate(slot, req, logits, resuming, total_len)

    def _ensure_capacity(self) -> bool:
        """Reserve pages for the whole speculative horizon (pos..pos+K)."""
        for slot, req in enumerate(self.slot_req):
            if req is None or slot in self.prefilling:
                continue
            needed = (int(self.pos[slot]) + self.K) // self.page
            while needed >= self.n_owned[slot]:
                got = self._alloc(1)
                if got is None:
                    return False
                self.tables[slot, self.n_owned[slot]] = got[0]
                self.n_owned[slot] += 1
        return True

    # -- stepping ------------------------------------------------------------
    def step(self) -> List[Tuple[int, int, bool]]:
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
        from lit_llama_ja_tpu.infer.generate import bucket_length

        max_pages = max(
            (int(self.pos[r.slot]) + self.K) // self.page + 1 for r in active
        )
        ap = min(bucket_length(max_pages, minimum=1), self.maxP)
        self.key, sub = jax.random.split(self.key)
        if self._pp_mesh is not None:
            # two-dispatch when the engine has a pp commit program (pp_split,
            # the default): the round leaves the target pool read-only and the
            # span K/V commits in place afterwards
            defer = self._pp_commit is not None
            rnd = self._pp_rounds.get(self.K)
            if rnd is None:
                from lit_llama_ja_tpu.parallel.pp_spec import make_pp_spec_round

                rnd = make_pp_spec_round(
                    self.config, self.dcfg, self._pp_mesh, self.params,
                    self.pool, K=self.K, n_micro=self._pp_micro,
                    quantized=self.quantized, defer_commit=defer,
                )
                self._pp_rounds[self.K] = rnd
            tokens, n_out, third, self.dpool = rnd(
                self.params,
                self.dparams,
                jnp.asarray(self.prev),
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
            if defer:
                self.pool = self._pp_commit(self.pool, *third)
            else:
                self.pool = third
        else:
            tokens, n_out, tcommit, self.dpool = _batched_spec_round(
                self.params,
                self.dparams,
                jnp.asarray(self.prev),
                jnp.asarray(self.cur),
                jnp.asarray(self.pos),
                jnp.asarray(self.tables[:, :ap]),
                self.pool,
                self.dpool,
                sub,
                jnp.asarray(self.temps),
                self.config,
                self.dcfg,
                self.K,
                self.quantized,
                self.top_k,
                self.top_p,
            )
            self.pool = commit_writes_jit(self.pool, *tcommit)
        tokens = np.asarray(tokens)  # (B, K+1)
        n_out = np.asarray(n_out)
        # acceptance telemetry: n_out-1 of K drafts survived the rejection
        # chain (raw, before the budget/eos emission clamp — this measures
        # draft quality, not request-length truncation)
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
        if self.adaptive_k and self._accept_ema is not None:
            self.K = self._pick_k(self._accept_ema)
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
            self.prev[slot] = (
                toks[-2] if n >= 2 else int(self.cur[slot])
            )
            self.cur[slot] = toks[-1]
            self._maybe_finish(req)
            if req.done:
                self._completed += 1
            for t in toks:
                emitted.append((req.req_id, t, req.done))
        self._steps += 1
        self._tokens_out += len(emitted)
        return emitted

    # -- adaptive K ----------------------------------------------------------
    def _predicted_rate(self, alpha: float, k: int) -> float:
        """Predicted tokens per unit decode-step cost at chain-acceptance
        ``alpha``: E[tokens] = sum_{i=0..k} alpha^i, cost = 1 + k_step_cost*k."""
        e_tokens = sum(alpha**i for i in range(k + 1))
        return e_tokens / (1.0 + self.k_step_cost * k)

    def _pick_k(self, alpha: float) -> int:
        best = max(self._k_ladder, key=lambda k: self._predicted_rate(alpha, k))
        if best == self.K:
            return self.K
        # hysteresis: switching K recompiles the round program — only move
        # when the predicted gain is real (>3%)
        if self._predicted_rate(alpha, best) > 1.03 * self._predicted_rate(
            alpha, self.K
        ):
            return best
        return self.K

    def stats(self) -> Dict[str, float]:
        s = super().stats()
        s["spec_rounds"] = self._spec_rounds
        s["tokens_drafted"] = self._drafted
        s["tokens_accepted"] = self._accepted
        s["acceptance_rate"] = self._accepted / max(self._drafted, 1)
        s["acceptance_ema"] = (
            self._accept_ema if self._accept_ema is not None else -1.0
        )
        s["draft_k"] = self.K
        s["tokens_per_round"] = self._tokens_out / max(self._spec_rounds, 1)
        s["per_slot_acceptance"] = [
            (self.slot_accepted[b] / self.slot_drafted[b])
            if self.slot_drafted[b]
            else None
            for b in range(self.B)
        ]
        return s
