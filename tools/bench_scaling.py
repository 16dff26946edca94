"""Scaling-efficiency harness: 1 chip → N chips for the sharded train step and
(paged) batched decode — the instrument for BASELINE's ≥85% scaling target.

Weak scaling: per-device work is held constant (per-device micro-batch for
training, decode slots for serving) while the mesh grows, so ideal scaling is
flat step time and efficiency(n) = t(1) / t(n).

Runs today on the virtual CPU mesh (harness correctness):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py --platform cpu --model tiny

and unmodified on a real slice later (drop --platform, pick --model 7B, add
--weights for a real checkpoint). Emits one JSON line per mesh point plus a
summary table.

Methodology notes (PERF.md): timing is host-synced via a data-dependent
transfer (`utils/profiling.sync`); per-dispatch overhead ~1.1 ms on the
tunnel, so step counts default high enough to amortize.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("train", "decode", "serve", "both", "all"), default="both"
    )
    ap.add_argument(
        "--serve-layout", default="tp,pp_tp",
        help="comma list of mesh layouts for --mode serve at n>1: "
        "tp (GSPMD tensor parallel), pp (pipeline), pp_tp (pp=2 x tp=n/2)",
    )
    ap.add_argument("--serve-kv", default="int4", help="serving KV mode (none|int8|int4)")
    ap.add_argument("--json-out", default=None, help="write the results dict to this file")
    ap.add_argument("--model", default="tiny", help="'tiny' | config name (19M, 7B, ...)")
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    ap.add_argument("--max-devices", type=int, default=0, help="0 = all")
    ap.add_argument("--micro-batch", type=int, default=2, help="per-device train micro batch")
    ap.add_argument("--slots", type=int, default=2, help="per-device decode slots")
    ap.add_argument("--seq", type=int, default=0, help="decode cache length (0 = block_size)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tp", type=int, default=1, help="tp ways inside each mesh point")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.models import llama
    from lit_llama_ja_tpu.parallel.mesh import make_mesh
    from lit_llama_ja_tpu.parallel.specs import shard_params
    from lit_llama_ja_tpu.train.step import (
        init_opt_state,
        jit_train_step,
        make_adamw,
        make_train_step,
    )
    from lit_llama_ja_tpu.utils.profiling import sync

    if args.model == "tiny":
        config = LLaMAConfig(
            block_size=64, vocab_size=256, n_layer=2, n_head=4, n_embd=64
        )
    else:
        config = LLaMAConfig.from_name(args.model)

    n_avail = len(jax.devices())
    n_max = min(args.max_devices or n_avail, n_avail)
    points = []
    n = 1
    while n <= n_max:
        if n % args.tp == 0 or n == 1:
            points.append(n)
        n *= 2

    def timeit(fn, *a):
        out = fn(*a)
        sync(out[-1] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*a)
        sync(out[-1] if isinstance(out, tuple) else out)
        return (time.perf_counter() - t0) / args.steps

    results = {}
    if args.mode in ("train", "both", "all"):
        base = None
        for n in points:
            tp = args.tp if n % args.tp == 0 and n >= args.tp else 1
            mesh = make_mesh(dp=1, fsdp=n // tp, tp=tp, devices=jax.devices()[:n])
            params = shard_params(llama.init_params(jax.random.PRNGKey(0), config), mesh)
            opt = make_adamw(1e-3, weight_decay=0.0)
            step = jit_train_step(make_train_step(config, opt), mesh=mesh, params=params)
            opt_state = init_opt_state(opt, params)
            batch = jnp.asarray(
                np.random.default_rng(0).integers(
                    0, config.vocab_size,
                    (1, args.micro_batch * n, config.block_size + 1),
                ),
                jnp.int32,
            )
            state = [params, opt_state]

            def run_step(batch):
                state[0], state[1], loss = step(state[0], state[1], batch)
                return loss

            t = timeit(run_step, batch)
            toks = args.micro_batch * n * config.block_size / t
            eff = 1.0 if base is None else (base / t)
            if base is None:
                base = t
            results[f"train_n{n}"] = dict(
                n=n, ms_per_step=round(t * 1e3, 2),
                tokens_per_sec=round(toks), efficiency=round(eff, 4),
            )
            print(json.dumps({"bench": "scaling-train", **results[f"train_n{n}"]}), flush=True)

    if args.mode in ("decode", "both", "all"):
        from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache

        seq = args.seq or config.block_size
        base = None
        for n in points:
            tp = args.tp if n % args.tp == 0 and n >= args.tp else 1
            mesh = make_mesh(dp=n // tp, fsdp=1, tp=tp, devices=jax.devices()[:n])
            params = shard_params(llama.init_params(jax.random.PRNGKey(0), config), mesh)
            B = args.slots * n

            def mk_step():
                def step(params, cache, tok, pos):
                    logits, cache = forward_with_cache(params, tok, pos, cache, config)
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                    return cache, nxt

                return jax.jit(step, donate_argnums=(1,))

            step = mk_step()
            cache = init_kv_cache(config, B, seq)
            from jax.sharding import NamedSharding, PartitionSpec as P

            cache = jax.device_put(
                cache, NamedSharding(mesh, P(None, "dp", "tp", None, None))
            )
            tok = jnp.zeros((B, 1), jnp.int32)
            state = [cache, tok]
            pos_holder = [16]

            def run_decode(_):
                pos = jnp.array([pos_holder[0]], jnp.int32)
                pos_holder[0] += 1
                state[0], state[1] = step(params, state[0], state[1], pos)
                return state[1]

            t = timeit(run_decode, None)
            eff = 1.0 if base is None else (base / t)
            if base is None:
                base = t
            results[f"decode_n{n}"] = dict(
                n=n, ms_per_step=round(t * 1e3, 2),
                aggregate_tokens_per_sec=round(B / t, 1), efficiency=round(eff, 4),
            )
            print(json.dumps({"bench": "scaling-decode", **results[f"decode_n{n}"]}), flush=True)

    if args.mode in ("serve", "all"):
        # The engine that actually serves (VERDICT r3 item 5): PagedEngine in
        # steady-state continuous-batching decode, slots-per-device constant.
        from lit_llama_ja_tpu.infer.paged import PagedEngine
        from lit_llama_ja_tpu.models.llama import normalize_kv_mode

        kv = normalize_kv_mode(args.serve_kv)
        layouts = [l.strip() for l in args.serve_layout.split(",")]
        seq = args.seq or config.block_size
        prompt_len = min(32, max(8, seq // 8))
        base = None
        for n in points:
            for layout in (["single"] if n == 1 else layouts):
                if layout == "pp_tp" and n < 4:
                    continue  # pp=2 x tp=n/2 needs n>=4 to differ from pp
                B = args.slots * n
                n_pages = B * (-(-seq // 16)) + 9  # page_size 16, +trash/slack
                common = dict(
                    max_batch=B, n_pages=n_pages, page_size=16,
                    max_pages_per_slot=-(-seq // 16), quantize_kv=kv,
                    seed=0,
                )
                eparams = llama.init_params(jax.random.PRNGKey(0), config)
                if layout in ("pp", "pp_tp"):
                    pp = n if layout == "pp" else 2
                    tp = 1 if layout == "pp" else n // 2
                    mesh = make_mesh(
                        dp=1, fsdp=1, tp=tp, pp=pp, devices=jax.devices()[:n]
                    )
                    engine = PagedEngine(
                        eparams, config, pp_mesh=mesh,
                        pp_microbatches=max(pp, 2), **common,
                    )
                elif layout == "tp":
                    mesh = make_mesh(dp=1, fsdp=1, tp=n, devices=jax.devices()[:n])
                    engine = PagedEngine(
                        shard_params(eparams, mesh), config, **common
                    )
                else:
                    engine = PagedEngine(eparams, config, **common)
                rng = np.random.default_rng(0)
                gen_budget = seq - prompt_len - 1
                assert args.steps + 4 < gen_budget, (
                    f"--steps {args.steps} exceeds the per-slot token budget "
                    f"{gen_budget} at --seq {seq}; raise --seq"
                )
                for _ in range(B):
                    engine.add_request(
                        rng.integers(1, config.vocab_size, prompt_len),
                        max_new_tokens=gen_budget,
                    )
                # drain prefills + warm the decode program
                for _ in range(4):
                    engine.step()
                assert len(engine._decoding()) == B, "slots failed to activate"
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    engine.step()
                t = (time.perf_counter() - t0) / args.steps
                eff = 1.0 if base is None else base / t
                if base is None:
                    base = t
                key = f"serve_{layout}_n{n}"
                results[key] = dict(
                    n=n, layout=layout, slots=B, kv=args.serve_kv,
                    ms_per_step=round(t * 1e3, 2),
                    aggregate_tokens_per_sec=round(B / t, 1),
                    efficiency=round(eff, 4),
                )
                print(json.dumps({"bench": "scaling-serve", **results[key]}), flush=True)

    print("\nmesh efficiency vs 1 device (weak scaling, ideal = 1.0):")
    for k, v in results.items():
        print(f"  {k:12s} n={v['n']:2d}  {v['ms_per_step']:8.2f} ms/step  eff={v['efficiency']:.3f}")
    if args.json_out:
        import sys

        with open(args.json_out, "w") as f:
            json.dump(
                {"argv": sys.argv[1:], "model": args.model, "results": results},
                f, indent=1,
            )
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
