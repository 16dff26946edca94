"""Speculative decoding measured END-TO-END with real trained models.

Rounds 1-3 reported speculative ROUND COSTS with synthetic/self drafts and
PREDICTED speedups from an assumed acceptance; this tool measures the whole
thing on checkpoints trained by `tools/quality_pipeline.py` (same tokenizer,
same corpus): realized chain acceptance, tokens/round, and end-to-end tok/s
of speculative vs plain decode, single-stream AND batched serving (chain and
tree), on the real chip.

Run (after quality_pipeline has built the models):

    python tools/bench_spec_e2e.py \
        --target out/quality/49M/iter-003000-ckpt \
        --draft out/quality/19M/iter-001500-ckpt \
        [--tokens 256] [--serve-steps 40]

Prompts come from the held-out val split — real text both models were NOT
trained on, so acceptance reflects genuine draft/target agreement, not
memorization. Plain/speculative runs are interleaved (drift robustness);
greedy speculative output is asserted bitwise-equal to plain greedy.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="out/quality/49M/iter-003000-ckpt")
    ap.add_argument("--draft", default="out/quality/19M/iter-001500-ckpt")
    ap.add_argument("--tokenizer", default="out/quality/tokenizer.json")
    ap.add_argument("--val", default="out/quality/corpus/val.txt")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--prompts", type=int, default=3)
    ap.add_argument("--ks", default="2,3,4")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--serve-steps", type=int, default=40)
    ap.add_argument("--serve-slots", type=int, default=8)
    ap.add_argument("--skip-serve", action="store_true")
    ap.add_argument("--skip-single", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.infer.generate import generate
    from lit_llama_ja_tpu.infer.speculative import speculative_generate
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer

    tparams, tcfg = load_model_any(Path(args.target))
    dparams, dcfg = load_model_any(Path(args.draft))
    tok = HFTokenizer(Path(args.tokenizer))
    text = Path(args.val).read_text()

    # deterministic held-out prompts, spaced through the val split
    all_ids = tok.encode(text[: 80_000], bos=False, eos=False)
    prompts = [
        np.asarray(
            np.concatenate([[tok.bos_id], all_ids[o : o + args.prompt_len - 1]]),
            np.int32,
        )
        for o in range(0, args.prompts * 4096, 4096)[: args.prompts]
    ]

    if not args.skip_single:
        print(f"== single-stream: target {args.target} + draft {args.draft}, "
              f"{args.tokens} greedy tokens ==")
        for prompt in prompts[:1]:  # warm both programs
            generate(tparams, tcfg, jnp.asarray(prompt), args.tokens, temperature=0.0)
            speculative_generate(
                tparams, tcfg, dparams, dcfg, prompt, args.tokens,
                K=int(args.ks.split(",")[0]), temperature=0.0,
            )
        for K in [int(k) for k in args.ks.split(",")]:
            plain_t, spec_t, accs, tprs, matches = [], [], [], [], []
            for rep in range(args.reps):
                for prompt in prompts:
                    t0 = time.perf_counter()
                    want = np.asarray(
                        generate(tparams, tcfg, jnp.asarray(prompt), args.tokens,
                                 temperature=0.0)
                    )
                    plain_t.append(time.perf_counter() - t0)
                    st = {}
                    t0 = time.perf_counter()
                    got = speculative_generate(
                        tparams, tcfg, dparams, dcfg, prompt, args.tokens,
                        K=K, temperature=0.0, stats_out=st,
                    )
                    spec_t.append(time.perf_counter() - t0)
                    # On-chip, the T=1 decode program and the K+1-span verify
                    # program round f32 differently, so a near-tie argmax can
                    # flip — greedy equality is bitwise only under identical
                    # programs (the CPU suite asserts that); here we report
                    # the match prefix as a sanity signal.
                    n = min(len(got), len(want))
                    div = int(np.argmax(got[:n] != want[:n])) if (
                        got[:n] != want[:n]
                    ).any() else n
                    matches.append(div / n)
                    accs.append(st["acceptance"])
                    tprs.append(st["tokens"] / max(st["rounds"], 1))
            pl = np.median(plain_t)
            sp = np.median(spec_t)
            print(
                f"K={K}: plain {args.tokens/pl:7.1f} tok/s | spec "
                f"{args.tokens/sp:7.1f} tok/s | speedup {pl/sp:5.2f}x | "
                f"acceptance {np.mean(accs):.3f} | tokens/round {np.mean(tprs):.2f}"
                f" | greedy match prefix {np.mean(matches)*100:.0f}%"
            )

    if args.skip_serve:
        return

    print(f"\n== batched serving: {args.serve_slots} slots, real prompts, "
          f"{args.serve_steps} steady-state steps ==")
    from lit_llama_ja_tpu.infer.paged import PagedEngine
    from lit_llama_ja_tpu.infer.spec_serving import SpeculativePagedEngine
    from lit_llama_ja_tpu.infer.tree_spec import TreeSpeculativePagedEngine

    seq = 512
    B = args.serve_slots
    n_pages = B * (-(-seq // 16)) + 9
    common = dict(
        max_batch=B, n_pages=n_pages, page_size=16,
        max_pages_per_slot=-(-seq // 16), quantize_kv="int4", seed=0,
    )

    def drive(label, make):
        engine = make()
        rng = np.random.default_rng(0)
        for i in range(B):
            p = prompts[i % len(prompts)]
            engine.add_request(p, max_new_tokens=seq - len(p) - 8)
        for _ in range(4):
            engine.step()
        tokens = 0
        t0 = time.perf_counter()
        for _ in range(args.serve_steps):
            tokens += len(engine.step())
        t = time.perf_counter() - t0
        s = engine.stats() if hasattr(engine, "stats") else {}
        extra = ""
        if "acceptance_ema" in s:
            extra = (f" | acceptance_ema {s['acceptance_ema']:.3f}"
                     f" | tokens/round {s['tokens_per_round']:.2f}")
        print(f"{label:22s}: {t/args.serve_steps*1e3:7.1f} ms/step | "
              f"{tokens/t:7.1f} tok/s aggregate{extra}")
        return tokens / t

    base = drive("plain", lambda: PagedEngine(tparams, tcfg, **common))
    for k in (3, 4):
        r = drive(
            f"spec chain K={k}",
            lambda k=k: SpeculativePagedEngine(
                tparams, tcfg, draft_params=dparams, draft_config=dcfg,
                draft_k=k, **common,
            ),
        )
        print(f"{'':22s}  -> {r/base:.2f}x vs plain")
    r = drive(
        "spec chain adaptive",
        lambda: SpeculativePagedEngine(
            tparams, tcfg, draft_params=dparams, draft_config=dcfg,
            draft_k=4, adaptive_k=True, **common,
        ),
    )
    print(f"{'':22s}  -> {r/base:.2f}x vs plain")
    for tree in ((2, 2), (2, 2, 2)):
        r = drive(
            f"spec tree {tree}",
            lambda tree=tree: TreeSpeculativePagedEngine(
                tparams, tcfg, draft_params=dparams, draft_config=dcfg,
                tree=tree, **common,
            ),
        )
        print(f"{'':22s}  -> {r/base:.2f}x vs plain")


if __name__ == "__main__":
    main()
