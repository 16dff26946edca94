"""Quantization quality gate: train a small LLaMA on structured synthetic data,
then measure Δppl of INT8 weight-only and GPTQ INT4 versus the fp32 model
(BASELINE targets: ≤0.1 ppl INT8, ≤0.5 ppl INT4 at 7B scale; small models are a
harsher relative test).

Run: python tools/quality_gate.py [--steps 300]
Prints one JSON line with the three perplexities and deltas.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.evaluate import perplexity
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.quant.pipeline import gptq_quantize_model, int8_quantize_model
from lit_llama_ja_tpu.train.lr import cosine_with_warmup
from lit_llama_ja_tpu.train.step import init_opt_state, make_adamw, make_train_step


def markov_corpus(vocab: int, n_tokens: int, seed: int, order_seed: int = 7):
    """A sparse 2-gram Markov language: learnable structure, held-out-able."""
    rng = np.random.default_rng(order_seed)
    # each token has 8 plausible successors with dirichlet weights
    succ = rng.integers(0, vocab, size=(vocab, 8))
    probs = rng.dirichlet(np.ones(8) * 0.5, size=vocab)
    gen = np.random.default_rng(seed)
    out = np.empty(n_tokens, np.int32)
    t = gen.integers(0, vocab)
    for i in range(n_tokens):
        out[i] = t
        t = succ[t, gen.choice(8, p=probs[t])]
    return out


def kv_cache_ppl(params, cfg, tokens: np.ndarray, quantize_kv, windows: int = 24):
    """Teacher-forced decode-path perplexity (see
    `infer/evaluate.py::decode_path_perplexity`, which this wraps — also
    reachable via `evaluate/full.py --kv-cache`)."""
    from lit_llama_ja_tpu.infer.evaluate import decode_path_perplexity

    return decode_path_perplexity(
        params, cfg, tokens, quantize_kv=quantize_kv, windows=windows, seed=11
    )


def main(steps: int = 300, gptq_groupsize: int = -1, kv: bool = False, kv_windows: int = 24):
    cfg = LLaMAConfig(block_size=128, vocab_size=512, n_layer=4, n_head=8, n_embd=256)
    params = init_params(jax.random.PRNGKey(0), cfg)

    train_tokens = markov_corpus(cfg.vocab_size, 600_000, seed=1)
    eval_tokens = markov_corpus(cfg.vocab_size, 40_000, seed=2)  # held out

    sched = cosine_with_warmup(3e-3, 30, steps, 3e-4)
    opt = make_adamw(sched, weight_decay=0.01)
    step = jax.jit(make_train_step(cfg, opt), donate_argnums=(0, 1))
    opt_state = init_opt_state(opt, params)

    bs, T = 16, cfg.block_size
    rng = np.random.default_rng(3)
    t0 = time.perf_counter()
    for it in range(steps):
        ix = rng.integers(0, len(train_tokens) - T - 1, size=bs)
        batch = np.stack([train_tokens[i : i + T + 1] for i in ix])[None]
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch))
        if it % 50 == 0:
            print(f"iter {it}: loss {float(loss):.4f}", file=sys.stderr)
    print(f"trained {steps} steps in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    ppl_fp = perplexity(params, cfg, eval_tokens, window=T)

    q8 = int8_quantize_model(params)
    ppl_int8 = perplexity(q8, cfg, eval_tokens, window=T)

    calib = np.stack(
        [train_tokens[i : i + T] for i in rng.integers(0, 10_000, size=32)]
    )
    q4 = gptq_quantize_model(
        params, cfg, jnp.asarray(calib), bits=4,
        groupsize=gptq_groupsize, micro_batch=8, progress=False,
    )
    ppl_int4 = perplexity(q4, cfg, eval_tokens, window=T)

    out = {
        "ppl_fp32": round(ppl_fp, 4),
        "ppl_int8": round(ppl_int8, 4),
        "ppl_gptq_int4": round(ppl_int4, 4),
        "delta_int8": round(ppl_int8 - ppl_fp, 4),
        "delta_int4": round(ppl_int4 - ppl_fp, 4),
    }
    if kv:
        kv_fp = kv_cache_ppl(params, cfg, eval_tokens, False, kv_windows)
        kv_i8 = kv_cache_ppl(params, cfg, eval_tokens, "int8", kv_windows)
        kv_i4 = kv_cache_ppl(params, cfg, eval_tokens, "int4", kv_windows)
        out.update({
            "kv_ppl_fp": round(kv_fp, 4),
            "kv_ppl_int8": round(kv_i8, 4),
            "kv_ppl_int4": round(kv_i4, 4),
            "kv_delta_int8": round(kv_i8 - kv_fp, 4),
            "kv_delta_int4": round(kv_i4 - kv_fp, 4),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
