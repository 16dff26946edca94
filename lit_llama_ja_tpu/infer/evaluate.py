"""Perplexity evaluation (reference `evaluate/full.py`).

Protocol parity: stride the token stream in `block_size` windows, accumulate summed
token NLL, report ``exp(sum_nll / n_tokens)`` (reference `evaluate/full.py:117-128`,
the GPTQ paper's protocol).

TPU-first: one jitted window-NLL function; windows stream through it back-to-back
(the window batch dim can also be vmapped/sharded for multi-chip eval).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models import llama
from lit_llama_ja_tpu.train.loss import token_nll_sum


@partial(jax.jit, static_argnames=("config", "forward_fn"))
def _window_nll(params, window, config: LLaMAConfig, forward_fn=None):
    """(sum NLL, token count) for one ``(1, T)`` window; predicts tokens 1..T-1."""
    fwd = forward_fn if forward_fn is not None else llama.forward
    logits = fwd(params, window[:, :-1], config)
    return token_nll_sum(logits, window[:, 1:])


def perplexity(
    params,
    config: LLaMAConfig,
    tokens: np.ndarray,
    *,
    window: Optional[int] = None,
    forward_fn: Optional[Callable] = None,
    progress: bool = False,
) -> float:
    """Perplexity of a flat token stream under the model."""
    window = window or config.block_size
    n = (len(tokens) - 1) // window
    total_nll, total_toks = 0.0, 0
    for i in range(n):
        chunk = jnp.asarray(
            tokens[i * window : i * window + window + 1], jnp.int32
        )[None]
        nll, cnt = _window_nll(params, chunk, config, forward_fn)
        total_nll += float(nll)
        total_toks += int(cnt)
        if progress and i % 10 == 0:
            print(f"window {i}/{n} running ppl {np.exp(total_nll / max(total_toks,1)):.3f}")
    return float(np.exp(total_nll / max(total_toks, 1)))


def decode_path_perplexity(
    params,
    config: LLaMAConfig,
    tokens: np.ndarray,
    *,
    quantize_kv=False,
    windows: int = 12,
    window: Optional[int] = None,
    seed: int = 11,
) -> float:
    """Teacher-forced perplexity through the CACHED decode path.

    Every logit is produced by `forward_with_cache` reading the (possibly
    quantized) KV cache — the quantity a served user actually experiences.
    The full-sequence protocol (`perplexity`) cannot see KV-cache
    quantization at all: it never builds a cache. ``quantize_kv``:
    False | "int8" | "int4" (head-pair packed). Windows are sampled from the
    token stream with a seeded RNG (teacher-forced decode is ~T sequential
    steps per window — sampling keeps the cost bounded)."""
    import jax

    from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache

    T = window or config.block_size

    @jax.jit
    def window_nll(params, seq):  # seq: (T+1,)
        cache = init_kv_cache(config, 1, T, jnp.float32, quantized=quantize_kv)

        def body(carry, t):
            cache, nll = carry
            logits, cache = forward_with_cache(
                params, seq[t][None, None], t[None], cache, config
            )
            logp = jax.nn.log_softmax(logits[0, 0].astype(jnp.float32))
            return (cache, nll - logp[seq[t + 1]]), None

        (cache, nll), _ = jax.lax.scan(
            body, (cache, jnp.float32(0.0)), jnp.arange(T, dtype=jnp.int32)
        )
        return nll

    if len(tokens) < T + 1:
        raise ValueError(
            f"decode_path_perplexity needs at least window+1={T + 1} tokens, "
            f"got {len(tokens)}; pass a smaller --kv-window or a longer stream"
        )
    rng = np.random.default_rng(seed)
    n = min(windows, max(1, (len(tokens) - 1) // T))
    hi = len(tokens) - T - 1
    ix = rng.integers(0, hi, size=n) if hi > 0 else np.zeros(n, np.int64)
    total = sum(float(window_nll(params, jnp.asarray(tokens[i : i + T + 1]))) for i in ix)
    return float(np.exp(total / (n * T)))


def load_eval_dataset(name: str, tokenizer, split: str = "test") -> np.ndarray:
    """Load and tokenize an eval corpus (reference `evaluate/full.py:23-43`):
    wikitext-2 / ptb / c4 via HF datasets (requires network), or — the
    local-file option — a path to a text file (absolute, relative, or ending
    in ``.txt``), read directly so the full eval pipeline runs offline."""
    import os

    if name.endswith(".txt") or os.path.exists(name):
        with open(name, encoding="utf-8") as f:
            text = f.read()
        return tokenizer.encode(text, bos=True, eos=False)

    from datasets import load_dataset

    if name == "wikitext":
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        text = "\n\n".join(ds["text"])
    elif name == "ptb":
        ds = load_dataset("ptb_text_only", "penn_treebank", split="validation")
        text = " ".join(ds["sentence"])
    elif name == "c4":
        ds = load_dataset(
            "allenai/c4",
            data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
            split="validation",
        )
        text = " ".join(ds[:1100]["text"])
    else:
        raise ValueError(f"unknown dataset {name}")
    return tokenizer.encode(text, bos=True, eos=False)
