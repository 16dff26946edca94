"""Perplexity evaluation CLIs (reference `evaluate/{full,lora,adapter,adapter_v2}.py`)."""
from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _tokenizer(tokenizer_path: str):
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer, Tokenizer

    p = Path(tokenizer_path)
    return Tokenizer(p) if p.suffix == ".model" else HFTokenizer(p)


def _evaluate(params, config, datasets, tokenizer, forward_fn=None,
              kv_cache=None, kv_windows=12):
    from lit_llama_ja_tpu.infer.evaluate import (
        decode_path_perplexity,
        load_eval_dataset,
        perplexity,
    )

    for name in datasets.split(","):
        name = name.strip()
        t0 = time.perf_counter()
        tokens = load_eval_dataset(name, tokenizer)
        if kv_cache is not None:
            from lit_llama_ja_tpu.models.llama import normalize_kv_mode

            mode = normalize_kv_mode(kv_cache)
            ppl = decode_path_perplexity(
                params, config, np.asarray(tokens),
                quantize_kv=mode, windows=kv_windows,
            )
            print(
                f"{name}: decode-path perplexity (kv={kv_cache}) {ppl:.4f} "
                f"({time.perf_counter() - t0:.1f}s, {kv_windows} windows)"
            )
        else:
            ppl = perplexity(params, config, tokens, forward_fn=forward_fn)
            print(f"{name}: perplexity {ppl:.4f} ({time.perf_counter() - t0:.1f}s)")


def main(
    datasets: str = "wikitext,ptb,c4",
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    quantize: Optional[str] = None,
    kv_cache: Optional[str] = None,
    kv_windows: int = 12,
) -> None:
    """Evaluate perplexity on wikitext/ptb/c4 (reference `evaluate/full.py:46-135`).

    ``--kv-cache none|int8|int4`` switches to the DECODE-PATH protocol:
    teacher-forced through `forward_with_cache` so every logit reads the
    (possibly quantized) KV cache — measures what a served user experiences
    (`--kv-windows` sampled windows of block_size tokens; the full-sequence
    protocol cannot see KV quantization). Omit for the reference protocol."""
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any

    params, config = load_model_any(Path(checkpoint_path), quantize)
    _evaluate(params, config, datasets, _tokenizer(tokenizer_path),
              kv_cache=kv_cache, kv_windows=kv_windows)


def main_lora(
    datasets: str = "wikitext,ptb,c4",
    lora_path: str = "out/lora/alpaca/final.npz",
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    quantize: Optional[str] = None,
) -> None:
    """Evaluate a LoRA-finetuned model (reference `evaluate/lora.py`): base weights +
    LoRA state (two-pass load), merged for eval-speed parity."""
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.io.checkpoint import load_state_npz
    from lit_llama_ja_tpu.models.lora import add_lora, merge_lora

    params, config = load_model_any(Path(checkpoint_path), quantize)
    lora_state = jax.tree.map(jnp.asarray, load_state_npz(lora_path))
    params = merge_lora(add_lora(params, lora_state))
    _evaluate(params, config, datasets, _tokenizer(tokenizer_path))


def main_adapter(
    datasets: str = "wikitext,ptb,c4",
    adapter_path: str = "out/adapter/alpaca/final.npz",
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    quantize: Optional[str] = None,
    v2: bool = False,
) -> None:
    """Evaluate an adapter-finetuned model (reference `evaluate/adapter.py`,
    `evaluate/adapter_v2.py`)."""
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.io.checkpoint import load_state_npz
    from lit_llama_ja_tpu.models import adapter as adapter_mod

    params, config = load_model_any(Path(checkpoint_path), quantize)
    import dataclasses

    acfg = adapter_mod.AdapterConfig(
        **{f.name: getattr(config, f.name) for f in dataclasses.fields(config)}
    )
    state = jax.tree.map(jnp.asarray, load_state_npz(adapter_path))
    params = adapter_mod.add_adapter(
        params,
        {
            "adapter_wte": state["adapter"]["adapter_wte"],
            "gating_factor": state["adapter"]["gating_factor"],
        },
    )
    if v2:
        params = adapter_mod.add_adapter_v2(params)
        # overlay saved v2 leaves (scale/bias/norms) onto the tree
        from lit_llama_ja_tpu.io.checkpoint import unflatten_tree

        def overlay(dst, src):
            for k, v in src.items():
                if isinstance(v, dict):
                    overlay(dst[k], v)
                else:
                    dst[k] = jnp.asarray(v)

        overlay(params, {k: v for k, v in state.items() if k != "adapter"})
    fwd = lambda p, x, c=acfg: adapter_mod.adapter_forward(p, x, c)
    _evaluate(params, acfg, datasets, _tokenizer(tokenizer_path), forward_fn=fwd)


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
