"""Generation from finetuned checkpoints (reference `generate/{full,lora,adapter,adapter_v2}.py`):
load base + finetuned/PEFT state, format the Alpaca prompt, generate."""
from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp


def _generate_with(params, config, prompt, tokenizer_path, max_new_tokens,
                   top_k, temperature, forward_fn=None, config_for_gen=None):
    from lit_llama_ja_tpu.data.sft import generate_prompt
    from lit_llama_ja_tpu.infer.generate import generate
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer, Tokenizer

    tok_path = Path(tokenizer_path)
    tokenizer = (
        Tokenizer(tok_path) if tok_path.suffix == ".model" else HFTokenizer(tok_path)
    )
    sample = {"instruction": prompt, "input": ""}
    full_prompt = generate_prompt(sample)
    encoded = tokenizer.encode(full_prompt, bos=True, eos=False)

    t0 = time.perf_counter()
    y = generate(
        params,
        config_for_gen or config,
        jnp.asarray(encoded),
        max_new_tokens,
        temperature=temperature,
        top_k=top_k,
        eos_id=tokenizer.eos_id,
        cache_dtype=jnp.bfloat16,
    )
    t = time.perf_counter() - t0
    output = tokenizer.decode(y)
    output = output.split("### Response:")[-1].strip()
    print(output)
    print(
        f"\nTime for inference: {t:.02f} sec total, "
        f"{(len(y) - len(encoded)) / t:.02f} tokens/sec", file=sys.stderr,
    )


def main_full(
    prompt: str = "Hello, my name is",
    checkpoint_path: str = "out/full/alpaca/final",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    quantize: Optional[str] = None,
) -> None:
    """Generate from a fully-finetuned checkpoint (reference `generate/full.py`)."""
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any

    params, config = load_model_any(Path(checkpoint_path), quantize)
    _generate_with(params, config, prompt, tokenizer_path, max_new_tokens, top_k, temperature)


def main_lora(
    prompt: str = "Hello, my name is",
    lora_path: str = "out/lora/alpaca/final.npz",
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    quantize: Optional[str] = None,
) -> None:
    """Generate from base + LoRA weights (reference `generate/lora.py` — the
    two-pass strict=False load becomes add_lora + merge)."""
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.io.checkpoint import load_state_npz
    from lit_llama_ja_tpu.models.lora import add_lora, merge_lora

    params, config = load_model_any(Path(checkpoint_path), quantize)
    lora_state = jax.tree.map(jnp.asarray, load_state_npz(lora_path))
    params = merge_lora(add_lora(params, lora_state))
    _generate_with(params, config, prompt, tokenizer_path, max_new_tokens, top_k, temperature)


def main_adapter(
    prompt: str = "Hello, my name is",
    adapter_path: str = "out/adapter/alpaca/final.npz",
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    quantize: Optional[str] = None,
    v2: bool = False,
) -> None:
    """Generate from base + adapter weights (reference `generate/adapter.py`,
    `generate/adapter_v2.py`)."""
    import dataclasses

    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.infer.generate import generate as _  # noqa: F401
    from lit_llama_ja_tpu.io.checkpoint import load_state_npz
    from lit_llama_ja_tpu.models import adapter as adapter_mod

    params, config = load_model_any(Path(checkpoint_path), quantize)
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

    # adapter generation uses the adapter forward in a simple sampling loop
    from lit_llama_ja_tpu.data.sft import generate_prompt
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer, Tokenizer
    from lit_llama_ja_tpu.models.llama import init_kv_cache
    from lit_llama_ja_tpu.ops.sampling import sample_token
    import numpy as np

    tok_path = Path(tokenizer_path)
    tokenizer = (
        Tokenizer(tok_path) if tok_path.suffix == ".model" else HFTokenizer(tok_path)
    )
    encoded = tokenizer.encode(
        generate_prompt({"instruction": prompt, "input": ""}), bos=True, eos=False
    )
    T = len(encoded)
    S = min(T + max_new_tokens, acfg.block_size)
    cache = init_kv_cache(acfg, 1, S, jnp.bfloat16)
    t0 = time.perf_counter()
    logits, cache = adapter_mod.adapter_forward_with_cache(
        params, jnp.asarray(encoded)[None], jnp.arange(T, dtype=jnp.int32), cache, acfg,
        prefill_attn=True,  # empty cache: causal over in-flight k/v
    )
    key = jax.random.PRNGKey(0)
    ids = list(encoded)
    tok = None
    for i in range(max_new_tokens):
        key, sub = jax.random.split(key)
        tok = int(sample_token(sub, logits[0, -1], temperature, top_k))
        ids.append(tok)
        if tok == tokenizer.eos_id:
            break
        logits, cache = adapter_mod.adapter_forward_with_cache(
            params, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([T + i], jnp.int32), cache, acfg,
        )
    t = time.perf_counter() - t0
    output = tokenizer.decode(np.asarray(ids)).split("### Response:")[-1].strip()
    print(output)
    print(f"\nTime for inference: {t:.02f} sec, {(len(ids) - T) / t:.02f} tokens/sec",
          file=sys.stderr)


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main_full)
