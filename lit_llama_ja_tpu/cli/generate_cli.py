"""Base generation CLI (reference `generate.py:92-172`)."""
from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def load_model_any(checkpoint_path: Path, quantize: Optional[str] = None):
    """Load a model from a native orbax dir, a lit `.pth`, or a PEFT npz combo.

    ``quantize`` in {None, "llm.int8", "llm.int8-rtn"} or "{gptq|rtn}.int{2,3,4,8}[-g<N>]":
    llm.int8 quantizes weight-only at load (like the reference's load-time
    requantization, `lit_llama/quantization.py:50-65`) with the bf16 outlier-
    channel decomposition of `quant/linear.quantize_int8_outlier` (the
    reference Linear8bitLt semantics); "llm.int8-rtn" is the plain absmax
    scheme. gptq.* expects an already-calibrated checkpoint (or quantizes RTN
    as fallback with a warning).
    """
    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.io.checkpoint import load_checkpoint
    from lit_llama_ja_tpu.io.convert import load_lit_checkpoint

    path = Path(checkpoint_path)
    if path.is_dir():
        params, config = load_checkpoint(path)
        if config is None:
            raise ValueError(f"missing config.json in {path}")
    else:
        if quantize is not None:
            # constant-memory quantized load: quantize per layer WHILE
            # streaming out of the mmap'd .pth (io/convert.py) — the fp model
            # never materializes in host RAM (reference purpose:
            # `lit_llama/utils.py:105-194`)
            if quantize.startswith("gptq"):
                print(
                    "warning: quantizing round-to-nearest at load; run "
                    "quantize/gptq.py for calibrated weights",
                    file=sys.stderr,
                )
            params, config = load_lit_checkpoint(path, quantize=quantize)
            params = jax.tree.map(jnp.asarray, params)
            return params, config
        params, config = load_lit_checkpoint(path)
        params = jax.tree.map(jnp.asarray, params)

    if quantize in ("llm.int8", "llm.int8-rtn", "llm.int8-dyn"):
        from lit_llama_ja_tpu.quant.pipeline import int8_quantize_model

        already = "qweight" in params["blocks"]["attn"]["c_attn"]
        if not already:
            outliers = {"llm.int8": True, "llm.int8-rtn": False,
                        "llm.int8-dyn": "dynamic"}[quantize]
            params = int8_quantize_model(params, outliers=outliers)
    elif quantize is not None:
        from lit_llama_ja_tpu.quant.linear import parse_quant_mode

        scheme, bits, groupsize = parse_quant_mode(quantize)
        already = "qweight" in params["blocks"]["attn"]["c_attn"]
        if not already:
            if scheme == "gptq":
                print(
                    "warning: checkpoint is not GPTQ-calibrated; applying RTN "
                    "round-to-nearest (run quantize/gptq.py for calibrated "
                    "weights)",
                    file=sys.stderr,
                )
            from lit_llama_ja_tpu.quant.linear import (
                quantize_colblock,
                resolve_bits,
                resolve_groupsize,
            )

            # RTN-quantize the five block linears + lm_head
            from lit_llama_ja_tpu.quant.pipeline import SUBMODULES, _get, _set, _to_mutable

            params = _to_mutable(params)
            for name in SUBMODULES:
                leaf = _get(params["blocks"], name)
                w = leaf["weight"]
                L = w.shape[0]
                nb = resolve_bits(bits, name)
                gs = resolve_groupsize(bits, name, groupsize)
                qs = [
                    quantize_colblock(w[l], bits=nb, tile_cols=gs)
                    for l in range(L)
                ]
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
                _set(params["blocks"], name, dict(stacked))
            params["lm_head"] = dict(
                quantize_colblock(
                    params["lm_head"]["weight"],
                    bits=resolve_bits(bits, "lm_head"),
                    tile_cols=resolve_groupsize(bits, "lm_head", groupsize),
                )
            )
    return params, config


def main(
    prompt: str = "Hello, my name is",
    num_samples: int = 1,
    max_new_tokens: int = 50,
    top_k: int = 200,
    top_p: float = 1.0,
    temperature: float = 0.8,
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    quantize: Optional[str] = None,
    draft_checkpoint_path: Optional[str] = None,
    draft_k: int = 4,
    tp: int = 1,
    fsdp: int = 1,
    quantize_kv: str = "none",
    seed: int = 1234,
) -> None:
    """Generates text samples based on a pre-trained LLaMA model and tokenizer.

    Args:
        prompt: The prompt string to use for generating the samples.
        num_samples: The number of text samples to generate.
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider.
        top_p: nucleus sampling mass (1.0 = off; extension over the reference).
        temperature: Sampling randomness scale.
        checkpoint_path: Native checkpoint dir or lit-llama .pth file.
        tokenizer_path: tokenizers-json (HF) or sentencepiece .model file.
        quantize: None | "llm.int8" | "gptq.int4" | "gptq.int8".
        draft_checkpoint_path: optional small-model checkpoint (same tokenizer,
            e.g. a 19M/49M ja model drafting for 7B) enabling speculative
            decoding: `infer/speculative.py` — exact target distribution, up to
            draft_k+1 tokens per target forward.
        draft_k: drafted tokens per speculative round.
        tp / fsdp: shard the weights over a ('dp','fsdp','tp') mesh
            (col/row-parallel per `parallel/specs.py`); the decode loop is
            sharding-oblivious.
        quantize_kv: "none" (default, bf16 cache — reference parity) |
            "int8" | "int4" (head-pair packed; the bench.py headline config —
            +16% single-stream decode, decode-path ppl ≈ fp, QUALITY.md).
        seed: PRNG seed.
    """
    from lit_llama_ja_tpu.infer.generate import generate
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer, Tokenizer

    print("Loading model ...", file=sys.stderr)
    t0 = time.time()
    params, config = load_model_any(Path(checkpoint_path), quantize)
    draft = None
    if draft_checkpoint_path:
        draft = load_model_any(Path(draft_checkpoint_path), None)
    if tp > 1 or fsdp > 1:
        from lit_llama_ja_tpu.parallel.mesh import make_mesh
        from lit_llama_ja_tpu.parallel.specs import shard_params

        mesh = make_mesh(dp=1, fsdp=fsdp, tp=tp)
        print(
            f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
            file=sys.stderr,
        )
        params = shard_params(params, mesh)
        if draft is not None:
            draft = (shard_params(draft[0], mesh), draft[1])
    print(f"Time to load model: {time.time() - t0:.02f} seconds.", file=sys.stderr)

    tok_path = Path(tokenizer_path)
    tokenizer = (
        Tokenizer(tok_path) if tok_path.suffix == ".model" else HFTokenizer(tok_path)
    )
    encoded = tokenizer.encode(prompt, bos=True, eos=False)
    prompt_length = len(encoded)

    from lit_llama_ja_tpu.models.llama import normalize_kv_mode

    qkv = normalize_kv_mode(quantize_kv)
    key = jax.random.PRNGKey(seed)
    for i in range(num_samples):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        if draft is not None:
            from lit_llama_ja_tpu.infer.speculative import speculative_generate

            spec_stats: dict = {}
            y = speculative_generate(
                params, config, draft[0], draft[1],
                jnp.asarray(encoded), max_new_tokens,
                K=draft_k, temperature=temperature, top_k=top_k,
                top_p=top_p if top_p < 1.0 else None,
                eos_id=tokenizer.eos_id, key=sub, cache_dtype=jnp.bfloat16,
                quantize_kv=qkv, stats_out=spec_stats,
            )
            if spec_stats:
                print(
                    f"speculative: acceptance {spec_stats['acceptance']:.3f}, "
                    f"{spec_stats['tokens'] / max(spec_stats['rounds'], 1):.2f} "
                    f"tokens/round over {spec_stats['rounds']} rounds",
                    file=sys.stderr,
                )
        else:
            y = generate(
                params,
                config,
                jnp.asarray(encoded),
                max_new_tokens,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p if top_p < 1.0 else None,
                eos_id=tokenizer.eos_id,
                key=sub,
                cache_dtype=jnp.bfloat16,
                quantize_kv=qkv,
            )
        jax.effects_barrier()
        t = time.perf_counter() - t0
        print(tokenizer.decode(y))
        tokens_generated = len(y) - prompt_length
        print(
            f"Time for inference {i + 1}: {t:.02f} sec total, "
            f"{tokens_generated / t:.02f} tokens/sec",
            file=sys.stderr,
        )


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
