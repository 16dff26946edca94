"""Batch-serving CLI over the continuous-batching engine (new capability —
the reference has only single-prompt `generate.py`)."""
from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np


def main(
    prompts_file: str = "",
    prompt: str = "Hello, my name is",
    n_requests: int = 8,
    max_new_tokens: int = 50,
    max_batch: int = 8,
    temperature: float = 0.8,
    top_k: int = 200,
    top_p: float = 1.0,
    checkpoint_path: str = "checkpoints/lit-llama/7B/native",
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    quantize: Optional[str] = None,
    quantize_kv: str = "int4",
    max_seq_length: int = 2048,
    paged: bool = True,
    page_size: int = 16,
    n_pages: int = 0,
    prefill_chunk: int = 0,
    draft_checkpoint_path: str = "",
    draft_k: int = 4,
    adaptive_k: bool = False,
    draft_tree: str = "",
    pp_stages: int = 0,
    pp_microbatches: int = 0,
    tp: int = 1,
    fsdp: int = 1,
    seed: int = 1234,
) -> None:
    """Serve a batch of prompts with continuous batching.

    Args:
        prompts_file: newline-separated prompts; empty -> repeat ``prompt``
            ``n_requests`` times.
        quantize: None | "llm.int8" | "gptq.int4" | "gptq.int8" (weights).
        quantize_kv: "int4" (default) | "int8" | "none". INT4 packs the
            cache across head pairs — quarter the decode cache traffic;
            decode-path ppl measured indistinguishable from fp on a real
            checkpoint (QUALITY.md) and 1.7-2x faster serving than int8-KV
            (PERF.md round 3).
        paged: page-pool KV cache (`infer/paged.py`, the default) — shared
            memory budget with admission backpressure and preemption instead
            of per-slot stripes; also the faster engine (PERF.md: paged beats
            stripes ~25%, and its two-dispatch decode adds +32-79% on top).
            ``--paged false`` selects the slot-stripe engine.
        page_size: tokens per page (paged only).
        n_pages: KV pool size in pages; 0 -> the dense equivalent
            ``max_batch * max_seq_length / page_size`` (paged only).
        prefill_chunk: interleave long-prompt prefill with decode in chunks of
            this many tokens (paged only); 0 = whole-prompt prefill.
        draft_checkpoint_path: small-model checkpoint enabling batched
            speculative decoding (paged only): up to draft_k+1 tokens per slot
            per step, exact target distribution.
        draft_k: drafted tokens per speculative round.
        adaptive_k: pick K per round from [1, draft_k] under the measured
            acceptance rate (chain speculative only).
        draft_tree: comma-separated per-level branching (e.g. "4,2,2") for
            TREE speculation (`infer/tree_spec.py`): each level retries with
            that many draft candidates, raising per-level survival from a to
            1-(1-a)^b; empty = chain speculation of length draft_k.
        pp_stages: run the paged engine pipeline-parallel over this many
            devices ('pp' mesh axis; layers + page pool sharded per stage) —
            for models beyond one host's HBM. 0 = single-mesh.
        pp_microbatches: decode wavefront width (defaults to pp_stages;
            must divide max_batch).
        tp / fsdp: shard the weights over a ('dp','fsdp','tp') mesh before
            serving (col/row-parallel per `parallel/specs.py`, quantized
            leaves included); the engines are sharding-oblivious. Composes
            with --pp-stages: the pipeline wavefront is manual over 'pp'
            only, tp/fsdp shard each stage's math under GSPMD
            (`parallel/pp_decode.py` pp × tp serving).
    """
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.infer.paged import PagedEngine
    from lit_llama_ja_tpu.infer.serving import Engine
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer, Tokenizer

    params, config = load_model_any(Path(checkpoint_path), quantize)
    from lit_llama_ja_tpu.models.llama import normalize_kv_mode

    quantize_kv = normalize_kv_mode(quantize_kv)
    if (tp > 1 or fsdp > 1) and not pp_stages:
        from lit_llama_ja_tpu.parallel.mesh import make_mesh
        from lit_llama_ja_tpu.parallel.specs import shard_params

        mesh = make_mesh(dp=1, fsdp=fsdp, tp=tp)
        print(
            f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
            file=sys.stderr,
        )
        params = shard_params(params, mesh)
    tok_path = Path(tokenizer_path)
    tokenizer = (
        Tokenizer(tok_path) if tok_path.suffix == ".model" else HFTokenizer(tok_path)
    )

    if prompts_file:
        prompts = [
            line.strip()
            for line in Path(prompts_file).read_text().splitlines()
            if line.strip()
        ]
    else:
        prompts = [prompt] * n_requests

    if paged:
        pool_pages = n_pages or (max_batch * max_seq_length) // page_size + 1
        common = dict(
            max_batch=max_batch, n_pages=pool_pages, page_size=page_size,
            max_pages_per_slot=max(1, max_seq_length // page_size),
            quantize_kv=quantize_kv, eos_id=tokenizer.eos_id,
            prefill_chunk=prefill_chunk or None, seed=seed,
        )
        if pp_stages:
            import jax

            from lit_llama_ja_tpu.parallel.mesh import make_mesh

            n_dev = pp_stages * tp * fsdp
            common["pp_mesh"] = make_mesh(
                dp=1, fsdp=fsdp, tp=tp, pp=pp_stages,
                devices=jax.devices()[:n_dev],
            )
            common["pp_microbatches"] = pp_microbatches or pp_stages
        if draft_checkpoint_path:
            dparams, dconfig = load_model_any(Path(draft_checkpoint_path), None)
            if draft_tree:
                from lit_llama_ja_tpu.infer.tree_spec import (
                    TreeSpeculativePagedEngine,
                )

                engine = TreeSpeculativePagedEngine(
                    params, config, draft_params=dparams, draft_config=dconfig,
                    tree=tuple(int(b) for b in draft_tree.split(",")), **common,
                )
            else:
                from lit_llama_ja_tpu.infer.spec_serving import (
                    SpeculativePagedEngine,
                )

                engine = SpeculativePagedEngine(
                    params, config, draft_params=dparams, draft_config=dconfig,
                    draft_k=draft_k, adaptive_k=adaptive_k, **common,
                )
        else:
            engine = PagedEngine(params, config, **common)
    else:
        if quantize_kv == "int4":
            # the slot-stripe engine predates the head-pair int4 cache; its
            # write path is int8-only — downgrade rather than crash
            print("stripe engine supports int8 KV at most; using int8",
                  file=sys.stderr)
            quantize_kv = True
        engine = Engine(
            params, config,
            max_batch=max_batch, max_seq_length=max_seq_length,
            quantize_kv=quantize_kv, eos_id=tokenizer.eos_id, seed=seed,
        )
    encoded = []
    for p in prompts:
        ids = tokenizer.encode(p, bos=True, eos=False)
        if len(ids) >= max_seq_length:
            print(
                f"skipping prompt of {len(ids)} tokens (cache holds {max_seq_length})",
                file=sys.stderr,
            )
            continue
        encoded.append(ids)
    if not encoded:
        print("no valid prompts", file=sys.stderr)
        return

    t0 = time.perf_counter()
    outputs = engine.run(
        [(ids, max_new_tokens) for ids in encoded],
        temperature=temperature, top_k=top_k,
        top_p=top_p if top_p < 1.0 else None,
    )
    dt = time.perf_counter() - t0

    n_tokens = 0
    for rid in sorted(outputs):
        prompt_len = len(encoded[rid])
        n_tokens += len(outputs[rid]) - prompt_len
        print(f"--- request {rid} ---")
        print(tokenizer.decode(outputs[rid]))
    print(
        f"\n{len(outputs)} requests, {n_tokens} tokens in {dt:.2f}s "
        f"-> {n_tokens / dt:.1f} tokens/s aggregate",
        file=sys.stderr,
    )


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
