"""Measure scan-chunked single-stream decode vs one-dispatch-per-token.

Each tunnel dispatch costs ~1.1 ms (PERF.md); at ~17 ms/token that is ~6% of
the 7B int4 decode step. A `lax.scan` over n tokens inside one jit amortizes
it — IF the donated KV cache threads through the scan carry without the
read+write full-copy pathology the paged pools hit (PERF.md "two-dispatch").
This probe answers both questions at the bench.py shapes.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=str, default="1,4,8,16")
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    config = LLaMAConfig.from_name("7B")
    params = bench.synth_int4_params(config, jax.random.PRNGKey(0))
    cache0 = init_kv_cache(config, 1, 2048, quantized=True)

    def one(params, cache, tok, pos):
        logits, cache = forward_with_cache(params, tok, pos, cache, config)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        return cache, nxt

    for n in [int(c) for c in args.chunks.split(",")]:
        if n == 1:
            step = jax.jit(one, donate_argnums=(1,))

            def run(cache, tok, start):
                for i in range(args.steps):
                    cache, tok = step(
                        params, cache, tok, jnp.array([start + i], jnp.int32)
                    )
                return cache, tok
        else:
            @jax.jit
            def chunk(params, cache, tok, start, n=n):
                def body(carry, i):
                    cache, tok = carry
                    cache, tok = one(params, cache, tok, start + i[None])
                    return (cache, tok), tok[0, 0]
                (cache, tok), toks = jax.lax.scan(
                    body, (cache, tok), jnp.arange(n, dtype=jnp.int32)
                )
                return cache, tok, toks
            chunk = jax.jit(chunk, donate_argnums=(1,))

            def run(cache, tok, start, n=n, chunk=chunk):
                for i in range(args.steps // n):
                    cache, tok, _ = chunk(
                        params, cache, tok, jnp.array(start + i * n, jnp.int32)
                    )
                return cache, tok

        cache = jax.tree.map(jnp.copy, cache0)
        tok = jnp.zeros((1, 1), jnp.int32)
        cache, tok = run(cache, tok, 16)
        _ = np.asarray(tok)  # sync (block_until_ready unreliable here)
        t0 = time.perf_counter()
        cache, tok = run(cache, tok, 16 + args.steps)
        _ = np.asarray(tok)
        dt = time.perf_counter() - t0
        print(
            f"chunk={n:3d}: {dt / args.steps * 1e3:6.2f} ms/token "
            f"({args.steps / dt:6.2f} tok/s)", flush=True,
        )


if __name__ == "__main__":
    main()
