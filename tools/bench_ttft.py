"""Time-to-first-token: full 2048-token prefill on 7B int4 weights, one chip.

The round-1 figure (425 ms) and the round-2 prefill-GEMM study (407 ms)
predate the round-3 kernel changes and the int4-KV serving default; this
re-measures TTFT under the current defaults and reports same-session spread
(PERF.md documents ±35% cross-session drift for serving absolutes — ranges,
not points, are the honest unit here).

Run: python tools/bench_ttft.py [T] [--kv int4|int8|fp] [--iters N]
"""
import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import synth_int4_params
from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache
from lit_llama_ja_tpu.utils.profiling import sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("T", nargs="?", type=int, default=2048)
    ap.add_argument("--kv", default="int4", choices=("int4", "int8", "fp"))
    ap.add_argument("--iters", type=int, default=9)
    ap.add_argument(
        "--cache-read-attn", action="store_true",
        help="pre-round-4 behavior: prefill attention reads the S-wide cache",
    )
    args = ap.parse_args()

    config = LLaMAConfig.from_name("7B")
    params = synth_int4_params(config, jax.random.PRNGKey(0))
    qkv = {"int4": "int4", "int8": True, "fp": False}[args.kv]

    @jax.jit
    def prefill(params, toks, cache):
        pos = jnp.arange(args.T, dtype=jnp.int32)
        logits, cache = forward_with_cache(
            params, toks, pos, cache, config,
            prefill_attn=not args.cache_read_attn,
        )
        return jnp.argmax(logits[:, -1], axis=-1), cache

    toks = jnp.ones((1, args.T), jnp.int32)
    cache0 = init_kv_cache(
        config, 1, config.block_size, jnp.bfloat16, quantized=qkv
    )
    nxt, cache = prefill(params, toks, cache0)
    sync(nxt)  # compile

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        nxt, cache = prefill(params, toks, cache0)
        sync(nxt)
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.array(times)
    print(
        f"TTFT 7B int4-weights kv={args.kv} T={args.T}: "
        f"median {np.median(times):.1f} ms "
        f"(min {times.min():.1f} / max {times.max():.1f}, n={args.iters})"
    )


if __name__ == "__main__":
    main()
