"""Measure int8-KV vs int4-KV batched paged decode at 7B serving shapes —
quantifies the int4 post-gather unpack cost (PERF.md "INT4 KV cache").
Run: PYTHONPATH=/root/repo python tools/bench_kv4.py [B] [S] [int8|int4|both]"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import synth_int4_params
from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import (
    _paged_decode_and_sample,
    _paged_decode_read_and_sample,
    commit_writes_jit,
    init_page_pool,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
MODES = {"int8": (True,), "int4": ("int4",), "both": (True, "int4")}[
    sys.argv[3] if len(sys.argv) > 3 else "both"
]
ARG4 = sys.argv[4] if len(sys.argv) > 4 else "fused"
VARIANTS = ("fused", "split") if ARG4 == "ab" else (ARG4,)
PAGE, STEPS = 16, 16
config = LLaMAConfig.from_name("7B")
params = synth_int4_params(config, jax.random.PRNGKey(0))
temps = jnp.zeros((B,), jnp.float32)
key = jax.random.PRNGKey(0)
AP = S // PAGE
tables = jnp.asarray(1 + np.arange(B * AP, dtype=np.int32).reshape(B, AP))
pos = jnp.full((B,), S - STEPS - 2, jnp.int32)
toks = jnp.ones((B,), jnp.int32)
import os
chunk = None
if B > 8:
    chunk = next((c for c in (4, 3, 2) if B % c == 0), None)
if os.environ.get("CHUNK"):  # override: CHUNK=8 | CHUNK=none
    c = os.environ["CHUNK"]
    chunk = None if c == "none" else int(c)

for qkv in MODES:
  for variant in VARIANTS:
    SPLIT = variant == "split"
    pool = init_page_pool(config, B * AP + 1, PAGE, quantized=qkv)
    if SPLIT:
        # two-dispatch decode: read-only forward + write-only commit
        def step(nxt, pool, p):
            nxt, writes, pi, of = _paged_decode_read_and_sample(
                params, nxt, p, tables, pool, key, temps, config, qkv,
                None, None, chunk,
            )
            return nxt, commit_writes_jit(pool, writes, pi, of)

        nxt, pool = step(toks, pool, pos)
        _ = np.asarray(nxt)
        t0 = time.perf_counter()
        for i in range(STEPS):
            nxt, pool = step(nxt, pool, pos + 1 + i)
        _ = np.asarray(nxt)
    else:
        nxt, pool = _paged_decode_and_sample(
            params, toks, pos, tables, pool, key, temps, config, qkv, None,
            None, False, chunk,
        )
        _ = np.asarray(nxt)
        t0 = time.perf_counter()
        for i in range(STEPS):
            nxt, pool = _paged_decode_and_sample(
                params, nxt, pos + 1 + i, tables, pool, key, temps, config,
                qkv, None, None, False, chunk,
            )
        _ = np.asarray(nxt)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    mode = "split" if SPLIT else "fused"
    print(
        f"B={B} S={S} quantize_kv={qkv!r:7} chunk={chunk} {mode}: "
        f"{ms:6.1f} ms/step ({B / ms * 1e3:.0f} tok/s aggregate)"
    )
    del pool
