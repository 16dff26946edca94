"""Measure paged vs slot-stripe batched decode at 7B serving shapes on the real
chip (int4 weights + int8 KV, batch 8, 1024-token region) — quantifies the page
gather cost. Run: PYTHONPATH=/root/repo python tools/bench_paged.py"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import synth_int4_params
from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.infer.paged import _paged_decode_and_sample, init_page_pool
from lit_llama_ja_tpu.infer.serving import _decode_and_sample
from lit_llama_ja_tpu.models.llama import init_kv_cache

B, S, PAGE, STEPS = 8, 1024, 16, 16
config = LLaMAConfig.from_name("7B")
params = synth_int4_params(config, jax.random.PRNGKey(0))
temps = jnp.zeros((B,), jnp.float32)
key = jax.random.PRNGKey(0)

# --- slot engine step ------------------------------------------------------
base = init_kv_cache(config, B, S, dtype=jnp.bfloat16, quantized=True)
cache = {k: v.transpose(0, 1, 3, 2, 4) for k, v in base.items()}
toks = jnp.zeros((B,), jnp.int32)
pos = jnp.full((B,), 512, jnp.int32)

nxt, cache = _decode_and_sample(params, toks, pos, cache, key, temps, config, True, None)
_ = np.asarray(nxt)
t0 = time.perf_counter()
for i in range(STEPS):
    nxt, cache = _decode_and_sample(
        params, nxt, pos + 1 + i, cache, key, temps, config, True, None
    )
_ = np.asarray(nxt)
slot_ms = (time.perf_counter() - t0) / STEPS * 1e3
print(f"slot-stripe decode: {slot_ms:.1f} ms/step ({B / slot_ms * 1e3:.0f} tok/s aggregate)")
del cache, base

# --- paged step ------------------------------------------------------------
AP = S // PAGE
pool = init_page_pool(config, B * AP + 1, PAGE, quantized=True)
tables = jnp.asarray(
    1 + np.arange(B * AP, dtype=np.int32).reshape(B, AP)
)
nxt, pool = _paged_decode_and_sample(
    params, toks, pos, tables, pool, key, temps, config, True, None
)
_ = np.asarray(nxt)
t0 = time.perf_counter()
for i in range(STEPS):
    nxt, pool = _paged_decode_and_sample(
        params, nxt, pos + 1 + i, tables, pool, key, temps, config, True, None
    )
_ = np.asarray(nxt)
paged_ms = (time.perf_counter() - t0) / STEPS * 1e3
print(f"paged decode:       {paged_ms:.1f} ms/step ({B / paged_ms * 1e3:.0f} tok/s aggregate)")
print(f"paged overhead: {paged_ms / slot_ms - 1:+.1%}")

# --- paged step with the Pallas attention kernel -----------------------------
nxt, pool = _paged_decode_and_sample(
    params, toks, pos, tables, pool, key, temps, config, True, None, True
)
_ = np.asarray(nxt)
t0 = time.perf_counter()
for i in range(STEPS):
    nxt, pool = _paged_decode_and_sample(
        params, nxt, pos + 1 + i, tables, pool, key, temps, config, True, None, True
    )
_ = np.asarray(nxt)
kern_ms = (time.perf_counter() - t0) / STEPS * 1e3
print(f"paged decode+kernel: {kern_ms:.1f} ms/step ({B / kern_ms * 1e3:.0f} tok/s aggregate)")
print(f"kernel vs gather: {kern_ms / paged_ms - 1:+.1%}")
