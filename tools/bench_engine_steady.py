"""Steady-state REAL-ENGINE decode throughput at 7B serving shapes.

Unlike tools/bench_kv4.py (which times the raw dispatches), this drives
`PagedEngine.step()` itself — including the per-step host token transfer and
the lag-1 pipelined commit — so the number is what a serving deployment
actually gets. A/B's pipelined_commit against the separate-commit path in
the same session.

Run: python tools/bench_engine_steady.py [B] [PROMPT] [STEPS]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

from bench import synth_int4_params  # noqa: E402
from lit_llama_ja_tpu.core.config import LLaMAConfig  # noqa: E402
from lit_llama_ja_tpu.infer.paged import PagedEngine  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
PROMPT = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
PAGE = 16

config = LLaMAConfig.from_name("7B")
params = synth_int4_params(config, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
maxP = (PROMPT + STEPS + 64) // PAGE + 2

for pipelined in (False, True):
    eng = PagedEngine(
        params, config, max_batch=B, n_pages=B * maxP + 1, page_size=PAGE,
        max_pages_per_slot=maxP, quantize_kv="int4", seed=0,
        pipelined_commit=pipelined,
    )
    for _ in range(B):
        p = rng.integers(1, config.vocab_size, PROMPT).astype(np.int32)
        eng.add_request(p, max_new_tokens=STEPS + 64)
    # admission prefills happen inside the first steps; warm until all slots
    # are decoding and programs are compiled
    for _ in range(6):
        eng.step()
    t0 = time.perf_counter()
    tokens = 0
    for _ in range(STEPS):
        tokens += len(eng.step())
    t = time.perf_counter() - t0
    print(
        f"pipelined_commit={pipelined}: {t/STEPS*1e3:7.1f} ms/step | "
        f"{tokens/t:7.1f} tok/s aggregate (B={B}, prompt={PROMPT})",
        flush=True,
    )
