"""Pretrain step throughput + MFU on the real chip for the ja model family.
Run: PYTHONPATH=/root/repo python tools/bench_train.py [model ...]

MFU denominator: v5e bf16 peak 197 TFLOP/s; FLOPs/token = 6*N_params +
12*L*D*T (attention, fwd+bwd), the standard PaLM accounting.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, str(Path(__file__).parent.parent))

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.train.step import jit_train_step, make_train_step

PEAK_TFLOPS = 197.0
T = 2048
STEPS = 8

models = sys.argv[1:] or ["19M", "49M", "125M"]
for name in models:
    config = LLaMAConfig.from_name(name)
    # micro_bs scaled down as the model grows; accum=1 (pure step cost)
    micro_bs = {"19M": 8, "49M": 4, "125M": 2}.get(name, 1)
    params = init_params(jax.random.PRNGKey(0), config)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    opt = optax.adamw(3e-4, weight_decay=0.1)
    step = jit_train_step(
        make_train_step(config, opt, compute_dtype=jnp.bfloat16)
    )
    opt_state = opt.init(params)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(
            0, config.vocab_size, (1, micro_bs, T + 1), dtype=np.int32
        )
    )
    params, opt_state, loss = step(params, opt_state, batch)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state, batch)
    _ = float(loss)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    toks = micro_bs * T
    flops_per_tok = 6 * n_params + 12 * config.n_layer * config.n_embd * T
    tflops = toks / (ms / 1e3) * flops_per_tok / 1e12
    print(
        f"{name}: {ms:7.1f} ms/iter  micro_bs={micro_bs} T={T}  "
        f"{toks / ms * 1e3 / 1e3:7.1f}k tok/s  "
        f"{tflops:6.1f} TFLOP/s  MFU {tflops / PEAK_TFLOPS * 100:4.1f}%"
    )
