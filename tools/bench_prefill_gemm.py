"""Prefill (large-M) int4 GEMM tiling study on the real chip.

TTFT at 2048 tokens measured 425 ms ~ 68% of the compute roofline (PERF.md);
prefill is MXU-bound, so the question is whether the fused Pallas dequant
matmul's tiling (tuned for decode's M=1 GEMV regime) leaves MXU throughput on
the table at M=2048 — and whether the classic alternative (dequantize the
layer's weights to bf16 once, then run XLA's GEMM) is faster once M is large
enough to amortize the dequant traffic.

Methodology per PERF.md: in-jit lax.scan chains (amortize the ~1.1 ms tunnel
dispatch), weights passed as arguments (closure capture destroys perf), host
sync via np.asarray of a data-dependent scalar.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.ops.pallas.quant_matmul import quant_matmul_int4
from lit_llama_ja_tpu.quant.linear import dequantize_with_k

# 7B prefill shapes: (name, K, N)
SHAPES = [
    ("c_attn", 4096, 12288),
    ("attn_proj", 4096, 4096),
    ("c_fc", 4096, 11008),
    ("mlp_proj", 11008, 4096),
]
M = 2048
STEPS = 8


def synth(key, K, N, tile_cols=-1):
    n_tiles = 1 if tile_cols == -1 else (K + tile_cols - 1) // tile_cols
    return {
        "qweight": jax.random.randint(key, (K // 2, N), 0, 255, jnp.int32).astype(
            jnp.uint8
        ),
        "scales": jnp.full((n_tiles, N), 0.01, jnp.float32),
        "zeros": jnp.full((n_tiles, N), 7.0, jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "steps"))
def chain_pallas(x, qw, s, z, bm, bn, bk, steps):
    def body(xc, _):
        y = quant_matmul_int4(
            xc, qw, s, z, block_m=bm, block_n=bn, block_k=bk, out_dtype=jnp.bfloat16
        )
        pert = (y.mean() * 1e-6).astype(xc.dtype)
        return xc * (1 + pert), y[0, 0]

    _, ys = jax.lax.scan(body, x, None, length=steps)
    return ys


@functools.partial(jax.jit, static_argnames=("K", "steps"))
def chain_xla_dequant(x, qw, s, z, K, steps):
    w = dequantize_with_k({"qweight": qw, "scales": s, "zeros": z}, K, jnp.bfloat16)

    def body(xc, _):
        y = xc @ w
        pert = (y.mean() * 1e-6).astype(xc.dtype)
        return xc * (1 + pert), y[0, 0]

    _, ys = jax.lax.scan(body, x, None, length=steps)
    return ys


@functools.partial(jax.jit, static_argnames=("K", "steps"))
def chain_xla_dequant_per_step(x, qw, s, z, K, steps):
    """Dequant INSIDE the loop — models a layer whose weights are touched once."""

    def body(xc, _):
        w = dequantize_with_k(
            {"qweight": qw, "scales": s, "zeros": z}, K, jnp.bfloat16
        )
        y = xc @ w
        pert = (y.mean() * 1e-6).astype(xc.dtype)
        return xc * (1 + pert), y[0, 0]

    _, ys = jax.lax.scan(body, x, None, length=steps)
    return ys


def timeit(fn, *args, **kw):
    np.asarray(fn(*args, **kw))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(*args, **kw))
    t1 = time.perf_counter()
    return (t1 - t0) / STEPS


def main():
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.devices()[0].platform} M={M} steps={STEPS}")
    for name, K, N in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        p = synth(kw, K, N)
        flops = 2 * M * K * N
        print(f"\n{name}  K={K} N={N}  ({flops/1e12:.2f} TFLOP)", flush=True)

        def report(lbl, dt):
            if dt is None:
                print(f"  {lbl:28s}  FAILED", flush=True)
            else:
                print(f"  {lbl:28s}  {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
                      flush=True)

        for bm, bn, bk in [
            (256, 512, 1024),  # current default
            (512, 512, 1024),
            (512, 1024, 512),
            (1024, 512, 512),
        ]:
            try:
                dt = timeit(chain_pallas, x, p["qweight"], p["scales"], p["zeros"],
                            bm=bm, bn=bn, bk=min(bk, K // 2), steps=STEPS)
            except Exception:  # VMEM OOM etc.
                dt = None
            report(f"pallas bm{bm} bn{bn} bk{bk}", dt)
        for lbl, fn in [
            ("xla dequant-hoisted", chain_xla_dequant),
            ("xla dequant-per-use", chain_xla_dequant_per_step),
        ]:
            dt = timeit(fn, x, p["qweight"], p["scales"], p["zeros"], K=K,
                        steps=STEPS)
            report(lbl, dt)


if __name__ == "__main__":
    main()
