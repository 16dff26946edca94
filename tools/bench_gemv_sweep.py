"""Sweep int4 quant-matmul tilings at the 7B DECODE (M=1 GEMV) shapes.

tools/bench_prefill_gemm.py found tilings don't matter at M=2048; this is the
M=1 sweep the decode step actually runs. tools/bench_tile_read.py measured
strided (bk, 512)-byte tile reads ~30% slower than (bk, >=1024) at these
shapes, and block_n=512 is the kernel's default — so decode may be leaving
weight-stream bandwidth on the table.

Harness: one "pass" = the four distinct per-layer matmuls of a 7B decode
token (c_attn, attn.c_proj, c_fc1+c_fc2 [same shape, run twice], mlp.c_proj),
scanned 32x in-jit (layer count) with a carry perturbing x. Weights stream
from HBM every iteration. Compare ratios within this harness only.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.ops.pallas.quant_matmul import (
    quant_matmul_int4,
    quant_matmul_int8,
)
from lit_llama_ja_tpu.utils.profiling import sync

SHAPES = [  # (K, N, count) per 7B layer
    (4096, 12288, 1),   # c_attn
    (4096, 4096, 1),    # attn.c_proj
    (4096, 11008, 2),   # c_fc1, c_fc2
    (11008, 4096, 1),   # mlp.c_proj
]


def synth(key, K, N, groups=1, bits=4):
    k1, k2, k3 = jax.random.split(key, 3)
    rows = K // 2 if bits == 4 else K
    qw = jax.random.randint(k1, (rows, N), 0, 255, jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(k2, (groups, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.uniform(k3, (groups, N), jnp.float32, 5.0, 10.0)
    return qw, scales, zeros


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--bits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--unpack", type=str, default="bf16")
    args = ap.parse_args()

    qmm = quant_matmul_int4 if args.bits == 4 else quant_matmul_int8
    key = jax.random.PRNGKey(0)
    weights = []
    for i, (K, N, count) in enumerate(SHAPES):
        for c in range(count):
            weights.append(
                synth(jax.random.fold_in(key, i * 4 + c), K, N, args.groups, args.bits)
            )

    total_bytes = sum(w[0].size for w in weights) * args.layers
    x0 = jnp.ones((args.m, 4096), jnp.bfloat16)

    import ast, os
    env = os.environ.get("GEMV_CONFIGS")
    configs = ast.literal_eval(env) if env else [
        (512, 1024), (1024, 1024), (2048, 1024),
        (512, 512), (1024, 512), (2048, 512),
        (4096, 512), (4096, 1024),
    ]
    for bn, bk in configs:
        def one_pass(x, ws=tuple(weights), bn=bn, bk=bk):
            outs = []
            shapes_flat = []
            for (K, N, count) in SHAPES:
                for _ in range(count):
                    shapes_flat.append((K, N))
            for (K, N), (qw, s, z) in zip(shapes_flat, ws):
                xin = x if K == 4096 else jnp.tile(x, (1, K // 4096 + 1))[:, :K]
                kw = {}
                if args.bits == 4 and args.unpack != "bf16":
                    kw["unpack"] = args.unpack
                outs.append(
                    qmm(xin, qw, s, z, block_m=8, block_n=bn, block_k=bk, **kw)
                )
            return sum(o[:, :1].sum() for o in outs)

        @jax.jit
        def f(x):
            def body(c, _):
                r = one_pass(x * (1 + c * 1e-9))
                return r * 1e-20, ()
            c, _ = jax.lax.scan(
                body, jnp.bfloat16(0.0), None, length=args.layers
            )
            return c

        try:
            sync(f(x0))
        except Exception as e:  # VMEM OOM etc.
            print(
                f"bn={bn:5d} bk={bk:5d}: FAILED {type(e).__name__}: "
                f"{str(e)[:400]}",
                flush=True,
            )
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(x0)
        sync(out)
        t = (time.perf_counter() - t0) / args.iters
        gbps = total_bytes / t / 1e9
        print(
            f"bn={bn:5d} bk={bk:5d}: {t*1e3:7.2f} ms/32-layer pass "
            f"({gbps:6.1f} GB/s weight stream)", flush=True,
        )


if __name__ == "__main__":
    main()
