"""Measure strided-tile vs contiguous HBM reads at the int4 GEMV shapes.

The decode-path quant matmul reads (bk, bn) tiles of a row-major (Khalf, N)
uint8 weight: each tile is bk rows of bn bytes with stride N — NOT contiguous.
This probe compares:

  cont-rows   : (bk, N) full-row blocks (contiguous)
  tile-strided: (bk, bn) tiles walked (j, k) like the matmul grid
  tile-major  : same tiles pre-relayout to (n_k, n_j, bk, bn) so each block is
                contiguous in HBM

If tile-major ≫ tile-strided, repacking weights tile-major is a decode win.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lit_llama_ja_tpu.utils.profiling import sync


def _sum2d_kernel(x_ref, o_ref, acc_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.sum(x_ref[:].astype(jnp.int32).astype(jnp.float32), axis=0, keepdims=True)[:, :128]
    last = (pl.program_id(0) == pl.num_programs(0) - 1) & (
        pl.program_id(1) == pl.num_programs(1) - 1
    )
    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:]


def _sum4d_kernel(x_ref, o_ref, acc_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.sum(
        x_ref[0, 0].astype(jnp.int32).astype(jnp.float32), axis=0, keepdims=True
    )[:, :128]
    last = (pl.program_id(0) == pl.num_programs(0) - 1) & (
        pl.program_id(1) == pl.num_programs(1) - 1
    )
    @pl.when(last)
    def _():
        o_ref[:] = acc_ref[:]


def make_reader(shape_kind, K, N, bk, bn):
    if shape_kind == "cont-rows":
        def one(x):
            return pl.pallas_call(
                _sum2d_kernel,
                grid=(K // bk, 1),
                in_specs=[pl.BlockSpec((bk, N), lambda k, j: (k, 0))],
                out_specs=pl.BlockSpec((1, 128), lambda k, j: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
            )(x)
    elif shape_kind == "tile-strided":
        def one(x):
            return pl.pallas_call(
                _sum2d_kernel,
                grid=(N // bn, K // bk),  # j outer, k inner (matmul order)
                in_specs=[pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
                out_specs=pl.BlockSpec((1, 128), lambda j, k: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
            )(x)
    else:  # tile-major
        def one(x):
            return pl.pallas_call(
                _sum4d_kernel,
                grid=(N // bn, K // bk),
                in_specs=[pl.BlockSpec((1, 1, bk, bn), lambda j, k: (j, k, 0, 0))],
                out_specs=pl.BlockSpec((1, 128), lambda j, k: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
            )(x)
    return one


def run(kind, K, N, bk, bn, inner, iters):
    one = make_reader(kind, K, N, bk, bn)
    if kind == "tile-major":
        x0 = jnp.ones((N // bn, K // bk, bk, bn), jnp.uint8)
    else:
        x0 = jnp.ones((K, N), jnp.uint8)

    @jax.jit
    def f(x):
        def body(c, _):
            r = one(x)
            return (r[0, :1] * 1e-20).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=inner)
        return c

    sync(f(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x0)
    sync(out)
    t = (time.perf_counter() - t0) / (iters * inner)
    gbps = K * N / t / 1e9
    print(f"{kind:>13} bk={bk:5d} bn={bn:5d}: {gbps:7.1f} GB/s ({t*1e3:.3f} ms/pass)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=2048)   # Khalf of 7B c_attn
    ap.add_argument("--N", type=int, default=12288)
    ap.add_argument("--inner", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    K, N = args.K, args.N

    for bk, bn in [(1024, 512), (512, 1024), (2048, 512), (1024, 1024), (512, 2048)]:
        if K % bk or N % bn:
            continue
        run("tile-strided", K, N, bk, bn, args.inner, args.iters)
        run("tile-major", K, N, bk, bn, args.inner, args.iters)
    for bk in (256, 512, 1024):
        run("cont-rows", K, N, bk, N, args.inner, args.iters)


if __name__ == "__main__":
    main()
