"""Probe the true HBM streaming ceiling of this chip/tunnel.

Round 1 recorded a ~220 GB/s practical ceiling from an f32 elementwise r+w
probe and concluded single-stream int4 decode (207 GB/s aggregate) was
saturated.  This tool probes READ-ONLY bandwidth several ways to check whether
that ceiling is real or an artifact of the r+w probe:

  xla-sum      : jnp.sum over the big buffer (read-only, XLA reduction)
  xla-gemv     : (R, C) @ (C,) matvec in XLA (read-only)
  pallas-sum   : Pallas grid reduction, 512x1024 int8 blocks -> f32 scratch
  pallas-gemv  : Pallas row-block matvec (bf16)

All probes amortize dispatch with an in-jit lax.scan whose carry perturbs the
computation (so nothing hoists), and synchronize with a host transfer
(utils/profiling.sync) -- see PERF.md "Measurement methodology".
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lit_llama_ja_tpu.utils.profiling import sync


def _timed(fn, x, iters, inner):
    out = fn(x)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / (iters * inner)


# ---------------------------------------------------------------- xla probes
def make_xla_sum(inner):
    @jax.jit
    def f(x):
        def body(c, _):
            # abs(x - c) is not factorable; forces a full re-read per step.
            c = jnp.sum(jnp.abs(x.astype(jnp.float32) - c)) * 1e-20
            return c, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return c
    return f


def make_xla_gemv(inner):
    @jax.jit
    def f(x):
        def body(v, _):
            r = x @ v  # (R, C) @ (C,)
            return (r[: x.shape[1]] * 1e-6).astype(x.dtype), ()
        v, _ = jax.lax.scan(body, jnp.ones((x.shape[1],), x.dtype), None, length=inner)
        return v
    return f


# ------------------------------------------------------------- pallas probes
def _sum_kernel(seed_ref, x_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0, keepdims=True) + seed_ref[0]
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def make_pallas_sum(inner, rows_per_block):
    def one(x, seed):
        n_blocks = x.shape[0] // rows_per_block
        return pl.pallas_call(
            _sum_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows_per_block, x.shape[1]), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, x.shape[1]), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, x.shape[1]), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, x.shape[1]), jnp.float32)],
        )(seed, x)

    @jax.jit
    def f(x):
        def body(c, _):
            r = one(x, c)
            return (r[0, :1] * 1e-20).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=inner)
        return c
    return f


def _gemv_kernel(x_ref, v_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def make_pallas_gemv(inner, rows_per_block):
    def one(x, v):
        n_blocks = x.shape[0] // rows_per_block
        return pl.pallas_call(
            _gemv_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((rows_per_block, x.shape[1]), lambda i: (i, 0)),
                pl.BlockSpec((x.shape[1], 8), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((rows_per_block, 8), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], 8), jnp.float32),
        )(x, v)

    @jax.jit
    def f(x):
        def body(v, _):
            r = one(x, v)
            return (r[: x.shape[1]] * 1e-6).astype(x.dtype), ()
        v, _ = jax.lax.scan(body, jnp.ones((x.shape[1], 8), x.dtype), None, length=inner)
        return v
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1024, help="buffer size in MiB")
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rows-per-block", type=int, default=512)
    ap.add_argument("--probes", type=str, default="")
    args = ap.parse_args()

    ap_probes = args.probes.split(",") if args.probes else None
    nbytes = args.mb * 1024 * 1024

    rows8 = nbytes // 1024
    rows16 = nbytes // 2048
    probes = {
        "xla-sum-int8": (make_xla_sum(args.inner), jnp.int8, rows8),
        "pallas-sum-int8": (make_pallas_sum(args.inner, args.rows_per_block), jnp.int8, rows8),
        "xla-sum-bf16": (make_xla_sum(args.inner), jnp.bfloat16, rows16),
        "pallas-sum-bf16": (make_pallas_sum(args.inner, args.rows_per_block), jnp.bfloat16, rows16),
        "xla-gemv-bf16": (make_xla_gemv(args.inner), jnp.bfloat16, rows16),
        "pallas-gemv-bf16": (make_pallas_gemv(args.inner, args.rows_per_block), jnp.bfloat16, rows16),
    }
    for name, (fn, dt, rows) in probes.items():
        if ap_probes and name not in ap_probes:
            continue
        x = jnp.ones((rows, 1024), dt)
        t = _timed(fn, x, args.iters, args.inner)
        print(f"{name:>22}: {nbytes / t / 1e9:8.1f} GB/s  ({t*1e3:.2f} ms/pass)", flush=True)


if __name__ == "__main__":
    main()
