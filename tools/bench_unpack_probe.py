"""Isolate the int4 GEMV kernel's per-byte cost components on real TPU.

Each probe streams the same packed (K/2, N)-uint8 weights through a Pallas
kernel at the decode tiling (bk 512, bn 4096, M=1→bm 8) and differs only in
the in-kernel body. Rates are directly comparable; some bodies compute the
WRONG math on purpose — they are perf probes, not kernels:

  onecast   : ONE i16→bf16 cast per byte + ONE dot  (the int8-kernel workload
              at int4 byte width — upper bound for any unpack scheme)
  onedot    : 2 u8 ANDs + one cast + ONE dot        (adds the mask cost)
  twodot    : 2 u8 ANDs + two casts + TWO dots      (the real bf16_u8 body)
  i32chain  : the round-2 default bf16 body (i32 mask/shift + f32→bf16 casts)
  i16dot    : 2 u8 ANDs + u8→i16 casts + TWO i16×i16→i32 dots (if Mosaic
              admits i16 MXU operands — halves operand bytes vs bf16)

Findings go to PERF.md; the winning body graduates into quant_matmul.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lit_llama_ja_tpu.utils.profiling import sync

SHAPES = [  # (K, N, count) per 7B layer
    (4096, 12288, 1),
    (4096, 4096, 1),
    (4096, 11008, 2),
    (11008, 4096, 1),
]


def body_onecast(w8, xe, xo):
    wv = w8.astype(jnp.int16).astype(jnp.bfloat16)
    return jnp.dot(xe, wv, preferred_element_type=jnp.float32)


def body_onedot(w8, xe, xo):
    lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int16).astype(jnp.bfloat16)
    _hi_mask = w8 & jnp.uint8(0xF0)  # mask cost without its cast/dot
    return jnp.dot(xe, lo, preferred_element_type=jnp.float32) + (
        _hi_mask[0, 0].astype(jnp.float32)
    )


def body_twodot(w8, xe, xo):
    lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int16).astype(jnp.bfloat16)
    h16 = (w8 & jnp.uint8(0xF0)).astype(jnp.int16).astype(jnp.bfloat16)
    return jnp.dot(xe, lo, preferred_element_type=jnp.float32) + jnp.dot(
        xo * jnp.bfloat16(0.0625), h16, preferred_element_type=jnp.float32
    )


def body_i32chain(w8, xe, xo):
    w32 = w8.astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.float32).astype(jnp.bfloat16)
    return jnp.dot(xe, lo, preferred_element_type=jnp.float32) + jnp.dot(
        xo, hi, preferred_element_type=jnp.float32
    )


def body_i16dot(w8, xe, xo):
    lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int16)
    h16 = (w8 & jnp.uint8(0xF0)).astype(jnp.int16)
    xq_e = jnp.round(xe.astype(jnp.float32) * 127.0).astype(jnp.int16)
    xq_o = jnp.round(xo.astype(jnp.float32) * 127.0).astype(jnp.int16)
    d = jnp.dot(xq_e, lo, preferred_element_type=jnp.int32) + jnp.dot(
        xq_o, h16, preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32) * (1.0 / 127.0)


def body_i8dot_hoist(w8, xe, xo):
    # activations arrive already int8-valued (rounded outside); only the two
    # weight ANDs + casts + dots remain in-kernel — isolates the in-kernel
    # activation-quant cost of the production int8dot_bias variant
    lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int8)
    hi = (w8 & jnp.uint8(0xF0)).astype(jnp.int8)
    xq_e = xe.astype(jnp.int8)
    xq_o = xo.astype(jnp.int8)
    d = jnp.dot(xq_e, lo, preferred_element_type=jnp.int32) + jnp.dot(
        xq_o, hi, preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32) * (1.0 / 127.0)


def body_i8dot(w8, xe, xo):
    lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int8)
    hi8 = (w8 & jnp.uint8(0xF0)).astype(jnp.int16).astype(jnp.int8)  # bogus math
    xq_e = jnp.round(xe.astype(jnp.float32) * 127.0).astype(jnp.int8)
    xq_o = jnp.round(xo.astype(jnp.float32) * 127.0).astype(jnp.int8)
    d = jnp.dot(xq_e, lo, preferred_element_type=jnp.int32) + jnp.dot(
        xq_o, hi8, preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32) * (1.0 / 127.0)


def body_i8dot_noand(w8, xe, xo):
    # ONE u8→i8 cast, no ANDs, TWO dots on the same converted tile (wrong
    # math): isolates the two ANDs' cost vs i8dot_hoist
    wv = w8.astype(jnp.int8)
    xq_e = xe.astype(jnp.int8)
    xq_o = xo.astype(jnp.int8)
    d = jnp.dot(xq_e, wv, preferred_element_type=jnp.int32) + jnp.dot(
        xq_o, wv, preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32) * (1.0 / 127.0)


def body_i8dot_1dot(w8, xe, xo):
    # ONE cast + ONE int8 dot (1 value/byte through the MXU): the int8-kernel
    # workload at int4 byte width with int8 operands
    wv = w8.astype(jnp.int8)
    xq_e = xe.astype(jnp.int8)
    d = jnp.dot(xq_e, wv, preferred_element_type=jnp.int32)
    return d.astype(jnp.float32) * (1.0 / 127.0)


# "mxu*" bodies run with a CONSTANT w block (index map ignores k): the tile is
# DMA'd once and revisited, so NO HBM weight streaming happens — these measure
# the pure VPU-cast + MXU-ingest pipeline at GEMV M. The reported "GB/s packed"
# is the EQUIVALENT packed-byte rate for comparability with the DMA probes.
def body_mxu2dot(w8, xe, xo):
    return body_i8dot_noand(w8, xe, xo)


def body_mxu1dot(w8, xe, xo):
    return body_i8dot_1dot(w8, xe, xo)


def body_i8dot_bc(w8, xe, xo):
    # the int8dot_bias unpack with BITCASTS instead of u8→i8 casts (exact:
    # lo < 128 bitcasts to itself; hi's wrap IS the wanted 16·(q_hi − 8))
    from jax import lax
    lo = lax.bitcast_convert_type(w8 & jnp.uint8(0x0F), jnp.int8)
    hi = lax.bitcast_convert_type(w8 & jnp.uint8(0xF0), jnp.int8)
    xq_e = xe.astype(jnp.int8)
    xq_o = xo.astype(jnp.int8)
    d = jnp.dot(xq_e, lo, preferred_element_type=jnp.int32) + jnp.dot(
        xq_o, hi, preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32) * (1.0 / 127.0)


def body_mxu2dot_bc(w8, xe, xo):
    return body_i8dot_bc(w8, xe, xo)


def body_mxu2dot_bf16(w8, xe, xo):
    # bf16-operand ingest ceiling (2 bytes/value through the MXU), no DMA
    wv = w8.astype(jnp.int16).astype(jnp.bfloat16)
    return jnp.dot(xe, wv, preferred_element_type=jnp.float32) + jnp.dot(
        xo, wv, preferred_element_type=jnp.float32
    )


BODIES = {
    "onecast": body_onecast,
    "onedot": body_onedot,
    "twodot": body_twodot,
    "i32chain": body_i32chain,
    "i16dot": body_i16dot,
    "i8dot": body_i8dot,
    "i8dot_hoist": body_i8dot_hoist,
    "i8dot_noand": body_i8dot_noand,
    "i8dot_1dot": body_i8dot_1dot,
    "i8dot_bc": body_i8dot_bc,
    "mxu2dot_bc": body_mxu2dot_bc,
    "mxu2dot": body_mxu2dot,
    "mxu1dot": body_mxu1dot,
    "mxu2dot_bf16": body_mxu2dot_bf16,
}


def make_qmm(body, bk=512, bn=4096, const_w=False):
    def kernel(xe_ref, xo_ref, w_ref, o_ref, acc_ref, *, n_k):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] = acc_ref[:] + body(
            w_ref[:], xe_ref[:].astype(jnp.bfloat16), xo_ref[:].astype(jnp.bfloat16)
        )

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:]

    @functools.partial(jax.jit, static_argnames=())
    def qmm(x, qweight):
        Khalf, N = qweight.shape
        M = x.shape[0]
        bm = 8
        xr = x.reshape(M, Khalf, 2)
        xe = jnp.pad(xr[:, :, 0], ((0, bm - M), (0, 0))).astype(jnp.bfloat16)
        xo = jnp.pad(xr[:, :, 1], ((0, bm - M), (0, 0))).astype(jnp.bfloat16)
        bn_ = min(bn, N)
        bk_ = bk
        while Khalf % bk_:
            bk_ //= 2
        n_k = Khalf // bk_
        grid = (1, pl.cdiv(N, bn_), n_k)
        return pl.pallas_call(
            functools.partial(kernel, n_k=n_k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk_), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, bk_), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bk_, bn_),
                    (lambda i, j, k: (0, j)) if const_w else (lambda i, j, k: (k, j)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((bm, bn_), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn_), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * bm * Khalf * 2 * N,
                bytes_accessed=Khalf * N,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(xe, xo, qweight)

    return qmm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=str, default=",".join(BODIES))
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--bk", type=int, default=512)
    ap.add_argument("--bn", type=int, default=4096)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    weights = []
    for i, (K, N, count) in enumerate(SHAPES):
        for c in range(count):
            weights.append(
                jax.random.randint(
                    jax.random.fold_in(key, i * 4 + c), (K // 2, N), 0, 255, jnp.int32
                ).astype(jnp.uint8)
            )
    total_bytes = sum(w.size for w in weights) * args.layers
    x0 = jnp.ones((1, 4096), jnp.bfloat16)

    for name in args.bodies.split(","):
        qmm = make_qmm(
            BODIES[name], bk=args.bk, bn=args.bn, const_w=name.startswith("mxu")
        )

        def one_pass(x):
            outs = []
            shapes_flat = [
                (K, N) for (K, N, count) in SHAPES for _ in range(count)
            ]
            for (K, N), w in zip(shapes_flat, weights):
                xin = x if K == 4096 else jnp.tile(x, (1, K // 4096 + 1))[:, :K]
                outs.append(qmm(xin, w))
            return sum(o[:1, :1].sum() for o in outs)

        @jax.jit
        def f(x):
            def body_fn(c, _):
                return (one_pass(x * (1 + c * 1e-9)) * 1e-20).astype(jnp.bfloat16), ()

            c, _ = jax.lax.scan(body_fn, jnp.bfloat16(0.0), None, length=args.layers)
            return c

        try:
            sync(f(x0))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(x0)
        sync(out)
        t = (time.perf_counter() - t0) / args.iters
        print(
            f"{name:10s}: {t*1e3:7.2f} ms/pass ({total_bytes / t / 1e9:6.1f} GB/s packed stream)",
            flush=True,
        )


if __name__ == "__main__":
    main()
