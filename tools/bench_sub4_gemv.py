"""Sub-4-bit (int3/int2) decode-GEMV kernel: on-chip parity + tiling sweep.

Same harness discipline as tools/bench_gemv_sweep.py: one "pass" = the five
per-layer 7B decode matmuls, scanned `--layers` times in-jit; weights stream
from HBM every iteration; compare ratios within this harness only.

`--parity` first checks the kernel against the XLA dequant path ON THE CHIP
(the interpret-mode tests cover semantics; this covers the Mosaic lowering).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.ops.pallas.quant_matmul_sub4 import (
    quant_matmul_int2,
    quant_matmul_int3,
)
from lit_llama_ja_tpu.quant.linear import (
    dequantize_with_k,
    quantize_colblock,
    sub4_pad_rows,
)
from lit_llama_ja_tpu.utils.profiling import sync

SHAPES = [  # (K, N, count) per 7B layer
    (4096, 12288, 1),
    (4096, 4096, 1),
    (4096, 11008, 2),
    (11008, 4096, 1),
]


def synth(key, K, N, groups, bits):
    k1, k2, k3 = jax.random.split(key, 3)
    d = {
        "scales": jax.random.uniform(k2, (groups, N), jnp.float32, 0.001, 0.01),
        "zeros": jnp.round(
            jax.random.uniform(k3, (groups, N), jnp.float32, 0.0, 2 ** bits - 1)
        ),
    }
    Kp = sub4_pad_rows(K)
    d["qweight"] = jax.random.randint(
        k1, (Kp // 4, N), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    if bits == 3:
        d["qweight_hi"] = jax.random.randint(
            jax.random.fold_in(k1, 1), (Kp // 8, N), 0, 255, jnp.int32
        ).astype(jnp.uint8)
    return d


def run_kernel(bits, x, params, **kw):
    if bits == 3:
        return quant_matmul_int3(
            x, params["qweight"], params["qweight_hi"], params["scales"],
            params["zeros"], **kw,
        )
    return quant_matmul_int2(
        x, params["qweight"], params["scales"], params["zeros"], **kw,
    )


def parity(bits, unpack):
    rng = np.random.default_rng(0)
    K, N, M = 4096, 4096, 8
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    params = quantize_colblock(jnp.asarray(w), bits, tile_cols=-1)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32) * 0.3)
    want = np.asarray(x @ dequantize_with_k(params, K, dtype=jnp.float32))
    got = np.asarray(
        run_kernel(bits, x, params, unpack=unpack, out_dtype=jnp.float32)
    )
    err = np.abs(got - want)
    rel = err.max() / (np.abs(want).max() + 1e-9)
    print(f"parity bits={bits} unpack={unpack}: max_abs={err.max():.3e} "
          f"rel_to_peak={rel:.3e}", flush=True)
    tol = 1e-2 if unpack == "bf16" else 5e-2
    assert rel < tol, (bits, unpack, rel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=3, choices=(2, 3))
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--unpack", type=str, default="int8dot")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--configs", type=str, default="")
    args = ap.parse_args()

    if args.parity:
        for u in ("bf16", "int8dot"):
            parity(args.bits, u)

    key = jax.random.PRNGKey(0)
    weights = []
    shapes_flat = []
    for i, (K, N, count) in enumerate(SHAPES):
        for c in range(count):
            shapes_flat.append((K, N))
            weights.append(
                synth(jax.random.fold_in(key, i * 4 + c), K, N, args.groups,
                      args.bits)
            )

    qbytes = sum(
        sum(int(np.prod(v.shape)) for kk, v in w.items() if kk.startswith("qweight"))
        for w in weights
    )
    total_bytes = qbytes * args.layers
    x0 = jnp.ones((args.m, 4096), jnp.bfloat16)

    import ast
    configs = ast.literal_eval(args.configs) if args.configs else [
        None,  # kernel auto-tiling
        (-1, 128), (-1, 256), (-1, 512),
        (4096, 256), (4096, 512),
    ]
    for cfg in configs:
        kw = {"unpack": args.unpack}
        label = "auto"
        if cfg is not None:
            bn, bk = cfg
            kw.update(block_n=(None if bn == -1 else bn), block_k=bk)
            label = f"bn={bn} bk={bk}"

        def one_pass(x, ws=tuple(range(len(weights))), kw=dict(kw)):
            outs = []
            for (K, N), wi in zip(shapes_flat, ws):
                xin = x if K == 4096 else jnp.tile(x, (1, K // 4096 + 1))[:, :K]
                outs.append(
                    run_kernel(args.bits, xin, weights[wi], block_m=8, **kw)
                )
            return sum(o[:, :1].sum() for o in outs)

        @jax.jit
        def f(x):
            def body(c, _):
                r = one_pass(x * (1 + c * 1e-9))
                return r * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=args.layers)
            return c

        try:
            sync(f(x0))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(x0)
        sync(out)
        t = (time.perf_counter() - t0) / args.iters
        gbps = total_bytes / t / 1e9
        print(
            f"{label}: {t*1e3:7.2f} ms/{args.layers}-layer pass "
            f"({gbps:6.1f} GB/s packed-weight stream)", flush=True,
        )


if __name__ == "__main__":
    main()
