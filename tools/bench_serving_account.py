"""Byte-account the batched serving decode step (round-5 VERDICT item #2).

Round 4 left a contradiction: the int4 GEMV kernel streams ~365 GB/s
standalone, but the batch-8 engine ablation credited "matmuls-only" with
222 GB/s and called it a ceiling. This tool applies the decomposition
discipline of the single-stream proof (PERF.md round 4) to the BATCHED
two-dispatch step that sets the aggregate-serving headline:

  --mode gemm    The weight-matmul chain alone, outside the engine, at
                 M in {1, 8, 24}: per-layer weights either UNROLLED
                 (32 distinct arg arrays, like tools/bench_sub4_gemv.py)
                 or STACKED (one (L, K/2, N) leaf sliced by lax.scan —
                 exactly what the engine does). Isolates (a) kernel-vs-M
                 geometry and (b) the cost of scan-slicing stacked
                 weights into a Pallas custom call.

  --mode phases  The real `_paged_decode_read_and_sample` +
                 `commit_writes_jit` step at B=24/S=1024/int4-KV with
                 shape-preserving phase ablations (`_ablate` in
                 infer/paged.py): full, read-only, no_attn (matmuls in
                 situ), no_matmul (gather+attention in situ), skeleton
                 (dispatch+norms+rope+sampling floor). Each phase gets a
                 bytes-touched model and an achieved-GB/s column.

Harness discipline (hard-won, see PERF.md): sync via host transfer (axon's
block_until_ready lies), chain data dependence across steps, compare only
same-session numbers, pass big arrays as jit args (closure capture gets
constant-inlined by the remote compiler and can 413 the tunnel).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import synth_int4_params  # noqa: E402
from lit_llama_ja_tpu.core.config import LLaMAConfig  # noqa: E402
from lit_llama_ja_tpu.infer.paged import (  # noqa: E402
    _paged_decode_read_and_sample,
    commit_writes_jit,
    init_page_pool,
)
from lit_llama_ja_tpu.ops.pallas.quant_matmul import quant_matmul_int4  # noqa: E402
from lit_llama_ja_tpu.utils.profiling import sync  # noqa: E402

CONFIG = LLaMAConfig.from_name("7B")
# per-layer decode matmuls (K, N): c_attn, c_proj, c_fc1, c_fc2, mlp.c_proj
LAYER_SHAPES = [(4096, 12288), (4096, 4096), (4096, 11008), (4096, 11008),
                (11008, 4096)]
LAYER_WBYTES = sum(K * N // 2 for K, N in LAYER_SHAPES)  # int4 packed
LMHEAD_WBYTES = 4096 * CONFIG.padded_vocab_size // 2


# --------------------------------------------------------------------------
# mode gemm: the matmul chain alone, unrolled vs stacked, M sweep
# --------------------------------------------------------------------------

def synth_layer(key, K, N):
    return {
        "qweight": jax.random.randint(key, (K // 2, N), 0, 255, jnp.int32
                                      ).astype(jnp.uint8),
        "scales": jnp.full((1, N), 0.01, jnp.float32),
        "zeros": jnp.full((1, N), 7.0, jnp.float32),
    }


def run_gemm(layers: int, ms, iters: int):
    key = jax.random.PRNGKey(0)
    per_layer = [synth_layer(jax.random.fold_in(key, i), K, N)
                 for i, (K, N) in enumerate(LAYER_SHAPES)]
    stacked = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (layers, *a.shape)).copy(),
        per_layer,
    )
    total_bytes = LAYER_WBYTES * layers

    def chain_pass(x, weights):
        """One layer's five matmuls; output feeds the next layer (data dep)."""
        h = x
        for (K, N), w in zip(LAYER_SHAPES, weights):
            xin = h if K == 4096 else jnp.tile(h, (1, 3))[:, :K]
            o = quant_matmul_int4(xin, w["qweight"], w["scales"], w["zeros"])
            h = x + o[:, :4096] * 1e-9  # keep magnitude, keep dependence
        return h

    @jax.jit
    def unrolled(x, *ws):
        for i in range(layers):
            x = chain_pass(x, ws)
        return x

    @jax.jit
    def scanned(x, stacked):
        def body(h, layer_w):
            return chain_pass(h, layer_w), ()
        x, _ = jax.lax.scan(body, x, stacked)
        return x

    for M in ms:
        x0 = jnp.ones((M, 4096), jnp.bfloat16)
        for label, fn in (
            ("unrolled", lambda x: unrolled(x, *per_layer)),
            ("stacked-scan", lambda x: scanned(x, stacked)),
        ):
            # chained timing: each pass's output feeds the next one's input
            out = fn(x0)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(out.astype(jnp.bfloat16))
            sync(out)
            t = (time.perf_counter() - t0) / iters
            print(f"M={M:3d} {label:13s}: {t*1e3:7.2f} ms/{layers}-layer pass "
                  f"({total_bytes/t/1e9:6.1f} GB/s weight stream)", flush=True)


# --------------------------------------------------------------------------
# mode phases: the real step with ablations
# --------------------------------------------------------------------------

def run_phases(B, S, iters, chunk, quantized="int4"):
    page = 16
    AP = S // page
    params = synth_int4_params(CONFIG, jax.random.PRNGKey(0))
    pool = init_page_pool(CONFIG, B * AP + 1, page, quantized=quantized)
    tables = jnp.asarray(1 + np.arange(B * AP, dtype=np.int32).reshape(B, AP))
    pos = jnp.full((B,), S - iters - 2, jnp.int32)
    toks = jnp.ones((B,), jnp.int32)
    temps = jnp.zeros((B,), jnp.float32)
    key = jax.random.PRNGKey(0)

    L, nh, hd = CONFIG.n_layer, CONFIG.n_head, CONFIG.head_dim
    wbytes = L * LAYER_WBYTES + LMHEAD_WBYTES
    if quantized == "int4":
        per_tok = 2 * (nh // 2) * hd + 2 * nh * 4  # packed k+v + f32 scales
    elif quantized:
        per_tok = 2 * nh * hd + 2 * nh * 4
    else:
        per_tok = 2 * nh * hd * 2
    poolbytes = L * B * AP * page * per_tok

    def read_step(toks, pos, ablate):
        return _paged_decode_read_and_sample(
            params, toks, pos, tables, pool, key, temps, CONFIG, quantized,
            None, None, chunk, _ablate=ablate,
        )

    results = {}

    # full split step: read + commit. The commit donates the pool, so the
    # loop must hold exactly ONE live reference (the engine's pattern) — an
    # extra reference defeats donation and XLA copies the multi-GB pool every
    # step (measured: +76 ms/step the first time this harness got it wrong).
    fpool = init_page_pool(CONFIG, B * AP + 1, page, quantized=quantized)
    nxt, w_, pi, of = read_step(toks, pos, None)
    fpool = commit_writes_jit(fpool, w_, pi, of)
    sync(nxt)
    t0 = time.perf_counter()
    for i in range(iters):
        nxt, w_, pi, of = _paged_decode_read_and_sample(
            params, nxt, pos + 1 + i, tables, fpool, key, temps, CONFIG,
            quantized, None, None, chunk, _ablate=None,
        )
        fpool = commit_writes_jit(fpool, w_, pi, of)
    sync(fpool)  # account the last commit inside the timed window
    results["full(read+commit)"] = (time.perf_counter() - t0) / iters
    del fpool, w_, pi, of

    for ablate in (None, "no_attn", "no_matmul", "skeleton"):
        nxt, w_, pi, of = read_step(toks, pos, ablate)
        sync(nxt)
        t0 = time.perf_counter()
        for i in range(iters):
            nxt, w_, pi, of = read_step(nxt, pos + 1 + i, ablate)
        sync(nxt)
        results["read" if ablate is None else ablate] = (
            time.perf_counter() - t0) / iters

    t_skel = results["skeleton"]
    t_mm = results["no_attn"] - t_skel
    t_at = results["no_matmul"] - t_skel
    t_commit = results["full(read+commit)"] - results["read"]

    print(f"\n=== B={B} S={S} kv={quantized} chunk={chunk} ===")
    for k, v in results.items():
        print(f"{k:18s}: {v*1e3:7.2f} ms")
    print(f"\nphase model (bytes are one decode step):")
    rows = [
        ("weight matmuls", t_mm, wbytes),
        ("gather+attention", t_at, poolbytes),
        ("skeleton (norms/rope/sample/dispatch)", t_skel, None),
        ("commit", t_commit, None),
    ]
    for name, t, b in rows:
        gbps = f"{b/t/1e9:7.1f} GB/s of {b/1e9:5.2f} GB" if b and t > 0 \
            else ""
        print(f"{name:40s}: {t*1e3:7.2f} ms  {gbps}")
    t_sum = t_mm + t_at + t_skel + t_commit
    agg = B / results["full(read+commit)"]
    print(f"{'sum of phases':40s}: {t_sum*1e3:7.2f} ms "
          f"(full {results['full(read+commit)']*1e3:.2f} ms)")
    print(f"aggregate: {agg:.1f} tok/s")


def run_attn_sweep(B, S, iters, chunks, quantized="int4"):
    """The gather+attention phase alone (`no_matmul` ablation) across
    attn_chunk values — a clean signal the full-step sweeps blur with the
    other phases."""
    page = 16
    AP = S // page
    params = synth_int4_params(CONFIG, jax.random.PRNGKey(0))
    pool = init_page_pool(CONFIG, B * AP + 1, page, quantized=quantized)
    tables = jnp.asarray(1 + np.arange(B * AP, dtype=np.int32).reshape(B, AP))
    pos = jnp.full((B,), S - iters - 2, jnp.int32)
    toks = jnp.ones((B,), jnp.int32)
    temps = jnp.zeros((B,), jnp.float32)
    key = jax.random.PRNGKey(0)
    L, nh, hd = CONFIG.n_layer, CONFIG.n_head, CONFIG.head_dim
    per_tok = (2 * (nh // 2) * hd + 2 * nh * 4) if quantized == "int4" else (
        2 * nh * hd + 2 * nh * 4 if quantized else 2 * nh * hd * 2)
    poolbytes = L * B * AP * page * per_tok
    for chunk in chunks:
        try:
            nxt, *_ = _paged_decode_read_and_sample(
                params, toks, pos, tables, pool, key, temps, CONFIG,
                quantized, None, None, chunk, _ablate="no_matmul")
            sync(nxt)
            t0 = time.perf_counter()
            for i in range(iters):
                nxt, *_ = _paged_decode_read_and_sample(
                    params, nxt, pos + 1 + i, tables, pool, key, temps,
                    CONFIG, quantized, None, None, chunk, _ablate="no_matmul")
            sync(nxt)
        except Exception as e:
            print(f"chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        t = (time.perf_counter() - t0) / iters
        print(f"chunk={str(chunk):4s}: {t*1e3:7.2f} ms "
              f"({poolbytes/t/1e9:6.1f} GB/s of {poolbytes/1e9:.2f} GB pool)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="phases", choices=("phases", "gemm", "attn"))
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--chunks", default="none,2,3,4,6,8,12,24")
    ap.add_argument("--kv", default="int4")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--ms", default="1,8,24")
    args = ap.parse_args()
    kv = {"int4": "int4", "int8": True, "fp": False}[args.kv]
    if args.mode == "gemm":
        run_gemm(args.layers, [int(m) for m in args.ms.split(",")], args.iters)
    elif args.mode == "attn":
        chunks = [None if c in ("none", "None") else int(c)
                  for c in args.chunks.split(",")]
        run_attn_sweep(args.batch, args.seq, args.iters, chunks, kv)
    else:
        run_phases(args.batch, args.seq, args.iters, args.chunk, kv)


if __name__ == "__main__":
    main()
