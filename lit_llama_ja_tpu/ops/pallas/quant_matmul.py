"""Pallas fused dequant+matmul kernels (INT4 packed / INT8) for TPU.

Replaces the reference's Triton `linear_kernel_4bit_weight`
(`lit_llama/quantization.py:78-331`) and bitsandbytes int8 matmul — redesigned for
the MXU rather than translated:

  * **No nibble interleave.** The Triton kernel unpacks each packed byte into two
    adjacent K-rows in-kernel. Here the *activations* are split instead: with
    ``lo = packed & 0xF`` holding even K-rows and ``hi = packed >> 4`` odd K-rows,

        x @ W  ==  x_even @ dq(lo) + x_odd @ dq(hi)

    so the big weight tile feeds the MXU as two operands and only the tiny
    activation is rearranged (outside the kernel, fused by XLA).

  * **Zero-point as rank-1 correction.** ``Σ_k x_k (q_kn − z_n) s_n
    = s_n (Σ_k x_k q_kn − z_n Σ_k x_k)``: asymmetric dequant collapses to one
    multiply-subtract on the (bm, bn) accumulator per K-group — dequant cost is
    O(M·N·groups), not O(K·N); weights stream from HBM at int4/int8 width.

  * **3-D grid (m, n, k) + f32 VMEM scratch accumulator** — K is tiled so the
    in-kernel int32 nibble expansion only ever materializes a (bk, bn) tile
    (VMEM-bounded for any K; the first version's full-K stripe OOM'd at the
    11008-wide MLP shapes). Mosaic double-buffers the K-tile stream.

Grouped scales: scale groups must align with K-tiles (tile spans whole groups or
sits inside one group) — both layouts are handled by slicing the scales block per
in-tile group. fp32 accumulation throughout (the Triton kernel's fp32 accumulator).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _qmm4_kernel(
    xe_ref, xo_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
    *, n_k, groups_per_tile, unpack="bf16",
):
    """int4: one (bm, bn) output tile, accumulated over the k grid axis.

    Block shapes:
      xe/xo: (bm, bk) bf16 — even/odd K rows of x for this k-tile.
      w:     (bk, bn) uint8 packed.
      s, z:  (n_scale_rows, bn) f32 — all scale groups (sliced by group in-kernel).
      acc:   (bm, bn) f32 scratch, persistent across the k axis.

    The per-group x row-sums for the zero-point correction are computed in-kernel
    from the xe/xo slices (a (bm, sub) VPU reduction — cheaper than shipping them,
    and avoids dynamic lane-dim slicing which Mosaic cannot prove aligned).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Byte layout (see quant/linear.py::pack_int4): low nibble = plain even-row
    # level q_lo ∈ [0,15]; high nibble = odd-row level two's-complement biased,
    # (q_hi − 8) & 0xF — chosen so (byte & 0xF0).astype(int8) == 16·(q_hi − 8)
    # EXACTLY on-device, enabling a shift-free int8-operand unpack.
    #
    # Variant notes (all measured on v5e, tools/bench_gemv_sweep.py /
    # bench_unpack_probe.py, round 3):
    #   "int8dot_bias" — the decode default. Two uint8 ANDs + two u8→i8 casts
    #     per byte (no shift, no i32 expansion); int8×int8→int32 MXU dots
    #     (half the VMEM→MXU operand bytes of bf16); activations dynamically
    #     int8-quantized per (row, k-group) in-kernel → W4A8 numerics
    #     (~1e-3 relative activation rounding).
    #   "bf16" — exact-numerics float path (prefill default): i32 mask/shift
    #     + f32→bf16 casts, 315.7 GB/s at the 7B GEMV shapes.
    #   "bf16_u8" — exact shift-free float path (u8 ANDs + i16→bf16 casts),
    #     325.6 GB/s; the /16 of the biased-hi plane folds into the odd
    #     activation rows.
    #   "int8dot" — W4A8 with both nibbles centered via i32 ops, 296.5 GB/s.
    #   "arith"/"arith_bf16"/"f32dot" — round-1/2 historical variants (slow /
    #     OOM / Mosaic-hang respectively), kept for future toolchains.
    if unpack == "int8dot_bias":
        w8 = w_ref[:]
        lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int8)  # q_lo, plain
        hi = (w8 & jnp.uint8(0xF0)).astype(jnp.int8)  # 16·(q_hi − 8), exact
        w32 = None
    elif unpack == "int8dot_bias_bc":
        # Same values via same-width BITCASTS instead of u8→i8 converts
        # (lo < 128 reinterprets to itself; hi's mod-256 wrap IS the wanted
        # 16·(q_hi − 8)). Probe harness showed converts cost real VPU time
        # (tools/bench_unpack_probe.py i8dot_bc vs i8dot_hoist); A/B in the
        # production kernel via this variant.
        w8 = w_ref[:]
        lo = jax.lax.bitcast_convert_type(w8 & jnp.uint8(0x0F), jnp.int8)
        hi = jax.lax.bitcast_convert_type(w8 & jnp.uint8(0xF0), jnp.int8)
        w32 = None
    elif unpack == "int8dot_fused":
        # Single-dot variant (round 4): put BOTH planes in units of 16 centered
        # at zero, so the even/odd contributions accumulate in ONE int8 MXU dot
        # over a (2·bk, bn) operand. The low plane needs 16·(q_lo − 8) in int8;
        # this Mosaic has NO sub-32-bit mul/shift/add (all probe-crash), so the
        # only route is the i32 detour: expand, shift into the high-nibble
        # position, narrow back to i8 (i32→i8 casts are supported).
        w8 = w_ref[:]
        lo = (
            ((w8.astype(jnp.int32) & 0xF) - 8) << 4
        ).astype(jnp.int8)  # 16·(q_lo − 8) ∈ [−128, 112]: in-range, no wrap
        hi = (w8 & jnp.uint8(0xF0)).astype(jnp.int8)  # 16·(q_hi − 8)
        w32 = None
    elif unpack == "bf16_u8":
        w8 = w_ref[:]
        lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int16).astype(jnp.bfloat16)
        # 16·(q_hi − 8) needs the signed i8 read first (u8 read would give the
        # raw biased bits 0..240); i8→i16→bf16 are all supported casts.
        hi = (
            (w8 & jnp.uint8(0xF0)).astype(jnp.int8).astype(jnp.int16)
            .astype(jnp.bfloat16)
        )
        w32 = None
    else:
        w32 = w_ref[:].astype(jnp.int32)
    if unpack in ("int8dot_bias", "int8dot_bias_bc", "int8dot_fused", "bf16_u8"):
        pass
    elif unpack == "int8dot":
        # both nibbles zero-centered to [-8, 7] int8; the stored high nibble
        # IS (q_hi − 8) mod 16, so sign-extend it: v = ((n ^ 8) − 8)
        lo = ((w32 & 0xF) - 8).astype(jnp.int8)
        hi = ((((w32 >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
    elif unpack == "arith_bf16":
        # nibble split in bf16 (2x VPU lane rate vs i32/f32): exact, since
        # bf16 represents 0..255 integers and the mul/floor/sub chain stays
        # on exact values (0.0625 is a power of two).
        c = w32.astype(jnp.float32).astype(jnp.bfloat16)
        hb = jnp.floor(c * jnp.bfloat16(0.0625))  # stored biased nibble
        lo = c - hb * jnp.bfloat16(16.0)
        hi = jnp.where(hb >= 8, hb - 8, hb + 8)  # un-bias: (n + 8) mod 16
    elif unpack == "arith":
        # single int→f32 cast; nibble split via mul/floor on the VPU
        c = w32.astype(jnp.float32)
        hb = jnp.floor(c * 0.0625)
        lo = c - hb * 16.0
        hi = jnp.where(hb >= 8, hb - 8, hb + 8)
    elif unpack == "f32dot":
        # skip the bf16 narrowing casts; MXU takes f32 operands (fine at
        # GEMV M — the matmul is nowhere near compute-bound)
        lo = (w32 & 0xF).astype(jnp.float32)
        hi = (((w32 >> 4) + 8) & 0xF).astype(jnp.float32)
    else:
        lo = (w32 & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
        hi = ((((w32 >> 4) + 8) & 0xF)).astype(jnp.float32).astype(jnp.bfloat16)

    bk = lo.shape[0]
    xdt = lo.dtype  # match operand dtypes for the MXU dot
    sub = bk // groups_per_tile  # packed rows per scale group within this tile
    part_sum = jnp.zeros_like(acc_ref)
    for g in range(groups_per_tile):
        sl = slice(g * sub, (g + 1) * sub)
        gi = k * groups_per_tile + g  # global group row (s/z passed whole)
        s_row = s_ref[pl.ds(gi, 1), :]
        z_row = z_ref[pl.ds(gi, 1), :]
        if unpack in ("int8dot", "int8dot_bias", "int8dot_bias_bc", "int8dot_fused"):
            # Dynamic per-(row, group) activation int8 quantization. The whole
            # chain — absmax, round, the two int8 dots' correction — is
            # self-consistent: output == Σ x̂ (q − z) s with x̂ the int8-rounded
            # activation, so the only error vs exact dequant is activation
            # rounding (≤ amax/254 per element).
            xe_f = xe_ref[:, sl].astype(jnp.float32)
            xo_f = xo_ref[:, sl].astype(jnp.float32)
            amax = jnp.maximum(
                jnp.max(jnp.abs(xe_f), axis=1, keepdims=True),
                jnp.max(jnp.abs(xo_f), axis=1, keepdims=True),
            )
            rsx = 127.0 / jnp.maximum(amax, 1e-30)  # finite even for all-zero rows
            xq_e = jnp.round(xe_f * rsx).astype(jnp.int8)
            xq_o = jnp.round(xo_f * rsx).astype(jnp.int8)
            sxe = jnp.sum(xq_e.astype(jnp.int32), axis=1, keepdims=True).astype(
                jnp.float32
            )
            sxo = jnp.sum(xq_o.astype(jnp.int32), axis=1, keepdims=True).astype(
                jnp.float32
            )
            if unpack == "int8dot_fused":
                # both planes hold 16·(q − 8): one dot over the stacked
                # (2·sub, bn) operand, then
                #   Σ x̂(q − z)s = (D/16 − (sxe + sxo)(z − 8)) · s / rsx
                xq = jnp.concatenate([xq_e, xq_o], axis=1)
                wc = jnp.concatenate([lo[sl], hi[sl]], axis=0)
                d = jnp.dot(xq, wc, preferred_element_type=jnp.int32)
                part = (
                    d.astype(jnp.float32) * 0.0625
                    - (sxe + sxo) * (z_row - 8.0)
                ) * (s_row / rsx)
            elif unpack in ("int8dot_bias", "int8dot_bias_bc"):
                # lo holds q_lo (dot D_e), hi holds 16·(q_hi − 8) (dot D_o):
                #   Σ x̂e(q_lo − z)s + Σ x̂o(q_hi − z)s
                #     = (D_e + D_o/16 − (sxe + sxo)·z + 8·sxo) · s · sx
                d_e = jnp.dot(xq_e, lo[sl], preferred_element_type=jnp.int32)
                d_o = jnp.dot(xq_o, hi[sl], preferred_element_type=jnp.int32)
                part = (
                    d_e.astype(jnp.float32)
                    + d_o.astype(jnp.float32) * 0.0625
                    - (sxe + sxo) * z_row
                    + 8.0 * sxo
                ) * (s_row / rsx)
            else:
                # both nibbles centered by −8 → correction uses (z − 8)
                part_i = jnp.dot(
                    xq_e, lo[sl], preferred_element_type=jnp.int32
                ) + jnp.dot(xq_o, hi[sl], preferred_element_type=jnp.int32)
                part = (
                    part_i.astype(jnp.float32) - (sxe + sxo) * (z_row - 8.0)
                ) * (s_row / rsx)
        else:
            xe_g = xe_ref[:, sl].astype(xdt)
            xo_g = xo_ref[:, sl].astype(xdt)
            # bf16_u8 stores 16·(q_hi − 8); fold the 1/16 into the (tiny) odd
            # activation rows so the weight plane needs no per-element scaling
            xo_dot = xo_g * xdt.type(0.0625) if unpack == "bf16_u8" else xo_g
            part = jnp.dot(
                xe_g, lo[sl], preferred_element_type=jnp.float32
            ) + jnp.dot(xo_dot, hi[sl], preferred_element_type=jnp.float32)
            sxe = jnp.sum(xe_g.astype(jnp.float32), axis=1, keepdims=True)
            sxo = jnp.sum(xo_g.astype(jnp.float32), axis=1, keepdims=True)
            if unpack == "bf16_u8":
                # the hi dot yielded Σ xo (q_hi − 8): add the 8·Σxo back
                part = (part - (sxe + sxo) * z_row + 8.0 * sxo) * s_row
            else:
                part = (part - (sxe + sxo) * z_row) * s_row
        part_sum = part_sum + part
    acc_ref[:] = acc_ref[:] + part_sum

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm8_kernel(
    x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
    *, n_k, groups_per_tile, signed, unpack="bf16",
):
    """``unpack="int8dot"`` (decode default, round 3): feed the MXU the int8
    weights DIRECTLY — zero weight-side VPU ops for the signed/absmax scheme
    (the i8 tile is the dot operand as loaded), one u8 XOR for the asymmetric
    scheme (``(w ^ 0x80).astype(int8) == w − 128`` exactly; the −128 folds
    into the zero correction). Activations int8-quantized per (row, k-group)
    as in the int4 kernel (W8A8). "bf16" keeps the exact float path."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    if unpack == "int8dot":
        wq = w if signed else (w ^ jnp.uint8(0x80)).astype(jnp.int8)
        zshift = 0.0 if signed else 128.0
    else:
        wq = (
            w.astype(jnp.float32).astype(jnp.bfloat16)
            if signed
            else w.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        )
    bk = wq.shape[0]
    sub = bk // groups_per_tile
    part_sum = jnp.zeros_like(acc_ref)
    for g in range(groups_per_tile):
        sl = slice(g * sub, (g + 1) * sub)
        gi = k * groups_per_tile + g
        s_row = s_ref[pl.ds(gi, 1), :]
        z_row = z_ref[pl.ds(gi, 1), :]
        if unpack == "int8dot":
            x_f = x_ref[:, sl].astype(jnp.float32)
            amax = jnp.max(jnp.abs(x_f), axis=1, keepdims=True)
            rsx = 127.0 / jnp.maximum(amax, 1e-30)
            xq = jnp.round(x_f * rsx).astype(jnp.int8)
            part_i = jnp.dot(xq, wq[sl], preferred_element_type=jnp.int32)
            sx = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True).astype(
                jnp.float32
            )
            part = (part_i.astype(jnp.float32) - sx * (z_row - zshift)) * (
                s_row / rsx
            )
        else:
            x_g = x_ref[:, sl]
            part = jnp.dot(x_g, wq[sl], preferred_element_type=jnp.float32)
            sx_col = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
            part = (part - sx_col * z_row) * s_row
        part_sum = part_sum + part
    acc_ref[:] = acc_ref[:] + part_sum

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _plan_tiles(Kq: int, n_groups: int, block_k: int):
    """Choose a packed-K tile size such that every tile spans whole scale groups
    (or exactly one group slice). Returns (bk, groups_per_tile)."""
    gsize = Kq // n_groups  # packed rows per group
    if gsize >= block_k:
        # tile inside one group: make bk divide gsize
        bk = block_k
        while gsize % bk != 0:
            bk //= 2
        return max(bk, 8), 1
    # multiple groups per tile: bk = m * gsize
    m = max(block_k // gsize, 1)
    while Kq % (m * gsize) != 0 and m > 1:
        m -= 1
    return m * gsize, m


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_m", "block_n", "block_k", "out_dtype", "interpret", "unpack",
        "vmem_limit_mb",
    ),
)
def quant_matmul_int4(
    x: jax.Array,  # (..., K)
    qweight: jax.Array,  # (K//2, N) uint8
    scales: jax.Array,  # (n_groups, N)
    zeros: jax.Array,  # (n_groups, N)
    *,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,  # packed rows per k-tile
    out_dtype=None,
    interpret: bool = False,
    # None = auto: "int8dot_bias" for decode/GEMV (M ≤ 64; W4A8 — exact int4
    # weight decode, activations int8-rounded per k-group), "bf16" (exact)
    # for prefill. Explicit values: "bf16" | "bf16_u8" | "f32dot" | "arith" |
    # "arith_bf16" | "int8dot" | "int8dot_bias" (see _qmm4_kernel).
    unpack: Optional[str] = None,
    vmem_limit_mb: Optional[int] = None,  # None = auto (64 MB for decode M)
):
    """Fused int4 dequant matmul: ``x @ dequant(qweight)``.

    Default tiling is M-dependent: the decode/GEMV regime (small M) uses wide
    (512, 4096) k×n tiles — measured 19% faster weight streaming than the
    (1024, 512) tiles at 7B M=1 shapes (256.8 → 315.7 GB/s,
    `tools/bench_gemv_sweep.py`; narrow strided 512-byte row chunks under-use
    the HBM controller, `tools/bench_tile_read.py`). Large M keeps (1024, 512)
    (M=2048 prefill measured insensitive to tiling, ±4%, and wide-N tiles with
    a large bm would blow VMEM)."""
    orig_shape = x.shape
    K = x.shape[-1]
    Khalf, N = qweight.shape
    assert Khalf * 2 == K
    n_groups = scales.shape[0]
    out_dtype = out_dtype or x.dtype

    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if vmem_limit_mb is None:
        # Per-grid-iteration overhead is ~1-2 µs on this toolchain (round-4
        # probe: independent VPU/MXU chains overlap fine; iteration count is
        # what costs) — fewer, larger k-tiles win once the default 16 MB
        # scoped-VMEM limit is raised. Decode uses 64 MB (v5e VMEM is 128).
        vmem_limit_mb = 64 if M <= 64 else None
    if unpack is None:
        # decode/GEMV: W4A8 int8-operand unpack, measured 365 GB/s weight
        # stream vs 317 for the exact-bf16 unpack (tools/bench_gemv_sweep.py,
        # round 3); prefill keeps exact numerics (MXU-bound there anyway)
        unpack = "int8dot_bias" if M <= 64 else "bf16"
    if block_n is None:
        # decode: full-width n tiles (round-3 sweep: bn=N 364.7 GB/s vs
        # bn=4096 344.4 — one n-tile kills the per-n-tile activation requant
        # and program overhead; int8 operands keep VMEM in budget at bk=512).
        # Full width ONLY when it covers all of N in one tile: with an n-grid
        # the double-buffered 12288-wide tiles blow the 16M scoped-vmem limit
        # (measured: B=32 lm_head, and the 19M lm_head at tiny K). bk=1024 at
        # full width also OOMs.
        block_n = N if (M <= 8 and N <= 12288) else (4096 if M <= 64 else 512)
    if block_k is None:
        block_k = 512 if M <= 64 else 1024
    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, N)
    bk, gpt = _plan_tiles(Khalf, n_groups, block_k)
    n_k = Khalf // bk

    xr = x2.reshape(M, Khalf, 2)
    xe = xr[:, :, 0].astype(jnp.bfloat16)
    xo = xr[:, :, 1].astype(jnp.bfloat16)
    # per-tile group view: tile k covers groups [k*gpt, (k+1)*gpt); if tiles
    # subdivide a single group, repeat its scale row per tile (correction is
    # additive across tiles of the same group)
    eff_groups = n_k * gpt
    if eff_groups != n_groups:
        s_tiled = jnp.repeat(scales, n_k // n_groups, axis=0)
        z_tiled = jnp.repeat(zeros, n_k // n_groups, axis=0)
    else:
        s_tiled = scales
        z_tiled = zeros

    Mp = _round_up(M, bm)
    if Mp != M:
        xe = jnp.pad(xe, ((0, Mp - M), (0, 0)))
        xo = jnp.pad(xo, ((0, Mp - M), (0, 0)))

    n_tiles = s_tiled.shape[0]
    grid = (Mp // bm, pl.cdiv(N, bn), n_k)
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )
    out = pl.pallas_call(
        functools.partial(
            _qmm4_kernel, n_k=n_k, groups_per_tile=gpt, unpack=unpack
        ),
        grid=grid,
        interpret=interpret,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Khalf * N + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
    )(
        xe, xo, qweight,
        s_tiled.astype(jnp.float32), z_tiled.astype(jnp.float32),
    )
    return out[:M].reshape(*orig_shape[:-1], N)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_m", "block_n", "block_k", "out_dtype", "interpret", "unpack"
    ),
)
def quant_matmul_int8(
    x: jax.Array,
    qweight: jax.Array,  # (K, N) int8 (symmetric) or uint8 (asymmetric)
    scales: jax.Array,  # (n_groups, N)
    zeros: jax.Array,
    *,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    out_dtype=None,
    interpret: bool = False,
    # None = auto: "int8dot" (W8A8, weights are the MXU operand as loaded)
    # for decode/GEMV (M <= 64), "bf16" (exact) for prefill.
    unpack: Optional[str] = None,
):
    orig_shape = x.shape
    K = x.shape[-1]
    Kw, N = qweight.shape
    assert Kw == K
    n_groups = scales.shape[0]
    out_dtype = out_dtype or x.dtype
    signed = qweight.dtype == jnp.int8

    x2 = x.reshape(-1, K).astype(jnp.bfloat16)
    M = x2.shape[0]
    # M-dependent tiling like the int4 kernel: decode/GEMV streams fastest
    # with (bk 512, bn 2048) tiles (437.9 vs 407.5 GB/s at the 7B M=1 shapes,
    # tools/bench_gemv_sweep.py --bits 8); large M keeps the original tiles.
    if unpack is None:
        # the int8 kernel is HBM-bound either way (measured: "int8dot" W8A8
        # 476.1 GB/s vs exact bf16 484.1 at the decode tiling) — default to
        # exact numerics; "int8dot" stays selectable for future platforms
        unpack = "bf16"
    if block_n is None:
        # decode: full-width n tiles, same finding as the int4 kernel
        # (round 3: bn=N bk=256 484.1 GB/s vs round-2's (2048, 512) 437.9);
        # same single-n-tile + M ≤ 8 scoped-vmem guard as the int4 kernel
        block_n = N if (M <= 8 and N <= 12288) else (2048 if M <= 64 else 512)
    if block_k is None:
        block_k = 256 if M <= 64 else 2048
    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, N)
    bk, gpt = _plan_tiles(K, n_groups, block_k)
    n_k = K // bk

    eff_groups = n_k * gpt
    if eff_groups != n_groups:
        s_tiled = jnp.repeat(scales, n_k // n_groups, axis=0)
        z_tiled = jnp.repeat(zeros, n_k // n_groups, axis=0)
    else:
        s_tiled = scales
        z_tiled = zeros

    Mp = _round_up(M, bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))

    n_tiles = s_tiled.shape[0]
    grid = (Mp // bm, pl.cdiv(N, bn), n_k)
    out = pl.pallas_call(
        functools.partial(
            _qmm8_kernel, n_k=n_k, groups_per_tile=gpt, signed=signed,
            unpack=unpack
        ),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
    )(x2, qweight, s_tiled.astype(jnp.float32), z_tiled.astype(jnp.float32))
    return out[:M].reshape(*orig_shape[:-1], N)
