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

    # NOTE on the unpack variants: "bf16" was round-2's fastest float-operand
    # unpack (315 GB/s at (bk 512, bn 4096) 7B GEMV shapes); "arith" (mul/floor
    # nibble split, f32 planes) measured 210 GB/s and "f32dot" OOMs VMEM at wide
    # tiles — f32 unpacked planes double VMEM traffic and halve VPU lanes.
    # "arith_bf16" (the split at bf16 lane rate) never finishes compiling on
    # this Mosaic toolchain (bf16 floor pathology). "int8dot" (round 3) skips
    # float conversion of the weights entirely: nibbles zero-centered to int8,
    # activations dynamically quantized per (row, k-group) to int8 in-kernel,
    # int8×int8→int32 MXU dot — W4A8 numerics (~1e-3 relative activation
    # rounding), selectable per call; decode defaults to it (see
    # quant_matmul_int4). All variants stay selectable for future toolchains
    # (tools/bench_gemv_sweep.py --unpack).
    if unpack == "int8dot_u8":
        # mask/shift directly on uint8 vregs (packed-lane rate, no i32
        # expansion of the weight tile anywhere); nibbles 0..15 fit int8 as-is
        # so no zero-centering is needed (zshift=0 below).
        # NOTE: sub-32-bit SHIFTS do not compile on this Mosaic toolchain
        # (probe: /tmp-style op sweep, round 3) — this variant is kept for
        # future toolchains; "bf16_u8" below is the shift-free formulation.
        w8 = w_ref[:]
        lo = (w8 & jnp.uint8(0xF)).astype(jnp.int8)
        hi = (w8 >> jnp.uint8(4)).astype(jnp.int8)
        w32 = None
    elif unpack == "int8dot_and":
        # The production W4A8 unpack (round-3 probe winner direction,
        # tools/bench_unpack_probe.py): int8 MXU operands halve VMEM→MXU
        # operand traffic vs bf16 and measured FASTER than even a one-dot
        # bf16 probe. lo extracts with a single uint8 AND (packed-lane rate,
        # no expansion); hi needs the one i32 shift this toolchain admits
        # (sub-32-bit shifts crash Mosaic; u8→i8 wrap of (w&0xF0) is wrong).
        w8 = w_ref[:]
        lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int8)
        hi = (w8.astype(jnp.int32) >> 4).astype(jnp.int8)
        w32 = None
    elif unpack == "bf16_u8":
        # Shift-free narrow-width unpack (round 3; the fastest formulation the
        # toolchain admits). Per byte: two uint8 ANDs (packed-lane rate) and
        # u8→i16→bf16 casts — no i32 lane expansion, no shift, no f32 plane.
        #   lo  = b & 0x0F            (exact in bf16)
        #   h16 = b & 0xF0 = 16·hi    (0..240, exact in bf16)
        # The missing /16 moves to the tiny activation side: the odd rows are
        # pre-scaled by 1/16 (exact, power of two) before their dot, so
        # x_odd/16 @ h16 == x_odd @ hi. The zero correction is unchanged (it
        # uses the unscaled activation row-sums).
        w8 = w_ref[:]
        lo = (w8 & jnp.uint8(0x0F)).astype(jnp.int16).astype(jnp.bfloat16)
        hi = (w8 & jnp.uint8(0xF0)).astype(jnp.int16).astype(jnp.bfloat16)
        w32 = None
    else:
        w32 = w_ref[:].astype(jnp.int32)
    if unpack in ("int8dot_u8", "int8dot_and", "bf16_u8"):
        pass
    elif unpack == "int8dot":
        # zero-center: q' = q - 8 ∈ [-8, 7] fits int8; the asymmetric zero
        # correction shifts to (z - 8) on the accumulator (see loop below).
        lo = ((w32 & 0xF) - 8).astype(jnp.int8)
        hi = ((w32 >> 4) - 8).astype(jnp.int8)
    elif unpack == "arith_bf16":
        # nibble split in bf16 (2x VPU lane rate vs i32/f32): exact, since
        # bf16 represents 0..255 integers and the mul/floor/sub chain stays
        # on exact values (0.0625 is a power of two).
        c = w32.astype(jnp.float32).astype(jnp.bfloat16)
        hi = jnp.floor(c * jnp.bfloat16(0.0625))
        lo = c - hi * jnp.bfloat16(16.0)
    elif unpack == "arith":
        # single int→f32 cast; nibble split via mul/floor on the VPU
        c = w32.astype(jnp.float32)
        hi = jnp.floor(c * 0.0625)
        lo = c - hi * 16.0
    elif unpack == "f32dot":
        # skip the bf16 narrowing casts; MXU takes f32 operands (fine at
        # GEMV M — the matmul is nowhere near compute-bound)
        lo = (w32 & 0xF).astype(jnp.float32)
        hi = (w32 >> 4).astype(jnp.float32)
    else:
        lo = (w32 & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
        hi = (w32 >> 4).astype(jnp.float32).astype(jnp.bfloat16)

    bk = lo.shape[0]
    xdt = lo.dtype  # match operand dtypes for the MXU dot
    sub = bk // groups_per_tile  # packed rows per scale group within this tile
    part_sum = jnp.zeros_like(acc_ref)
    for g in range(groups_per_tile):
        sl = slice(g * sub, (g + 1) * sub)
        gi = k * groups_per_tile + g  # global group row (s/z passed whole)
        s_row = s_ref[pl.ds(gi, 1), :]
        z_row = z_ref[pl.ds(gi, 1), :]
        if unpack in ("int8dot", "int8dot_u8", "int8dot_and"):
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
            part_i = jnp.dot(
                xq_e, lo[sl], preferred_element_type=jnp.int32
            ) + jnp.dot(xq_o, hi[sl], preferred_element_type=jnp.int32)
            sxq = (
                jnp.sum(xq_e.astype(jnp.int32), axis=1, keepdims=True)
                + jnp.sum(xq_o.astype(jnp.int32), axis=1, keepdims=True)
            ).astype(jnp.float32)
            zshift = 8.0 if unpack == "int8dot" else 0.0
            part = (part_i.astype(jnp.float32) - sxq * (z_row - zshift)) * (
                s_row / rsx
            )
        else:
            xe_g = xe_ref[:, sl].astype(xdt)
            xo_g = xo_ref[:, sl].astype(xdt)
            # bf16_u8 stores 16·hi; fold the 1/16 into the (tiny) odd
            # activation rows so the weight plane needs no per-element scaling
            xo_dot = xo_g * xdt.type(0.0625) if unpack == "bf16_u8" else xo_g
            part = jnp.dot(
                xe_g, lo[sl], preferred_element_type=jnp.float32
            ) + jnp.dot(xo_dot, hi[sl], preferred_element_type=jnp.float32)
            sx_col = (
                jnp.sum(xe_g.astype(jnp.float32), axis=1, keepdims=True)
                + jnp.sum(xo_g.astype(jnp.float32), axis=1, keepdims=True)
            )
            part = (part - sx_col * z_row) * s_row
        part_sum = part_sum + part
    acc_ref[:] = acc_ref[:] + part_sum

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm8_kernel(
    x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
    *, n_k, groups_per_tile, signed,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
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
        x_g = x_ref[:, sl]
        part = jnp.dot(x_g, wq[sl], preferred_element_type=jnp.float32)
        s_row = s_ref[pl.ds(gi, 1), :]
        z_row = z_ref[pl.ds(gi, 1), :]
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
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret", "unpack"),
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
    # "bf16" | "f32dot" | "arith" | "arith_bf16" | "int8dot" (see _qmm4_kernel)
    unpack: str = "bf16",
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
    if block_n is None:
        block_n = 4096 if M <= 64 else 512
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
    out = pl.pallas_call(
        functools.partial(
            _qmm4_kernel, n_k=n_k, groups_per_tile=gpt, unpack=unpack
        ),
        grid=grid,
        interpret=interpret,
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
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
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
    if block_n is None:
        block_n = 2048 if M <= 64 else 512
    if block_k is None:
        block_k = 512 if M <= 64 else 2048
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
            _qmm8_kernel, n_k=n_k, groups_per_tile=gpt, signed=signed
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
