"""Pallas fused dequant+matmul kernels for sub-4-bit weights (INT3 / INT2).

The round-4 measured-limit proof (PERF.md) showed the int4 decode kernel at
92-96% of what this toolchain streams at GEMV geometry — single-stream decode
beyond ~80 tok/s needs FEWER HBM BYTES, not a faster kernel. These kernels cut
the streamed weight bytes to 3/8 (int3) and 1/4 (int2) of bf16-equivalent int4.

Same architecture as `quant_matmul.py` (plane-split activations, zero-point as
rank-1 correction, 3-D (m, n, k) grid with an f32 VMEM accumulator), extended
to the sub-4-bit pack formats of `quant/linear.py`:

  * **INT2** (`pack_int2`): byte packs K-rows ``4r+j`` at bits ``2j``; planes
    extract with one uint8 AND each — ``(w & (0x3 << 2j)).astype(int8)`` is
    ``4^j · q_j`` for fields 0-2, and the bias-2-stored top field BITCASTS to
    ``64·(q3 − 2)`` exactly. The ``4^-j`` normalizations are f32 scalars on
    the per-group accumulator (sub-32-bit shifts don't compile on this Mosaic
    toolchain; the int4 kernel's biased-high-nibble trick, generalized).
  * **INT3** (`pack_int3`): ``q = q2 + 4·hi`` — the int2 machinery for the low
    bits plus a (K//8, N) bit-plane for the high bit: ``(whi & (1 << i))`` is
    ``2^i · b_i`` as int8 for ``i < 7`` and ``−128·b_7`` bitcast for the top
    bit; eight masked dots whose ``±2^-i`` weights again fold into f32
    scalars. 12 small MXU dots per (k-tile, group) total — the dots are
    nowhere near the bound at GEMV M; HBM streaming of the two packed arrays
    is (measured per-variant in PERF.md round 5).

Unpack variants mirror the int4 kernel: ``"int8dot"`` (decode default —
weights decoded exactly, activations int8-rounded per (row, k-group): W3A8 /
W2A8) and ``"bf16"`` (exact float path, prefill default).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lit_llama_ja_tpu.ops.pallas.quant_matmul import _plan_tiles, _round_up


def _planes_int2(w8, bc=False):
    """Extract the four 2-bit fields of an int2-packed byte tile as int8
    tiles holding ``q0, 4·q1, 16·q2, 64·(q3 − 2)`` (see `pack_int2`).

    ``bc``: use same-width BITCASTS instead of u8→i8 converts everywhere —
    exact for fields 0-2 too since their masked values are < 128 (the round-3
    probe harness showed converts cost real VPU time; the top field's mod-256
    wrap IS the wanted signed value either way)."""
    cast = (
        (lambda t: jax.lax.bitcast_convert_type(t, jnp.int8))
        if bc
        else (lambda t: t.astype(jnp.int8))
    )
    p0 = cast(w8 & jnp.uint8(0x03))
    p1 = cast(w8 & jnp.uint8(0x0C))
    p2 = cast(w8 & jnp.uint8(0x30))
    p3 = jax.lax.bitcast_convert_type(w8 & jnp.uint8(0xC0), jnp.int8)
    return p0, p1, p2, p3


def _planes_hi(w8, bc=False):
    """Extract the eight 1-bit fields of a bit-plane byte tile as int8 tiles
    holding ``2^i · b_i`` (``i < 7``) and ``−128·b_7`` (see `pack_int3`)."""
    cast = (
        (lambda t: jax.lax.bitcast_convert_type(t, jnp.int8))
        if bc
        else (lambda t: t.astype(jnp.int8))
    )
    ps = [cast(w8 & jnp.uint8(1 << i)) for i in range(7)]
    ps.append(jax.lax.bitcast_convert_type(w8 & jnp.uint8(0x80), jnp.int8))
    return ps

# f32 weights recovering Σ x q2 from the four plane dots (plane 3's bias-2
# adds +2·Σx3 separately) and Σ x hi from the eight bit-plane dots
_C2 = (1.0, 0.25, 0.0625, 1.0 / 64.0)
_CHI = tuple(1.0 / (1 << i) for i in range(7)) + (-1.0 / 128.0,)


def _qmm_sub4_kernel(
    *refs, n_k, groups_per_tile, bits, unpack,
):
    """One (bm, bn) output tile, accumulated over the k grid axis.

    refs (int3): x0..x3 (bm, 2·bk8), xh0..xh7 (bm, bk8), w2 (2·bk8, bn) u8,
    whi (bk8, bn) u8, s, z (n_rows, bn) f32, out (bm, bn), acc scratch.
    refs (int2): x0..x3 (bm, bk4), w2 (bk4, bn) u8, s, z, out, acc.
    """
    if bits == 3:
        x_refs = refs[0:4]
        xh_refs = refs[4:12]
        w2_ref, whi_ref, s_ref, z_ref, o_ref, acc_ref = refs[12:]
    else:
        x_refs = refs[0:4]
        xh_refs = ()
        w2_ref, s_ref, z_ref, o_ref, acc_ref = refs[4:]

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if unpack == "bf16_groupdeq":
        # Grouped-scale fast path (round 5): the per-group loop below issues
        # groups_per_tile tiny-K MXU dots per plane (K = groupsize/4 rows —
        # measured 55 tok/s at 7B g64 vs 97 groupless). Here the scale/zero
        # rows are expanded along the packed-row axis instead, the planes are
        # dequantized elementwise in registers, and each plane gets ONE
        # full-tile bf16 dot: w_j = (q_j − z)·s = p_j·(c_j·s) [+ 2s for the
        # bias-2 top field] − z·s, with p_j the stored plane units.
        assert bits == 2, "groupdeq path is int2-only (int3 not recommended)"
        planes2 = _planes_int2(w2_ref[:], bc=True)
        bk2 = planes2[0].shape[0]
        sub2 = bk2 // groups_per_tile
        # multi-row sublane slices must be provably 8-aligned for Mosaic; a
        # single k-tile can slice statically (any gpt, e.g. the 125M's 13),
        # multi-tile grids require gpt % 8 == 0 (the wrapper gates on this)
        gsl = (
            slice(0, groups_per_tile)
            if n_k == 1
            else pl.ds(k * groups_per_tile, groups_per_tile)
        )
        s_t = s_ref[gsl, :]
        zs_t = z_ref[gsl, :] * s_t
        s_exp = jnp.repeat(s_t, sub2, axis=0)  # (bk2, bn) f32
        zs_exp = jnp.repeat(zs_t, sub2, axis=0)
        part = jnp.zeros_like(acc_ref)
        for j in range(4):
            pf = planes2[j].astype(jnp.int32).astype(jnp.float32)
            wd = pf * (s_exp * _C2[j]) - zs_exp
            if j == 3:
                wd = wd + 2.0 * s_exp  # stored top field is (q3 − 2)
            part = part + jnp.dot(
                x_refs[j][:].astype(jnp.bfloat16),
                wd.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = acc_ref[:] + part

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

        return

    bc = unpack == "int8dot_bc"
    if unpack == "int8dot_fused":
        # Single-dot-per-array variant: every plane in units of 4 centered at
        # −2, i.e. 4·(q_j − 2) and 4·b_i, so the plane dots collapse into ONE
        # int8 MXU dot per packed array over a row-concatenated operand (12
        # dots/group → 2). This Mosaic has no sub-32-bit mul/shift/add, so the
        # unit normalization takes the i32 detour (expand, shift, narrow —
        # i32→i8 casts are supported), trading VPU width for dot invocations;
        # same trade as the int4 kernel's "int8dot_fused".
        w32 = w2_ref[:].astype(jnp.int32)
        planes2 = tuple(
            ((((w32 >> (2 * j)) & 3) - 2) << 2).astype(jnp.int8)
            for j in range(3)
        ) + (
            # stored top field IS (q3 − 2) mod 4: re-center via ((s+2)&3)−2
            (((((w32 >> 6) & 3) + 2 & 3) - 2) << 2).astype(jnp.int8),
        )
        if bits == 3:
            h32 = whi_ref[:].astype(jnp.int32)
            planes_hi = tuple(
                (((h32 >> i) & 1) << 2).astype(jnp.int8) for i in range(8)
            )
        else:
            planes_hi = ()
    elif unpack == "int8dot_diag_noand":
        # DIAGNOSTIC ONLY (wrong math): skip plane extraction to measure its
        # cost — raw byte tile reused as every "plane"
        w_raw = jax.lax.bitcast_convert_type(w2_ref[:], jnp.int8)
        planes2 = (w_raw, w_raw, w_raw, w_raw)
        planes_hi = ()
        if bits == 3:
            h_raw = jax.lax.bitcast_convert_type(whi_ref[:], jnp.int8)
            planes_hi = (h_raw,) * 8
    else:
        planes2 = _planes_int2(w2_ref[:], bc=bc)
        planes_hi = _planes_hi(whi_ref[:], bc=bc) if bits == 3 else ()

    bk2 = planes2[0].shape[0]  # packed int2 rows in this tile
    sub2 = bk2 // groups_per_tile
    sub8 = sub2 // 2  # bit-plane rows per group (int3 only)
    part_sum = jnp.zeros_like(acc_ref)
    for g in range(groups_per_tile):
        sl2 = slice(g * sub2, (g + 1) * sub2)
        sl8 = slice(g * sub8, (g + 1) * sub8)
        gi = k * groups_per_tile + g
        s_row = s_ref[pl.ds(gi, 1), :]
        z_row = z_ref[pl.ds(gi, 1), :]
        if unpack in ("int8dot", "int8dot_bc", "int8dot_fused",
                      "int8dot_diag_noand"):
            # shared per-(row, group) activation scale across every plane
            # slice — the x_j partition covers the whole group, so its absmax
            # bounds the xh_i re-partition of the same rows too
            xf = [r[:, sl2].astype(jnp.float32) for r in x_refs]
            amax = xf[0]
            amax = jnp.abs(amax)
            for t in xf[1:]:
                amax = jnp.maximum(amax, jnp.abs(t))
            amax = jnp.max(amax, axis=1, keepdims=True)
            rsx = 127.0 / jnp.maximum(amax, 1e-30)
            xq = [jnp.round(t * rsx).astype(jnp.int8) for t in xf]
            sx = [
                jnp.sum(t.astype(jnp.int32), axis=1, keepdims=True).astype(
                    jnp.float32
                )
                for t in xq
            ]
            sx_tot = sx[0] + sx[1] + sx[2] + sx[3]
            if unpack == "int8dot_fused":
                # one dot per packed array: Σ x̂·4(q_j − 2) over the stacked
                # operand, so Σ x̂ q2 = d2/4 + 2·sx_tot; the hi dot directly
                # yields Σ x̂·4·hi (= the hi term of q)
                xcat = jnp.concatenate(xq, axis=1)
                wcat = jnp.concatenate(
                    [planes2[j][sl2] for j in range(4)], axis=0
                )
                d2 = jnp.dot(xcat, wcat, preferred_element_type=jnp.int32)
                part = d2.astype(jnp.float32) * 0.25 + 2.0 * sx_tot
                if bits == 3:
                    xh_q = [
                        jnp.round(
                            r[:, sl8].astype(jnp.float32) * rsx
                        ).astype(jnp.int8)
                        for r in xh_refs
                    ]
                    whcat = jnp.concatenate(
                        [planes_hi[i][sl8] for i in range(8)], axis=0
                    )
                    dh = jnp.dot(
                        jnp.concatenate(xh_q, axis=1), whcat,
                        preferred_element_type=jnp.int32,
                    )
                    part = part + dh.astype(jnp.float32)
            else:
                part = jnp.zeros_like(part_sum)
                for j in range(4):
                    d = jnp.dot(
                        xq[j], planes2[j][sl2], preferred_element_type=jnp.int32
                    )
                    part = part + d.astype(jnp.float32) * _C2[j]
                part = part + 2.0 * sx[3]  # un-bias plane 3 (stored q3 − 2)
                if bits == 3:
                    for i in range(8):
                        xh_f = xh_refs[i][:, sl8].astype(jnp.float32)
                        xh_q = jnp.round(xh_f * rsx).astype(jnp.int8)
                        d = jnp.dot(
                            xh_q, planes_hi[i][sl8],
                            preferred_element_type=jnp.int32,
                        )
                        part = part + d.astype(jnp.float32) * (4.0 * _CHI[i])
            part = (part - sx_tot * z_row) * (s_row / rsx)
        else:  # exact bf16 path
            xb = [r[:, sl2].astype(jnp.bfloat16) for r in x_refs]
            part = jnp.zeros_like(part_sum)
            for j in range(4):
                pj = planes2[j]
                if j == 3:
                    # bitcast plane: i8 → i16 → bf16 casts
                    pw = pj[sl2].astype(jnp.int16).astype(jnp.bfloat16)
                else:
                    pw = pj[sl2].astype(jnp.int16).astype(jnp.bfloat16)
                xs = xb[j] * jnp.bfloat16(_C2[j]) if j else xb[j]
                part = part + jnp.dot(
                    xs, pw, preferred_element_type=jnp.float32
                )
            sx = [
                jnp.sum(t.astype(jnp.float32), axis=1, keepdims=True)
                for t in xb
            ]
            sx_tot = sx[0] + sx[1] + sx[2] + sx[3]
            part = part + 2.0 * sx[3]
            if bits == 3:
                for i in range(8):
                    xh = xh_refs[i][:, sl8].astype(jnp.bfloat16)
                    pw = (
                        planes_hi[i][sl8].astype(jnp.int16).astype(jnp.bfloat16)
                    )
                    xs = xh * jnp.bfloat16(4.0 * _CHI[i])
                    part = part + jnp.dot(
                        xs, pw, preferred_element_type=jnp.float32
                    )
            part = (part - sx_tot * z_row) * s_row
        part_sum = part_sum + part
    acc_ref[:] = acc_ref[:] + part_sum

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _common_tiling(M, N, n_groups, Kq_fine, block_n, block_k, default_bk):
    if block_n is None:
        # same policy as the int4 kernel (round-3 sweep): one full-width
        # n-tile at decode M kills per-n-tile requant + program overhead;
        # guarded by the scoped-VMEM limit at very wide N
        block_n = N if (M <= 8 and N <= 12288) else (4096 if M <= 64 else 512)
    if block_k is None:
        block_k = default_bk if M <= 64 else default_bk * 2
    bk, gpt = _plan_tiles(Kq_fine, n_groups, block_k)
    if bk % 128 != 0 and bk != Kq_fine:
        # The activation-part blocks (bm, bk)/(bm, 2·bk) need lane dims that
        # are multiples of 128 — or equal to the full array dim. When Kq has
        # no suitable 128-multiple divisor (e.g. the 7B 11008-wide MLP:
        # 11008/8 = 1376 = 2^5·43), run a single k-tile: every block then
        # equals its array dim, which Mosaic exempts from the alignment rule.
        bk, gpt = Kq_fine, n_groups
    return min(block_n, N), bk, gpt


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_m", "block_n", "block_k", "out_dtype", "interpret", "unpack",
        "vmem_limit_mb",
    ),
)
def quant_matmul_int3(
    x: jax.Array,  # (..., K)
    qweight: jax.Array,  # (K//4, N) uint8 — int2-packed low bits
    qweight_hi: jax.Array,  # (K//8, N) uint8 — high-bit plane
    scales: jax.Array,  # (n_groups, N)
    zeros: jax.Array,  # (n_groups, N)
    *,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,  # bit-plane (K//8) rows per k-tile
    out_dtype=None,
    interpret: bool = False,
    unpack: Optional[str] = None,  # None = auto: "int8dot" decode, "bf16" prefill
    vmem_limit_mb: Optional[int] = None,
):
    """Fused int3 dequant matmul: ``x @ dequant(qweight, qweight_hi)``.

    ``qweight``/``qweight_hi`` cover ``sub4_pad_rows(K)`` input rows (zero
    levels beyond K — see `quant/linear.py`); the matching activation lanes
    are zero-padded here, so padded rows contribute exactly nothing while
    every shape keeps a 128-aligned multi-tile k-grid."""
    orig_shape = x.shape
    K = x.shape[-1]
    Kq8, N = qweight_hi.shape
    Kp = Kq8 * 8
    assert qweight.shape[0] * 4 == Kp and 0 <= Kp - K < 2048
    n_groups = scales.shape[0]
    out_dtype = out_dtype or x.dtype

    x2 = x.reshape(-1, K)
    if Kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
        K = Kp
    M = x2.shape[0]
    if vmem_limit_mb is None:
        vmem_limit_mb = 64 if M <= 64 else None
    if unpack is None:
        # round-5 sweep (PERF.md): bitcast plane casts + bk8=128 measured best
        # (9.32 ms vs 9.70 for int8dot/bk8=256 on the 7B GEMV pass)
        unpack = "int8dot_bc" if M <= 64 else "bf16"
    bn, bk8, gpt = _common_tiling(M, N, n_groups, Kq8, block_n, block_k, 128)
    n_k = Kq8 // bk8
    bm = min(block_m, _round_up(M, 8))

    xr = x2.reshape(M, Kq8, 8)
    x_parts = [
        x2.reshape(M, K // 4, 4)[:, :, j].astype(jnp.bfloat16) for j in range(4)
    ]
    xh_parts = [xr[:, :, i].astype(jnp.bfloat16) for i in range(8)]

    eff_groups = n_k * gpt
    if eff_groups != n_groups:
        s_tiled = jnp.repeat(scales, n_k // n_groups, axis=0)
        z_tiled = jnp.repeat(zeros, n_k // n_groups, axis=0)
    else:
        s_tiled, z_tiled = scales, zeros

    Mp = _round_up(M, bm)
    if Mp != M:
        x_parts = [jnp.pad(t, ((0, Mp - M), (0, 0))) for t in x_parts]
        xh_parts = [jnp.pad(t, ((0, Mp - M), (0, 0))) for t in xh_parts]

    n_rows = s_tiled.shape[0]
    grid = (Mp // bm, pl.cdiv(N, bn), n_k)
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )
    in_specs = (
        [
            pl.BlockSpec((bm, 2 * bk8), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ]
        + [
            pl.BlockSpec((bm, bk8), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ]
        + [
            pl.BlockSpec((2 * bk8, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk8, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        functools.partial(
            _qmm_sub4_kernel, n_k=n_k, groups_per_tile=gpt, bits=3,
            unpack=unpack,
        ),
        grid=grid,
        interpret=interpret,
        compiler_params=compiler_params,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(K // 4) * N + Kq8 * N + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
    )(
        *x_parts, *xh_parts, qweight, qweight_hi,
        s_tiled.astype(jnp.float32), z_tiled.astype(jnp.float32),
    )
    return out[:M].reshape(*orig_shape[:-1], N)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_m", "block_n", "block_k", "out_dtype", "interpret", "unpack",
        "vmem_limit_mb",
    ),
)
def quant_matmul_int2(
    x: jax.Array,  # (..., K)
    qweight: jax.Array,  # (K//4, N) uint8
    scales: jax.Array,  # (n_groups, N)
    zeros: jax.Array,  # (n_groups, N)
    *,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,  # packed (K//4) rows per k-tile
    out_dtype=None,
    interpret: bool = False,
    unpack: Optional[str] = None,
    vmem_limit_mb: Optional[int] = None,
):
    """Fused int2 dequant matmul: ``x @ dequant(qweight)`` (padded-K contract
    as `quant_matmul_int3`)."""
    orig_shape = x.shape
    K = x.shape[-1]
    Kq4, N = qweight.shape
    Kp = Kq4 * 4
    assert 0 <= Kp - K < 2048
    n_groups = scales.shape[0]
    out_dtype = out_dtype or x.dtype

    x2 = x.reshape(-1, K)
    if Kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
        K = Kp
    M = x2.shape[0]
    if vmem_limit_mb is None:
        vmem_limit_mb = 64 if M <= 64 else None
    bn, bk4, gpt = _common_tiling(M, N, n_groups, Kq4, block_n, block_k, 256)
    if unpack is None:
        # round-5 sweep (PERF.md): 6.52 ms/7B-GEMV-pass at bk4=256+bitcast vs
        # 6.86 for int8dot/bk4=512 (int4 kernel: 8.85 — int2 wins 26%).
        # Grouped packs (gpt > 1, e.g. g64) take the full-tile dequant path:
        # the per-group loop's tiny-K dots measured 55 tok/s at 7B vs 97
        # groupless; groupdeq restores full-width MXU dots under groups.
        if gpt > 1 and (Kq4 // bk4 == 1 or gpt % 8 == 0):
            unpack = "bf16_groupdeq"
        else:
            unpack = "int8dot_bc" if M <= 64 else "bf16"
    n_k = Kq4 // bk4
    bm = min(block_m, _round_up(M, 8))

    x_parts = [
        x2.reshape(M, Kq4, 4)[:, :, j].astype(jnp.bfloat16) for j in range(4)
    ]

    eff_groups = n_k * gpt
    if eff_groups != n_groups:
        s_tiled = jnp.repeat(scales, n_k // n_groups, axis=0)
        z_tiled = jnp.repeat(zeros, n_k // n_groups, axis=0)
    else:
        s_tiled, z_tiled = scales, zeros

    Mp = _round_up(M, bm)
    if Mp != M:
        x_parts = [jnp.pad(t, ((0, Mp - M), (0, 0))) for t in x_parts]

    n_rows = s_tiled.shape[0]
    grid = (Mp // bm, pl.cdiv(N, bn), n_k)
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        )
    in_specs = [
        pl.BlockSpec((bm, bk4), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
        for _ in range(4)
    ] + [
        pl.BlockSpec((bk4, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_rows, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_rows, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(
            _qmm_sub4_kernel, n_k=n_k, groups_per_tile=gpt, bits=2,
            unpack=unpack,
        ),
        grid=grid,
        interpret=interpret,
        compiler_params=compiler_params,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Kq4 * N + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
    )(
        *x_parts, qweight,
        s_tiled.astype(jnp.float32), z_tiled.astype(jnp.float32),
    )
    return out[:M].reshape(*orig_shape[:-1], N)
