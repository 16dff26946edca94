"""Collective dequant-matmul: weight shards stream around the mesh while each
hop's dequant-matmul computes — the BASELINE north-star "all-gather overlapped
with dequant-matmul" expressed as a shard_map ring.

Why it exists: a model whose quantized weights exceed one device's HBM must
shard them (fsdp-style) for STORAGE; every forward then has to move the
missing shards in. The naive order — all-gather int4 weights, dequantize,
matmul — serializes the interconnect behind the MXU and materializes the full
bf16 weight (4x the int4 bytes) on every device. The ring formulation fixes
both:

  * weights travel at int4/int8 width, one shard per hop (`ppermute`), and
    XLA's async collectives let hop ``i+1``'s transfer fly while hop ``i``'s
    dequant-matmul computes (the latency-hiding scheduler reorders the
    point-to-point sends ahead of the dependent compute);
  * each device dequantizes only the (K/n, N/n) tile it is about to feed the
    MXU — the full bf16 weight never exists anywhere.

Work split: storage is K-sharded (each device owns K/n rows of the packed
weight and the matching scale/zero rows); compute is N-split (device ``d``
accumulates output columns ``[d·N/n, (d+1)·N/n)`` over all n hops), so FLOPs
parallelize n-way and the only activation collective is the final
``all_gather`` of (M, N/n) outputs.

Per-device traffic: (n−1)/n of the int4 weight bytes (same volume as an
all-gather, but pipelined) + the (M, N/n) output gather. Compute per device:
1/n of the matmul. Single-chip degenerates to the plain fused kernel.

Correctness is validated on the simulated CPU mesh
(`tests/test_collective_matmul.py`); the overlap itself needs a real
multi-chip slice to measure (ROADMAP item 1).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lit_llama_ja_tpu.quant.linear import quant_matmul


def ring_quant_matmul(
    x: jax.Array,  # (..., K) replicated activations
    qparams: Dict[str, jax.Array],  # {"qweight","scales","zeros"} FULL arrays
    mesh: Mesh,
    axis: str = "fsdp",
) -> jax.Array:
    """``x @ dequant(qparams)`` with the weight K-sharded over ``axis``.

    ``qparams`` is the full (unsharded) tree — jit/shard_map places each
    device's K-rows; callers holding pre-sharded arrays get the same program.
    Requires K, N, and (if grouped) n_tiles divisible by the axis size.
    """
    n = int(mesh.shape[axis])
    qw, s, z = qparams["qweight"], qparams["scales"], qparams["zeros"]
    Kq, N = qw.shape
    n_tiles = s.shape[0]
    assert Kq % n == 0 and N % n == 0, (Kq, N, n)
    grouped = n_tiles > 1
    if grouped:
        assert n_tiles % n == 0, (n_tiles, n)
    sz_spec = P(axis, None) if grouped else P(None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), sz_spec, sz_spec),
        out_specs=P(),
        check_vma=False,
    )
    def inner(x, qw, s, z):
        d = jax.lax.axis_index(axis)
        Kq_loc = qw.shape[0]
        # packed rows -> activation rows (int4 packs 2/byte, int8 1/byte)
        k_per_shard = Kq_loc * (x.shape[-1] // (Kq_loc * n))
        n_loc = N // n
        x2 = x.reshape(-1, x.shape[-1])
        y = jnp.zeros((x2.shape[0], n_loc), jnp.float32)
        perm = [(j, (j - 1) % n) for j in range(n)]
        buf = (qw, s, z)
        for i in range(n):
            k_idx = (d + i) % n  # K-shard currently held
            xs = jax.lax.dynamic_slice_in_dim(
                x2, k_idx * k_per_shard, k_per_shard, axis=1
            )
            qw_i, s_i, z_i = buf
            wn = jax.lax.dynamic_slice_in_dim(qw_i, d * n_loc, n_loc, axis=1)
            sn = jax.lax.dynamic_slice_in_dim(s_i, d * n_loc, n_loc, axis=1)
            zn = jax.lax.dynamic_slice_in_dim(z_i, d * n_loc, n_loc, axis=1)
            part = quant_matmul(xs, {"qweight": wn, "scales": sn, "zeros": zn})
            y = y + part.astype(jnp.float32)
            if i < n - 1:
                # rotate the weight shard to the left neighbor; XLA's async
                # collectives overlap this hop with the next dequant-matmul
                buf = jax.lax.ppermute(buf, axis, perm) if grouped else (
                    jax.lax.ppermute(qw_i, axis, perm), s_i, z_i
                )
        y = jax.lax.all_gather(y, axis, axis=1, tiled=True)  # (M, N)
        return y.astype(x.dtype).reshape(*x.shape[:-1], N)

    return inner(x, qw, s, z)
