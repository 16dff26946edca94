"""Sequence-parallel full-sequence forward: long-context prefill / evaluation with
activations and attention sharded over the sequence axis of a mesh.

This wires `sp_attention.sequence_parallel_attention` into a complete model forward:
token embeddings, per-layer blocks and logits all compute on sequence shards; only
attention gathers k/v across the axis. The O(T²) score term and the O(T·D)
activations both shard — contexts n× longer than one device's memory allows fit a
mesh of n devices.

Capability delta vs the reference: lit-llama hard-caps T at block_size=2048 and
notes quality collapse beyond it (`evaluate/full.py:117`); here the *mechanical*
context ceiling scales with the mesh (the RoPE table extends to the requested
length — position extrapolation quality is the model's own affair).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import apply_linear
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import apply_rope, build_rope_cache
from lit_llama_ja_tpu.parallel.sp_attention import sequence_parallel_attention


def forward_sp(
    params,
    idx: jax.Array,  # (B, T), T divisible by the axis size
    config: LLaMAConfig,
    mesh: Mesh,
    axis: str = "tp",
    attn_impl: str = "allgather",
) -> jax.Array:
    """Full-sequence forward with sequence-parallel attention.

    Semantically identical to `models.llama.forward` (same weights, same math) but
    T may exceed ``config.block_size`` — the RoPE table is built out to T — and
    every attention shards its score matrix over ``axis``. ``attn_impl="ring"``
    streams k/v blocks around the ring (O(T/n) per-device attention memory)
    instead of all-gathering them.

    Params handed in resident on a *different* mesh (e.g. a dp×fsdp×tp training
    mesh) are first `device_put` onto this mesh's specs — a plain ICI copy.
    Doing it outside jit matters: letting the SPMD partitioner reconcile
    foreign shardings inside the compiled forward triggers "involuntary full
    rematerialization" (replicate-then-repartition) on the embedding gather,
    every call (observed in the round-2 multichip dryrun).
    """
    from lit_llama_ja_tpu.parallel.specs import param_shardings

    shardings = param_shardings(params, mesh)

    def _foreign(leaf, want):
        s = getattr(leaf, "sharding", None)
        return s is None or getattr(s, "mesh", None) != want.mesh

    if any(jax.tree.leaves(jax.tree.map(_foreign, params, shardings))):
        params = jax.device_put(params, shardings)
    return _forward_sp_jit(params, idx, config, mesh, axis, attn_impl)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _forward_sp_jit(
    params,
    idx: jax.Array,
    config: LLaMAConfig,
    mesh: Mesh,
    axis: str = "tp",
    attn_impl: str = "allgather",
) -> jax.Array:
    B, T = idx.shape
    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} must divide over the '{axis}' axis ({n})"
    rope = build_rope_cache(
        max(T, config.block_size), config.head_dim, config.rope_base
    )[:T]
    seq_sharding = NamedSharding(mesh, P(None, axis))
    idx = jax.lax.with_sharding_constraint(idx, seq_sharding)
    x = params["wte"]["weight"][idx]
    nh, hd = config.n_head, config.head_dim

    def body(x, block_params):
        h = rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps)
        qkv = apply_linear(block_params["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope(q.reshape(B, T, nh, hd), rope).transpose(0, 2, 1, 3)
        k = apply_rope(k.reshape(B, T, nh, hd), rope).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        y = sequence_parallel_attention(q, k, v, mesh, axis=axis, impl=attn_impl)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, config.n_embd)
        x = x + apply_linear(block_params["attn"]["c_proj"], y)
        h2 = rmsnorm(x, block_params["rms_2"]["scale"], config.norm_eps)
        mlp = jax.nn.silu(
            apply_linear(block_params["mlp"]["c_fc1"], h2)
        ) * apply_linear(block_params["mlp"]["c_fc2"], h2)
        x = x + apply_linear(block_params["mlp"]["c_proj"], mlp)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = rmsnorm(x, params["ln_f"]["scale"], config.norm_eps)
    return apply_linear(params["lm_head"], x)
