"""Blockwise GPTQ calibration pipeline (reference `quantize/gptq.py:37-148`).

Sequential-by-construction, exactly like the reference: each linear's input Hessian is
collected with all *previously quantized* submodules active, so later layers calibrate
against the quantized network they will actually run in.

TPU-native redesign: the reference's forward hooks + per-block CPU<->GPU offload
(`quantize/gptq.py:72-127`) become explicit **activation-capture functions** (pure,
jitted once per submodule kind) + per-layer indexing into the stacked param tree —
no host offload needed since activations stream through in micro-batches and only one
layer's Hessian (K², fp32) is live at a time.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import _qkv, apply_linear
from lit_llama_ja_tpu.ops.attention import causal_attention
from lit_llama_ja_tpu.ops.norms import rmsnorm
from lit_llama_ja_tpu.ops.rope import build_rope_cache
from lit_llama_ja_tpu.quant.gptq import gptq_quantize_linear, hessian_update, init_hessian

SUBMODULES = ("attn.c_attn", "attn.c_proj", "mlp.c_fc1", "mlp.c_fc2", "mlp.c_proj")


@partial(jax.jit, static_argnames=("config", "name"))
def capture_linear_input(block_params, x, rope, config: LLaMAConfig, name: str):
    """Return the activations feeding linear ``name`` inside one transformer block,
    given the block's *current* (possibly partially quantized) parameters."""
    h1 = rmsnorm(x, block_params["rms_1"]["scale"], config.norm_eps)
    if name == "attn.c_attn":
        return h1
    B, T, C = x.shape
    q, k, v = _qkv(block_params["attn"], h1, config.n_head, rope)
    y = causal_attention(q, k, v).transpose(0, 2, 1, 3).reshape(B, T, C)
    if name == "attn.c_proj":
        return y
    x2 = x + apply_linear(block_params["attn"]["c_proj"], y)
    h2 = rmsnorm(x2, block_params["rms_2"]["scale"], config.norm_eps)
    if name in ("mlp.c_fc1", "mlp.c_fc2"):
        return h2
    h = jax.nn.silu(apply_linear(block_params["mlp"]["c_fc1"], h2)) * apply_linear(
        block_params["mlp"]["c_fc2"], h2
    )
    assert name == "mlp.c_proj"
    return h


@partial(jax.jit, static_argnames=("config",))
def block_forward(block_params, x, rope, config: LLaMAConfig):
    from lit_llama_ja_tpu.models.llama import transformer_block

    out, _ = transformer_block(block_params, x, rope, config)
    return out


def _get(tree, dotted: str):
    node = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def _set(tree, dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def gptq_quantize_model(
    params,
    config: LLaMAConfig,
    calib_tokens,  # (n_samples, T) int32
    *,
    bits=4,  # int, or mixed-mode {"attn","mlp","head"} dict
    groupsize: int = -1,
    blocksize: int = 128,
    percdamp: float = 0.01,
    micro_batch: int = 8,
    compute_dtype=jnp.float32,
    quantize_lm_head: bool = True,
    progress: bool = True,
):
    """Quantize every Linear of the model with GPTQ; returns a new param tree where
    each ``{"weight"}`` linear leaf-dict becomes ``{"qweight","scales","zeros"}``.

    actorder is enabled iff the (per-projection) groupsize == -1, matching
    `quantize/gptq.py:86`.

    ``bits`` is an int (uniform) or a mixed-mode dict ``{"attn","mlp","head"}``
    mapping projection type -> bit width (`quant/linear.py::parse_quant_mode`);
    in mixed mode ``groupsize`` applies only to the sub-4-bit projections.
    """
    from lit_llama_ja_tpu.quant.linear import resolve_bits, resolve_groupsize

    n_samples, T = calib_tokens.shape
    rope = build_rope_cache(config.block_size, config.head_dim, config.rope_base)[:T]

    # token embedding -> first block inputs (reference quantize/gptq.py:49-52)
    inps = params["wte"]["weight"][calib_tokens].astype(compute_dtype)

    L = config.n_layer
    quantized_layers = []

    def solve(w, H, *, name: str):
        gs = resolve_groupsize(bits, name, groupsize)
        return gptq_quantize_linear(
            w, H,
            bits=resolve_bits(bits, name),
            blocksize=blocksize,
            percdamp=percdamp,
            groupsize=gs,
            actorder=gs == -1,
        )

    for l in range(L):
        # unstack layer l from the stacked tree into a mutable per-layer dict
        block = jax.tree.map(lambda a: a[l], params["blocks"])
        block = jax.tree.map(lambda a: a, block)  # shallow copy leaves
        block = _to_mutable(block)

        for name in SUBMODULES:
            w = _get(block, name)["weight"]  # (K, N)
            H, n = init_hessian(w.shape[0])
            for s in range(0, n_samples, micro_batch):
                xs = inps[s : s + micro_batch]
                acts = capture_linear_input(block, xs, rope, config, name)
                H, n = hessian_update(H, n, acts.reshape(-1, acts.shape[-1]))
            qparams, err = solve(w.astype(jnp.float32), H, name=name)
            _set(block, name, dict(qparams))
            if progress:
                print(f"layer {l} {name}: gptq error {float(err):.3f}")

        # re-forward through the fully quantized block -> next layer's inputs
        outs = []
        for s in range(0, n_samples, micro_batch):
            outs.append(block_forward(block, inps[s : s + micro_batch], rope, config))
        inps = jnp.concatenate(outs, axis=0)
        quantized_layers.append(block)

    new_blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *quantized_layers)

    new_params = dict(params)
    new_params["blocks"] = new_blocks

    if quantize_lm_head:
        # final norm, then lm_head (reference quantize/gptq.py:129-148)
        h = rmsnorm(inps, params["ln_f"]["scale"], config.norm_eps)
        w = params["lm_head"]["weight"]
        H, n = init_hessian(w.shape[0])
        for s in range(0, n_samples, micro_batch):
            H, n = hessian_update(H, n, h[s : s + micro_batch].reshape(-1, h.shape[-1]))
        qparams, err = solve(w.astype(jnp.float32), H, name="lm_head")
        if progress:
            print(f"lm_head: gptq error {float(err):.3f}")
        new_params["lm_head"] = dict(qparams)

    return new_params


def int8_quantize_model(params, quantize_lm_head: bool = True, outliers=True):
    """LLM.int8-style weight-only quantization of all Linears (no calibration needed,
    reference `quantize/gptq.py:170` note).

    ``outliers=True`` (default) keeps the ~0.5% scale-setting input channels
    in bf16 and int8-quantizes the bulk against the reduced scales — a static,
    weight-derived outlier set (`quant/linear.quantize_int8_outlier`);
    ``outliers="dynamic"`` (round 5) is the faithful bnb `Linear8bitLt`
    semantics: plain int8 weights plus PER-FORWARD threshold-6.0 activation
    outlier decomposition (`quant/linear.quantize_int8_dynamic`);
    ``outliers=False`` is plain round-to-nearest absmax per channel."""
    from lit_llama_ja_tpu.quant.linear import (
        quantize_int8_absmax,
        quantize_int8_dynamic,
        quantize_int8_outlier,
    )

    if outliers == "dynamic":
        qfn = lambda w: jax.vmap(quantize_int8_dynamic)(w) if w.ndim == 3 \
            else quantize_int8_dynamic(w)
    elif outliers:
        qfn = lambda w: jax.vmap(quantize_int8_outlier)(w) if w.ndim == 3 \
            else quantize_int8_outlier(w)
    else:
        qfn = quantize_int8_absmax

    new = jax.tree.map(lambda a: a, params)
    new = _to_mutable(new)
    for name in SUBMODULES:
        leaf = _get(new["blocks"], name)
        leaf_q = qfn(leaf["weight"])
        _set(new["blocks"], name, {k: v for k, v in leaf_q.items()})
    if quantize_lm_head:
        new["lm_head"] = dict(qfn(new["lm_head"]["weight"]))
    return new


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
