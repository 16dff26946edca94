"""LoRA as a parameter-tree transform (reference `lit_llama/lora.py`).

The reference implements LoRA by swapping the attention class under a context manager
and giving `MergedLinear` stateful merge/unmerge on train/eval toggles
(`lit_llama/lora.py:447-476`, `:241-278`). Here LoRA is pure data:

  * `add_lora` injects ``lora_A`` / ``lora_B`` / ``lora_alpha`` leaves into the fused
    qkv linear's leaf-dict; `models/llama.apply_linear` adds the low-rank branch
    whenever those leaves are present. No classes, no mutation, jit-stable.
  * `merge_lora` / `unmerge_lora` are explicit pure functions returning new trees
    (the train/eval toggle of the reference made explicit).
  * `enable_lora=[True, False, True]` (q and v only, reference `lora.py:434`) maps to
    the grouped layout: ``lora_A (L, D, g*r)``, ``lora_B (L, g, r, D)`` with g = 2
    groups scattered into the q- and v-sections of the fused (3D)-wide output —
    the functional equivalent of the reference's grouped conv1d + `zero_pad`
    (`lora.py:203-239`, `:318-322`).

Shape glossary: L layers, D = n_embd, r rank, g = sum(enable_lora).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig

ENABLE_LORA_DEFAULT = (True, False, True)  # q, k, v (reference lora.py:434)


def init_lora_params(
    key: jax.Array,
    config: LLaMAConfig,
    r: int,
    alpha: float = 1.0,
    enable_lora: Sequence[bool] = ENABLE_LORA_DEFAULT,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """LoRA leaves for the fused qkv projection of every layer.

    A ~ Kaiming-uniform (reference `lora.py:199-201`: bound = sqrt(3)*sqrt(5-gain...)
    == uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kaiming_uniform(a=sqrt(5)));
    B = 0 so training starts at the pretrained function.
    """
    L, D = config.n_layer, config.n_embd
    g = sum(enable_lora)
    bound = 1.0 / math.sqrt(D)
    lora_A = jax.random.uniform(
        key, (L, D, g * r), dtype, minval=-bound, maxval=bound
    )
    lora_B = jnp.zeros((L, g, r, D), dtype)
    # alpha is stacked per-layer (L,) so every LoRA leaf scans over the layer axis
    return {
        "lora_A": lora_A,
        "lora_B": lora_B,
        "lora_alpha": jnp.full((L,), alpha, jnp.float32),
    }


def lora_branch(
    leaf: Dict[str, jax.Array],
    x: jax.Array,
    enable_lora: Sequence[bool] = ENABLE_LORA_DEFAULT,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """Low-rank update ``zero_pad(grouped(x @ A) @ B) * alpha / r`` (reference
    `lora.py:280-324` forward)."""
    A, B = leaf["lora_A"], leaf["lora_B"]
    g, r, out_per = B.shape
    scaling = leaf["lora_alpha"] / r
    xin = x
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
        xin = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    after_A = xin @ A.astype(x.dtype)  # (..., g*r)
    after_A = after_A.reshape(*after_A.shape[:-1], g, r)
    after_B = jnp.einsum("...gr,gro->...go", after_A, B.astype(x.dtype))
    # scatter the g group outputs into the enabled q/k/v sections (zero_pad)
    sections = []
    gi = 0
    for enabled in enable_lora:
        if enabled:
            sections.append(after_B[..., gi, :])
            gi += 1
        else:
            sections.append(jnp.zeros((*after_B.shape[:-2], out_per), x.dtype))
    return jnp.concatenate(sections, axis=-1) * scaling.astype(x.dtype)


def add_lora(params: Dict[str, Any], lora_params: Dict[str, jax.Array]) -> Dict[str, Any]:
    """Return a new tree with LoRA leaves inside blocks/attn/c_attn."""
    new = jax.tree_util.tree_map(lambda a: a, params)
    c_attn = dict(new["blocks"]["attn"]["c_attn"])
    c_attn.update(lora_params)
    new["blocks"]["attn"]["c_attn"] = c_attn
    return new


def extract_lora(params: Dict[str, Any]) -> Dict[str, jax.Array]:
    """The LoRA-only state (reference `lora_state_dict`, `lora.py:362-393`)."""
    c_attn = params["blocks"]["attn"]["c_attn"]
    return {k: c_attn[k] for k in ("lora_A", "lora_B", "lora_alpha")}


def strip_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    new = jax.tree_util.tree_map(lambda a: a, params)
    c_attn = {
        k: v
        for k, v in new["blocks"]["attn"]["c_attn"].items()
        if not k.startswith("lora_")
    }
    new["blocks"]["attn"]["c_attn"] = c_attn
    return new


def _delta_w(lora_params, enable_lora, D):
    A, B = lora_params["lora_A"], lora_params["lora_B"]
    g, r, out_per = B.shape[-3:]
    scaling = (lora_params["lora_alpha"] / r).reshape(-1, 1, 1, 1)
    A_g = A.reshape(*A.shape[:-1], g, r)  # (L, D, g, r)
    delta = jnp.einsum("ldgr,lgro->lgdo", A_g, B) * scaling  # (L, g, D, out_per)
    sections = []
    gi = 0
    for enabled in enable_lora:
        if enabled:
            sections.append(delta[:, gi])
            gi += 1
        else:
            sections.append(jnp.zeros_like(delta[:, 0]))
    return jnp.concatenate(sections, axis=-1)  # (L, D, 3D)


def merge_lora(
    params: Dict[str, Any], enable_lora: Sequence[bool] = ENABLE_LORA_DEFAULT
) -> Dict[str, Any]:
    """Fold the LoRA update into the base qkv weight and drop the LoRA leaves
    (the eval-mode merge, reference `lora.py:268-278`; also the basis of
    `scripts/convert_lora_weights.py`)."""
    c_attn = params["blocks"]["attn"]["c_attn"]
    lora = {k: c_attn[k] for k in ("lora_A", "lora_B", "lora_alpha")}
    w = c_attn["weight"]
    delta = _delta_w(lora, enable_lora, w.shape[1]).astype(w.dtype)
    merged = strip_lora(params)
    merged["blocks"]["attn"]["c_attn"]["weight"] = w + delta
    return merged


def lora_trainable(path: str) -> bool:
    """Trainability predicate (reference `mark_only_lora_as_trainable`,
    `lora.py:327-359`, bias='none' — the model has no biases)."""
    return "lora_A" in path or "lora_B" in path
