"""Parameter partition specs.

The TP sharding dims are exactly the dims the reference's Meta-checkpoint converter
documents as the historical model-parallel split (`scripts/convert_checkpoint.py:55-63`):
qkv + MLP up projections column-parallel, output projections row-parallel. ``fsdp``
shards the complementary dim, giving 2-D (tp × fsdp) sharded matrices. The stacked
layer axis (leading L) is never sharded (it is the scan axis; also the natural
pipeline axis in a later pp extension).

Rules are (path-regex → PartitionSpec), first match wins — applied to *any* param
tree (base model, LoRA, adapter, quantized), so PEFT/quantized trees inherit sensible
shardings without bespoke tables.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# first match wins; paths look like "blocks/attn/c_attn/weight"
PARAM_RULES = (
    # token embedding (V, D): vocab over tp, embed over fsdp
    (r"^wte/weight$", P("tp", "fsdp")),
    # lm head (D, V): column-parallel over tp
    (r"^lm_head/weight$", P("fsdp", "tp")),
    # fused qkv (L, D, 3D): column-parallel
    (r"blocks/attn/c_attn/(weight|qweight)$", P(None, "fsdp", "tp")),
    (r"blocks/attn/c_attn/(scales|zeros|outlier_w)$", P(None, None, "tp")),
    # attn out-proj (L, D, D): row-parallel
    (r"blocks/attn/c_proj/(weight|qweight)$", P(None, "tp", "fsdp")),
    (r"blocks/attn/c_proj/(scales|zeros|outlier_w)$", P(None, None, "fsdp")),
    # mlp up projections (L, D, H): column-parallel
    (r"blocks/mlp/c_fc[12]/(weight|qweight)$", P(None, "fsdp", "tp")),
    (r"blocks/mlp/c_fc[12]/(scales|zeros|outlier_w)$", P(None, None, "tp")),
    # mlp down projection (L, H, D): row-parallel
    (r"blocks/mlp/c_proj/(weight|qweight)$", P(None, "tp", "fsdp")),
    (r"blocks/mlp/c_proj/(scales|zeros|outlier_w)$", P(None, None, "fsdp")),
    # int8 outlier row indices (L, n_out): tiny, replicate
    (r"outlier_idx$", P()),
    # MoE stacked experts (models/moe.py): expert axis over fsdp, in-expert
    # hidden dim over tp (mirrors the dense mlp col/row split); router
    # replicates (tiny, f32). A dedicated 'ep' axis instead uses
    # parallel/ep.ep_param_specs + explicit all_to_all routing.
    (r"blocks/moe/c_fc[12]/weight$", P(None, "fsdp", None, "tp")),
    (r"blocks/moe/c_proj/weight$", P(None, "fsdp", "tp", None)),
    (r"blocks/moe/router/weight$", P()),
    # LoRA (applied to c_attn): A (L, r2, D) fsdp on D; B (L, sum_enabled*out/3, r) tp on out
    (r"lora/.*/lora_A$", P(None, None, "fsdp")),
    (r"lora/.*/lora_B$", P(None, "tp", None)),
    # adapter v1: tiny, replicate
    (r"adapter/", P()),
    # norms & everything else 1-2D small: replicate
    (r".*", P()),
)

# activations / data
BATCH_SPEC = P(("dp", "fsdp"))  # batch dim sharded over dp×fsdp for data parallel
# KV cache (L, B, nh, S, hd): batch over dp, heads over tp
KV_CACHE_SPEC = P(None, "dp", "tp", None, None)


def _match(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def path_of(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_specs(params: Any, rules=PARAM_RULES) -> Any:
    """Pytree of PartitionSpec matching ``params``' structure."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: _match(path_of(kp), rules), params
    )


def param_shardings(params: Any, mesh: Mesh, rules=PARAM_RULES) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params, rules),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, mesh: Mesh, rules=PARAM_RULES) -> Any:
    """Device-put a (host or single-device) param tree onto the mesh."""
    shardings = param_shardings(params, mesh, rules)
    return jax.device_put(params, shardings)


def kv_cache_shardings(cache: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, KV_CACHE_SPEC), cache)
