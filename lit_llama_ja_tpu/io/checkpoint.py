"""Checkpoint save/load.

Replaces the reference's torch-zip + lazy_load/incremental_save machinery
(`lit_llama/utils.py:200-531`) with TPU-native storage:

  * **Native format**: Orbax — sharded, mesh-aware restore (each host reads only its
    shards), async-capable; the constant-host-memory property the reference builds by
    hand with `NotYetLoadedTensor` / `SavingProxyForTensor` falls out of Orbax's
    tensorstore backend.
  * **PEFT states** (LoRA / adapter deltas — small): a plain flat ``.npz``, trivially
    portable (reference analogue: the PEFT-only state dicts,
    `lit_llama/lora.py:362-393`).

Model identity is stored alongside (``config.json``) rather than inferred from tensor
shapes; `infer_model_name` keeps the reference's shape-lookup trick
(`lit_llama/utils.py:19-36`) for foreign checkpoints.
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig, llama_model_lookup


# ---------------------------------------------------------------------------
# Native (orbax) checkpoints
# ---------------------------------------------------------------------------

def _config_from_dict(d: dict):
    """Rebuild the right config class from config.json: MoE checkpoints carry
    the extra expert fields (models/moe.MoEConfig); dense ones are plain
    LLaMAConfig."""
    if "n_expert" in d:
        from lit_llama_ja_tpu.models.moe import MoEConfig

        return MoEConfig(**d)
    return LLaMAConfig(**d)


def _tree_has_qweight(tree) -> bool:
    if isinstance(tree, dict):
        return "qweight" in tree or any(_tree_has_qweight(v) for v in tree.values())
    return False


def _tree_has_packed_int4(tree, config) -> bool:
    """True iff any qweight leaf uses the packed-int4 layout (rows == K//2).

    The quantized tree carries only arrays, so bit-width is inferred from
    shape vs the config's embedding dim (c_attn/c_fc1 have in_features ==
    n_embd; int8 stores full-K rows)."""
    if config is None:
        return _tree_has_qweight(tree)  # conservative: can't rule int4 out
    half_rows = (config.n_embd // 2, config.n_hidden // 2)
    found = []

    def visit(node):
        if isinstance(node, dict):
            q = node.get("qweight")
            if q is not None and hasattr(q, "shape"):
                if q.shape[-2] in half_rows:
                    found.append(True)
            for v in node.values():
                visit(v)

    visit(tree)
    return bool(found)


def _write_quant_format(path: Path, params) -> None:
    if _tree_has_qweight(params):
        from lit_llama_ja_tpu.quant.linear import INT4_PACK_VERSION

        (path / "quant_format.json").write_text(
            json.dumps({"int4_pack": INT4_PACK_VERSION})
        )


def _check_quant_format(path: Path, params, config) -> None:
    """Refuse to load int4-packed trees whose byte layout predates the current
    pack format — a v1 checkpoint loads without error and silently dequantizes
    every odd K-row wrong otherwise (the round-3 biased-high-nibble change)."""
    if not _tree_has_qweight(params):
        return
    from lit_llama_ja_tpu.quant.linear import INT4_PACK_VERSION

    fmt_file = path / "quant_format.json"
    stored = None
    if fmt_file.exists():
        stored = json.loads(fmt_file.read_text()).get("int4_pack")
    if stored == INT4_PACK_VERSION:
        return
    if not _tree_has_packed_int4(params, config):
        return  # int8-only tree: the pack-format change does not affect it
    raise ValueError(
        f"{path} contains packed int4 weights with pack format "
        f"{stored or 'v1/unstamped'}, but this build reads "
        f"{INT4_PACK_VERSION!r} (high nibble stored two's-complement biased "
        "since round 3). Loading it would silently dequantize every odd K-row "
        "wrong. Migrate it in place with: python tools/repack_int4.py "
        f"{path}"
    )


def save_checkpoint(path, params, config: Optional[LLaMAConfig] = None) -> None:
    """Save a param tree (and optionally its config) to ``path`` (a directory).

    Quantized trees (any ``qweight`` leaf) additionally get a
    ``quant_format.json`` stamp recording the int4 byte layout version."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "params", params, force=True)
    if config is not None:
        (path / "config.json").write_text(json.dumps(dataclasses.asdict(config)))
    _write_quant_format(path, params)


def load_checkpoint(
    path,
    *,
    template: Optional[Any] = None,
    shardings: Optional[Any] = None,
):
    """Load a param tree saved by `save_checkpoint`.

    Args:
      template: a pytree of ShapeDtypeStruct/arrays giving the target structure;
        without it the stored structure/dtypes are used.
      shardings: optional matching pytree of NamedShardings — arrays are restored
        *directly sharded onto the mesh* (no full-host materialization).
    Returns (params, config-or-None).
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    target = template
    if shardings is not None and template is not None:
        target = jax.tree.map(
            lambda t, s: jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=s),
            template,
            shardings,
        )
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / "params", target)
    config = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        config = _config_from_dict(json.loads(cfg_file.read_text()))
    _check_quant_format(path, params, config)
    return params, config


# ---------------------------------------------------------------------------
# Flat npz states (PEFT deltas, small trees)
# ---------------------------------------------------------------------------

def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_state_npz(path, tree) -> None:
    np.savez(path, **flatten_tree(tree))


def load_state_npz(path):
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})


def infer_model_name(n_embd: int) -> str:
    """Shape-based model lookup (reference `llama_model_lookup`)."""
    return llama_model_lookup(n_embd)


# ---------------------------------------------------------------------------
# Full training state (params + optimizer + progress) — true resume.
# The reference restart (`pretrain/redpajama.py:104,216`) reloads weights only:
# optimizer moments and the data position are lost. Here all of it round-trips.
# ---------------------------------------------------------------------------

def save_train_state(
    path, params, opt_state, config: Optional[LLaMAConfig] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Save params + optimizer state (+ JSON metadata, e.g. {"iter": n})."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "params", params, force=True)
        ckptr.save(path / "opt_state", opt_state, force=True)
    if config is not None:
        (path / "config.json").write_text(json.dumps(dataclasses.asdict(config)))
    (path / "meta.json").write_text(json.dumps(meta or {}))


def load_train_state(path, *, params_template=None, opt_state_template=None):
    """Load a `save_train_state` checkpoint.

    ``opt_state_template`` (e.g. ``optimizer.init(params)``) is required to
    restore optax's namedtuple structure. Returns
    (params, opt_state, config-or-None, meta dict).
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / "params", params_template)
        opt_state = ckptr.restore(path / "opt_state", opt_state_template)
    config = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        config = LLaMAConfig(**json.loads(cfg_file.read_text()))
    meta = json.loads((path / "meta.json").read_text())
    return params, opt_state, config, meta
