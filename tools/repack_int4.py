"""Migrate a v1 (rounds 1-2) packed-int4 checkpoint to the current byte layout.

v1 stored both nibbles plain (`lo = b & 0xF, hi = b >> 4`); the current format
(`quant/linear.INT4_PACK_VERSION` = "hi-biased-v2") stores the high nibble
two's-complement biased so the decode kernel can unpack shift-free (see
`quant/linear.pack_int4`). This tool unpacks every int4 qweight leaf with the
OLD semantics, re-packs with the new ones, rewrites the checkpoint in place,
and stamps `quant_format.json`. int8 leaves are untouched.

Usage: python tools/repack_int4.py <checkpoint_dir>
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def unpack_int4_v1(packed: np.ndarray) -> np.ndarray:
    """v1 inverse: both nibbles plain. uint8 (K//2, N) -> levels (K, N)."""
    lo = packed & 0xF
    hi = packed >> 4
    K2, N = packed.shape[-2:]
    lead = packed.shape[:-2]
    return np.stack([lo, hi], axis=-2).reshape(*lead, K2 * 2, N)


def pack_int4_v2(q: np.ndarray) -> np.ndarray:
    """Current pack: low nibble plain, high nibble (q-8)&0xF (quant/linear.pack_int4)."""
    q = q.astype(np.uint8)
    lo = q[..., 0::2, :]
    hi = (q[..., 1::2, :] - np.uint8(8)) & np.uint8(0xF)
    return lo | (hi << 4)


def repack_tree(tree, cfg, stats: dict):
    """Recursively repack int4 qweight leaves (rows == in_features//2)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == "qweight" and hasattr(v, "shape"):
            a = np.asarray(v)
            if a.dtype == np.uint8 and _is_int4(a, cfg):
                out[k] = pack_int4_v2(unpack_int4_v1(a))
                stats["repacked"] += 1
            else:
                out[k] = v
        else:
            out[k] = repack_tree(v, cfg, stats)
    return out


def _is_int4(q: np.ndarray, cfg) -> bool:
    """Distinguish packed-int4 from uint8-stored-int8 by K rows: every linear
    has in_features == n_embd except the MLP c_proj (n_hidden); int8 stores
    full K rows, int4 stores K//2."""
    rows = q.shape[-2]
    if rows * 2 in (cfg.n_embd, cfg.n_hidden):
        return True
    if rows in (cfg.n_embd, cfg.n_hidden):
        return False
    raise ValueError(f"cannot classify qweight leaf with K rows {rows}")


def main(checkpoint_dir: str) -> None:
    import jax  # noqa: F401  (orbax needs a backend)

    from lit_llama_ja_tpu.io.checkpoint import _config_from_dict
    from lit_llama_ja_tpu.quant.linear import INT4_PACK_VERSION

    import orbax.checkpoint as ocp

    path = Path(checkpoint_dir).absolute()
    cfg = _config_from_dict(json.loads((path / "config.json").read_text()))
    fmt_file = path / "quant_format.json"
    if fmt_file.exists():
        stored = json.loads(fmt_file.read_text()).get("int4_pack")
        if stored == INT4_PACK_VERSION:
            print(f"{path} already uses {INT4_PACK_VERSION}; nothing to do")
            return
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / "params")
    stats = {"repacked": 0}
    params = repack_tree(params, cfg, stats)
    if stats["repacked"] == 0:
        print("no packed int4 leaves found; stamping format only")
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "params", params, force=True)
    fmt_file.write_text(json.dumps({"int4_pack": INT4_PACK_VERSION}))
    print(f"repacked {stats['repacked']} int4 leaves -> {INT4_PACK_VERSION}")


if __name__ == "__main__":
    main(sys.argv[1])
