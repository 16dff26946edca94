"""Pack-format versioning: quantized checkpoints are stamped with the int4
byte-layout version at save, v1/unstamped packed-int4 checkpoints refuse to
load (the round-3 biased-high-nibble change silently corrupts them otherwise),
and `tools/repack_int4.py` migrates v1 checkpoints in place.

(Reference analogue: none — the reference has a single fixed pack layout; this
guards this repo's round-3 on-disk format change.)
"""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from lit_llama_ja_tpu.models.llama import init_params, normalize_kv_mode
from lit_llama_ja_tpu.quant.linear import (
    INT4_PACK_VERSION,
    unpack_int4,
)
from lit_llama_ja_tpu.quant.pipeline import int8_quantize_model

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2, n_embd=16)


def _int4_params(seed=0):
    """Tiny model with every block linear packed int4 (RTN levels)."""
    from lit_llama_ja_tpu.quant.linear import quantize_colblock
    from lit_llama_ja_tpu.quant.pipeline import SUBMODULES, _get, _set, _to_mutable

    import jax

    params = init_params(jax.random.PRNGKey(seed), CFG)
    params = _to_mutable(params)
    for name in SUBMODULES:
        leaf = _get(params["blocks"], name)
        w = leaf["weight"]
        L = w.shape[0]
        qs = [quantize_colblock(w[l], bits=4) for l in range(L)]
        _set(
            params["blocks"], name,
            {k: jnp.stack([q[k] for q in qs]) for k in qs[0]},
        )
    return params


def test_save_stamps_quant_format(tmp_path):
    params = _int4_params()
    save_checkpoint(tmp_path / "ckpt", params, CFG)
    fmt = json.loads((tmp_path / "ckpt" / "quant_format.json").read_text())
    assert fmt["int4_pack"] == INT4_PACK_VERSION
    restored, cfg = load_checkpoint(tmp_path / "ckpt")  # no raise
    assert cfg.n_embd == CFG.n_embd


def test_unstamped_int4_refuses_to_load(tmp_path):
    params = _int4_params()
    save_checkpoint(tmp_path / "ckpt", params, CFG)
    (tmp_path / "ckpt" / "quant_format.json").unlink()  # simulate a v1 artifact
    with pytest.raises(ValueError, match="repack_int4"):
        load_checkpoint(tmp_path / "ckpt")


def test_mismatched_stamp_refuses_to_load(tmp_path):
    params = _int4_params()
    save_checkpoint(tmp_path / "ckpt", params, CFG)
    (tmp_path / "ckpt" / "quant_format.json").write_text(
        json.dumps({"int4_pack": "plain-v1"})
    )
    with pytest.raises(ValueError, match="plain-v1"):
        load_checkpoint(tmp_path / "ckpt")


def test_unstamped_int8_loads_fine(tmp_path):
    """The pack-format change only affects packed int4; int8 trees predating
    the stamp must keep loading."""
    import jax

    params = int8_quantize_model(init_params(jax.random.PRNGKey(1), CFG))
    save_checkpoint(tmp_path / "ckpt", params, CFG)
    (tmp_path / "ckpt" / "quant_format.json").unlink()
    load_checkpoint(tmp_path / "ckpt")  # no raise


def test_repack_tool_migrates_v1(tmp_path):
    """A v1-packed checkpoint (both nibbles plain) repacks to the current
    layout with identical levels, then loads cleanly."""
    import sys

    sys.path.insert(0, "tools")
    try:
        import repack_int4
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(7)
    params = _int4_params()

    # overwrite every int4 qweight with a v1-packed version of known levels
    levels = {}

    def v1ify(tree, path=""):
        for k, v in list(tree.items()):
            if k == "qweight" and hasattr(v, "shape") and v.dtype == jnp.uint8:
                q = rng.integers(0, 16, size=(v.shape[-2] * 2,) + v.shape[-1:])
                q = np.broadcast_to(q, v.shape[:-2] + q.shape).astype(np.uint8)
                lo, hi = q[..., 0::2, :], q[..., 1::2, :]
                tree[k] = jnp.asarray(lo | (hi << 4))  # v1: both nibbles plain
                levels[path] = q
            elif isinstance(v, dict):
                v1ify(v, path + "/" + k)

    v1ify(params)
    assert levels, "no int4 leaves found"
    save_checkpoint(tmp_path / "ckpt", params, CFG)
    (tmp_path / "ckpt" / "quant_format.json").unlink()

    repack_int4.main(str(tmp_path / "ckpt"))

    restored, _ = load_checkpoint(tmp_path / "ckpt")  # stamped now — no raise

    def check(tree, path=""):
        for k, v in tree.items():
            if k == "qweight" and path in levels:
                np.testing.assert_array_equal(
                    np.asarray(unpack_int4(jnp.asarray(v))), levels[path]
                )
            elif isinstance(v, dict):
                check(v, path + "/" + k)

    check(restored)


def test_normalize_kv_mode():
    assert normalize_kv_mode(None) is False
    assert normalize_kv_mode(False) is False
    assert normalize_kv_mode("none") is False
    assert normalize_kv_mode("fp") is False
    assert normalize_kv_mode(True) == "int8"
    assert normalize_kv_mode("INT8") == "int8"
    assert normalize_kv_mode("Int4") == "int4"
    with pytest.raises(ValueError, match="in4"):
        normalize_kv_mode("in4")


def test_decode_path_ppl_short_stream_raises():
    import jax

    from lit_llama_ja_tpu.infer.evaluate import decode_path_perplexity

    params = init_params(jax.random.PRNGKey(0), CFG)
    with pytest.raises(ValueError, match="window"):
        decode_path_perplexity(
            params, CFG, np.arange(6, dtype=np.int32), window=16
        )
