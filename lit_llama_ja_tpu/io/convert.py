"""Checkpoint converters: lit-llama `.pth` / Meta / HF -> native param trees.

Covers the reference's converter surface:
  * `scripts/convert_checkpoint.py` — Meta consolidated.*.pth shards: rename keys,
    concatenate model-parallel shards along the documented dims, de-interleave QKV.
  * `scripts/convert_hf_checkpoint.py` — HF LLaMA: un-permute q/k, reassemble the
    fused qkv matrix.
  * lit-llama `.pth` (the reference's own format) <-> native trees, both directions
    (the reverse direction lets reference users keep their tooling).
  * `scripts/convert_lora_weights.py` — merge LoRA into standalone weights: see
    `models/lora.merge_lora`; `lora_checkpoint_to_native` converts the torch LoRA
    state layout into this framework's grouped layout.

torch is used host-side only (CPU tensors -> numpy); `torch.load(mmap=True)` gives
the constant-memory streaming read that the reference builds with `lazy_load`.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig, llama_model_lookup


def _np(t) -> np.ndarray:
    """torch tensor -> numpy (host)."""
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


# ---------------------------------------------------------------------------
# lit-llama .pth <-> native
# ---------------------------------------------------------------------------

def lit_state_dict_to_native(
    sd: Dict, config: Optional[LLaMAConfig] = None, dtype=np.float32,
    quantize: Optional[str] = None,
):
    """Flat lit-llama torch state dict -> this framework's stacked param tree.

    Torch Linears store (out, in); ours store (in, out) -> transpose every weight.
    Per-layer `transformer.h.{i}.*` tensors stack on a leading layer axis.
    Each tensor converts to ``dtype`` as it is read (from an mmap'd load this keeps
    peak host memory at ~one model copy in the target dtype).

    ``quantize`` in {"llm.int8", "gptq.int4", "gptq.int8"} quantizes each
    Linear PER LAYER while streaming out of the (mmap'd) state dict, so the
    full-precision model never exists in host RAM at once — peak extra memory
    is one layer's fp weight (the reference achieves this with the
    `EmptyInitOnDevice`/`quantization()` constructor swap,
    `lit_llama/utils.py:105-194`; here quantized trees are data, so the swap
    happens in the converter). gptq.* uses RTN levels (run quantize/gptq.py
    for calibrated ones)."""
    _cast = lambda a: _np(a).astype(dtype, copy=False)
    if config is None:
        n_embd = _np(sd["transformer.wte.weight"]).shape[1]
        config = LLaMAConfig.from_name(llama_model_lookup(n_embd))
    L = config.n_layer

    qlin = None
    if quantize is not None:
        import jax

        from lit_llama_ja_tpu.quant.linear import (
            quantize_colblock,
            quantize_int8_absmax,
            quantize_int8_outlier,
        )

        if quantize == "llm.int8":
            # outlier-aware by default (the reference Linear8bitLt semantics);
            # "llm.int8-rtn" keeps the plain absmax scheme for A/B
            _qfn = quantize_int8_outlier
        elif quantize == "llm.int8-rtn":
            _qfn = quantize_int8_absmax
        else:
            from lit_llama_ja_tpu.quant.linear import (
                parse_quant_mode,
                resolve_bits,
                resolve_groupsize,
            )

            _, bits, groupsize = parse_quant_mode(quantize)
            _qfn = lambda w, name: quantize_colblock(
                w,
                bits=resolve_bits(bits, name),
                tile_cols=resolve_groupsize(bits, name, groupsize),
            )

        def qlin(w2d: np.ndarray, name: str = "lm_head"):
            if quantize.startswith("llm.int8"):
                return jax.tree.map(np.asarray, _qfn(np.asarray(w2d)))
            return jax.tree.map(np.asarray, _qfn(np.asarray(w2d), name))

    def pad_vocab(w: np.ndarray) -> np.ndarray:
        # zero-pad rows up to padded_vocab_size (HF checkpoints ship unpadded)
        V = config.padded_vocab_size
        if w.shape[0] < V:
            w = np.concatenate(
                [w, np.zeros((V - w.shape[0], w.shape[1]), w.dtype)]
            )
        return w

    def layer(i, key):
        return _cast(sd[f"transformer.h.{i}.{key}"])

    def stack_w(key):  # transposed linear weights (quantized per-layer if asked)
        if qlin is None:
            return {"weight": np.stack([layer(i, key).T for i in range(L)])}
        name = key.removesuffix(".weight")  # "attn.c_attn" etc.
        per_layer = [qlin(layer(i, key).T, name) for i in range(L)]
        return {
            k: np.stack([q[k] for q in per_layer]) for k in per_layer[0]
        }

    def stack_v(key):  # 1-D scales
        return np.stack([layer(i, key) for i in range(L)])

    def head(w2d: np.ndarray):
        return {"weight": w2d} if qlin is None else qlin(w2d)

    return {
        "wte": {"weight": pad_vocab(_cast(sd["transformer.wte.weight"]))},
        "lm_head": head(pad_vocab(_cast(sd["lm_head.weight"])).T),
        "ln_f": {"scale": _cast(sd["transformer.ln_f.scale"])},
        "blocks": {
            "rms_1": {"scale": stack_v("rms_1.scale")},
            "attn": {
                "c_attn": stack_w("attn.c_attn.weight"),
                "c_proj": stack_w("attn.c_proj.weight"),
            },
            "rms_2": {"scale": stack_v("rms_2.scale")},
            "mlp": {
                "c_fc1": stack_w("mlp.c_fc1.weight"),
                "c_fc2": stack_w("mlp.c_fc2.weight"),
                "c_proj": stack_w("mlp.c_proj.weight"),
            },
        },
    }, config


def native_to_lit_state_dict(params) -> Dict[str, np.ndarray]:
    """Reverse conversion so reference users can consume our checkpoints."""
    blocks = params["blocks"]
    L = np.asarray(blocks["rms_1"]["scale"]).shape[0]
    sd = {
        "transformer.wte.weight": np.asarray(params["wte"]["weight"]),
        "lm_head.weight": np.asarray(params["lm_head"]["weight"]).T,
        "transformer.ln_f.scale": np.asarray(params["ln_f"]["scale"]),
    }
    for i in range(L):
        sd[f"transformer.h.{i}.rms_1.scale"] = np.asarray(blocks["rms_1"]["scale"][i])
        sd[f"transformer.h.{i}.rms_2.scale"] = np.asarray(blocks["rms_2"]["scale"][i])
        sd[f"transformer.h.{i}.attn.c_attn.weight"] = np.asarray(
            blocks["attn"]["c_attn"]["weight"][i]
        ).T
        sd[f"transformer.h.{i}.attn.c_proj.weight"] = np.asarray(
            blocks["attn"]["c_proj"]["weight"][i]
        ).T
        sd[f"transformer.h.{i}.mlp.c_fc1.weight"] = np.asarray(
            blocks["mlp"]["c_fc1"]["weight"][i]
        ).T
        sd[f"transformer.h.{i}.mlp.c_fc2.weight"] = np.asarray(
            blocks["mlp"]["c_fc2"]["weight"][i]
        ).T
        sd[f"transformer.h.{i}.mlp.c_proj.weight"] = np.asarray(
            blocks["mlp"]["c_proj"]["weight"][i]
        ).T
    return sd


def load_lit_checkpoint(
    path, config: Optional[LLaMAConfig] = None, dtype=np.float32,
    quantize: Optional[str] = None,
):
    """Load a reference lit-llama `.pth` (mmap'd — constant host memory, the
    `lazy_load` capability of `lit_llama/utils.py:200-376`).

    ``dtype``: target numpy dtype for the converted tree; converting per-tensor
    while streaming out of the mmap keeps peak host memory at ~one model copy in
    the target dtype (e.g. float16 halves the 7B footprint vs fp32).
    ``quantize``: quantize Linears per layer DURING streaming (see
    `lit_state_dict_to_native`) — peak host RSS ≈ the packed size, not the fp
    model (a 7B llm.int8 load stays ~7 GB instead of ~28 GB fp32)."""
    import torch

    sd = torch.load(str(path), map_location="cpu", mmap=True, weights_only=True)
    return lit_state_dict_to_native(sd, config, dtype=dtype, quantize=quantize)


# ---------------------------------------------------------------------------
# Meta (consolidated.*.pth) -> native
# ---------------------------------------------------------------------------

# dim along which each Meta tensor was model-parallel sharded
# (reference `scripts/convert_checkpoint.py:55-63`)
_META_SHARD_DIMS = {
    "output.weight": 0,
    "tok_embeddings.weight": 1,
    "attention.wq.weight": 0,
    "attention.wk.weight": 0,
    "attention.wv.weight": 0,
    "attention.wo.weight": 1,
    "feed_forward.w1.weight": 0,
    "feed_forward.w2.weight": 1,
    "feed_forward.w3.weight": 0,
}


def meta_checkpoints_to_lit(state_dicts) -> Dict[str, np.ndarray]:
    """Merge Meta model-parallel shards into one flat lit-style state dict
    (reference `scripts/convert_checkpoint.py:20-52, 95-111`). Key layout/fusion
    matches the reference: wq/wk/wv shards are merged per-matrix THEN concatenated
    into the fused c_attn, which is equivalent to its de-interleave pass."""
    merged: Dict[str, np.ndarray] = {}
    keys = state_dicts[0].keys()
    for key in keys:
        if "rope.freqs" in key or "inner_attention" in key:
            continue
        parts = [_np(sd[key]) for sd in state_dicts]
        dim = next(
            (d for suffix, d in _META_SHARD_DIMS.items() if key.endswith(suffix)), None
        )
        merged[key] = parts[0] if dim is None else np.concatenate(parts, axis=dim)

    out: Dict[str, np.ndarray] = {
        "transformer.wte.weight": merged["tok_embeddings.weight"],
        "lm_head.weight": merged["output.weight"],
        "transformer.ln_f.scale": merged["norm.weight"],
    }
    layer_ids = sorted(
        {int(k.split(".")[1]) for k in merged if k.startswith("layers.")}
    )
    for i in layer_ids:
        out[f"transformer.h.{i}.attn.c_attn.weight"] = np.concatenate(
            [
                merged[f"layers.{i}.attention.wq.weight"],
                merged[f"layers.{i}.attention.wk.weight"],
                merged[f"layers.{i}.attention.wv.weight"],
            ]
        )
        out[f"transformer.h.{i}.attn.c_proj.weight"] = merged[
            f"layers.{i}.attention.wo.weight"
        ]
        out[f"transformer.h.{i}.mlp.c_fc1.weight"] = merged[
            f"layers.{i}.feed_forward.w1.weight"
        ]
        out[f"transformer.h.{i}.mlp.c_proj.weight"] = merged[
            f"layers.{i}.feed_forward.w2.weight"
        ]
        out[f"transformer.h.{i}.mlp.c_fc2.weight"] = merged[
            f"layers.{i}.feed_forward.w3.weight"
        ]
        out[f"transformer.h.{i}.rms_1.scale"] = merged[
            f"layers.{i}.attention_norm.weight"
        ]
        out[f"transformer.h.{i}.rms_2.scale"] = merged[f"layers.{i}.ffn_norm.weight"]
    return out


# ---------------------------------------------------------------------------
# HuggingFace -> native
# ---------------------------------------------------------------------------

def _unpermute_hf(w: np.ndarray, n_head: int) -> np.ndarray:
    """Reverse HF's q/k rotary permutation (reference
    `scripts/convert_hf_checkpoint.py:61-68`)."""
    dim = w.shape[1]
    return (
        w.reshape(n_head, 2, dim // n_head // 2, dim)
        .transpose(0, 2, 1, 3)
        .reshape(dim, dim)
    )


def hf_state_dict_to_lit(sd: Dict, config: LLaMAConfig) -> Dict[str, np.ndarray]:
    """HF LLaMA state dict -> flat lit-style state dict
    (reference `scripts/convert_hf_checkpoint.py:70-134`)."""
    out: Dict[str, np.ndarray] = {
        "transformer.wte.weight": _np(sd["model.embed_tokens.weight"]),
        "lm_head.weight": _np(sd["lm_head.weight"]),
        "transformer.ln_f.scale": _np(sd["model.norm.weight"]),
    }
    for i in range(config.n_layer):
        p = f"model.layers.{i}."
        q = _unpermute_hf(_np(sd[p + "self_attn.q_proj.weight"]), config.n_head)
        k = _unpermute_hf(_np(sd[p + "self_attn.k_proj.weight"]), config.n_head)
        v = _np(sd[p + "self_attn.v_proj.weight"])
        out[f"transformer.h.{i}.attn.c_attn.weight"] = np.concatenate([q, k, v])
        out[f"transformer.h.{i}.attn.c_proj.weight"] = _np(
            sd[p + "self_attn.o_proj.weight"]
        )
        out[f"transformer.h.{i}.mlp.c_fc1.weight"] = _np(sd[p + "mlp.gate_proj.weight"])
        out[f"transformer.h.{i}.mlp.c_fc2.weight"] = _np(sd[p + "mlp.up_proj.weight"])
        out[f"transformer.h.{i}.mlp.c_proj.weight"] = _np(sd[p + "mlp.down_proj.weight"])
        out[f"transformer.h.{i}.rms_1.scale"] = _np(sd[p + "input_layernorm.weight"])
        out[f"transformer.h.{i}.rms_2.scale"] = _np(
            sd[p + "post_attention_layernorm.weight"]
        )
    return out


# ---------------------------------------------------------------------------
# torch LoRA state -> native grouped layout
# ---------------------------------------------------------------------------

def lora_checkpoint_to_native(sd: Dict, config: LLaMAConfig, alpha: float):
    """Reference LoRA state dict (`transformer.h.{i}.attn.c_attn.lora_{A,B}`,
    A: (g*r, D), B: (g*D, r)) -> grouped leaves {lora_A (L, D, g*r),
    lora_B (L, g, r, D), lora_alpha (L,)}."""
    L, D = config.n_layer, config.n_embd
    As, Bs = [], []
    for i in range(L):
        A = _np(sd[f"transformer.h.{i}.attn.c_attn.lora_A"])  # (g*r, D)
        B = _np(sd[f"transformer.h.{i}.attn.c_attn.lora_B"])  # (g*D, r)
        g = B.shape[0] // D
        r = A.shape[0] // g
        As.append(A.T)  # (D, g*r)
        Bs.append(B.reshape(g, D, r).transpose(0, 2, 1))  # (g, r, D)
    import jax.numpy as jnp

    return {
        "lora_A": jnp.asarray(np.stack(As)),
        "lora_B": jnp.asarray(np.stack(Bs)),
        "lora_alpha": jnp.full((L,), alpha, jnp.float32),
    }


# ---------------------------------------------------------------------------
# native -> HuggingFace (export; the reference only imports)
# ---------------------------------------------------------------------------

def _permute_hf(w: np.ndarray, n_head: int) -> np.ndarray:
    """Apply HF's q/k rotary permutation (inverse of `_unpermute_hf`)."""
    dim = w.shape[1]
    return (
        w.reshape(n_head, dim // n_head // 2, 2, dim)
        .transpose(0, 2, 1, 3)
        .reshape(dim, dim)
    )


def native_to_hf_state_dict(params, config: LLaMAConfig) -> Dict[str, np.ndarray]:
    """Export a native param tree as a HF `LlamaForCausalLM` state dict.

    Inverse of `hf_state_dict_to_lit` ∘ `lit_state_dict_to_native`: weights
    transpose back to torch (out, in) layout, the fused qkv splits into
    q/k/v_proj with HF's rotary permutation re-applied to q/k, and vocab
    padding rows are trimmed back to ``config.vocab_size``. Round-trip and
    HF-logit parity are tested (`tests/test_convert.py`).
    """
    blocks = params["blocks"]
    V, D = config.vocab_size, config.n_embd
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["wte"]["weight"])[:V],
        "lm_head.weight": np.asarray(params["lm_head"]["weight"]).T[:V],
        "model.norm.weight": np.asarray(params["ln_f"]["scale"]),
    }
    for i in range(config.n_layer):
        p = f"model.layers.{i}."
        c_attn = np.asarray(blocks["attn"]["c_attn"]["weight"][i]).T  # (3D, D)
        q, k, v = c_attn[:D], c_attn[D : 2 * D], c_attn[2 * D :]
        out[p + "self_attn.q_proj.weight"] = _permute_hf(q, config.n_head)
        out[p + "self_attn.k_proj.weight"] = _permute_hf(k, config.n_head)
        out[p + "self_attn.v_proj.weight"] = v
        out[p + "self_attn.o_proj.weight"] = np.asarray(
            blocks["attn"]["c_proj"]["weight"][i]
        ).T
        out[p + "mlp.gate_proj.weight"] = np.asarray(
            blocks["mlp"]["c_fc1"]["weight"][i]
        ).T
        out[p + "mlp.up_proj.weight"] = np.asarray(
            blocks["mlp"]["c_fc2"]["weight"][i]
        ).T
        out[p + "mlp.down_proj.weight"] = np.asarray(
            blocks["mlp"]["c_proj"]["weight"][i]
        ).T
        out[p + "input_layernorm.weight"] = np.asarray(blocks["rms_1"]["scale"][i])
        out[p + "post_attention_layernorm.weight"] = np.asarray(
            blocks["rms_2"]["scale"][i]
        )
    return out
