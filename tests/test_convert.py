"""Checkpoint converter tests, including golden logit parity vs HuggingFace
transformers' LLaMA (the strongest reference-parity check — the reference verifies
its converter the same way, `scripts/convert_hf_checkpoint.py:141-160`)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.io.checkpoint import (
    load_state_npz,
    save_state_npz,
)
from lit_llama_ja_tpu.io.convert import (
    hf_state_dict_to_lit,
    lit_state_dict_to_native,
    meta_checkpoints_to_lit,
    native_to_lit_state_dict,
)
from lit_llama_ja_tpu.models.llama import forward, init_params

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)


def test_native_lit_roundtrip(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    sd = native_to_lit_state_dict(params)
    assert sd["transformer.h.0.attn.c_attn.weight"].shape == (96, 32)  # torch (out,in)
    back, cfg = lit_state_dict_to_native(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-7)


def test_lit_lookup_from_shape():
    """Shape-based model identification (reference `llama_model_lookup`)."""
    from lit_llama_ja_tpu.core.config import llama_model_lookup

    assert llama_model_lookup(512) == "19M"
    assert llama_model_lookup(4096) == "7B"
    assert llama_model_lookup(8192) == "65B"


def test_meta_shard_merge(rng):
    """Two model-parallel shards merge into the correct fused tensors."""
    D, H = 8, 16
    mk = lambda *s: rng.standard_normal(s).astype(np.float32)
    full = {
        "wq": mk(D, D), "wk": mk(D, D), "wv": mk(D, D), "wo": mk(D, D),
        "w1": mk(H, D), "w2": mk(D, H), "w3": mk(H, D),
        "tok": mk(10, D), "out": mk(10, D),
    }
    def shard(i):
        h = lambda w, d: np.split(w, 2, axis=d)[i]
        return {
            "tok_embeddings.weight": h(full["tok"], 1),
            "output.weight": h(full["out"], 0),
            "norm.weight": np.ones(D, np.float32),
            "layers.0.attention.wq.weight": h(full["wq"], 0),
            "layers.0.attention.wk.weight": h(full["wk"], 0),
            "layers.0.attention.wv.weight": h(full["wv"], 0),
            "layers.0.attention.wo.weight": h(full["wo"], 1),
            "layers.0.feed_forward.w1.weight": h(full["w1"], 0),
            "layers.0.feed_forward.w2.weight": h(full["w2"], 1),
            "layers.0.feed_forward.w3.weight": h(full["w3"], 0),
            "layers.0.attention_norm.weight": np.ones(D, np.float32),
            "layers.0.ffn_norm.weight": np.ones(D, np.float32),
        }

    lit = meta_checkpoints_to_lit([shard(0), shard(1)])
    np.testing.assert_array_equal(
        lit["transformer.h.0.attn.c_attn.weight"],
        np.concatenate([full["wq"], full["wk"], full["wv"]]),
    )
    np.testing.assert_array_equal(lit["transformer.h.0.mlp.c_proj.weight"], full["w2"])
    np.testing.assert_array_equal(lit["transformer.wte.weight"], full["tok"])


def test_npz_state_roundtrip(tmp_path, rng):
    tree = {"a": {"b": rng.standard_normal((3, 4)).astype(np.float32)},
            "c": np.arange(5)}
    path = tmp_path / "state.npz"
    save_state_npz(path, tree)
    back = load_state_npz(path)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["c"], tree["c"])


def test_lora_checkpoint_conversion(rng):
    """Reference-layout torch LoRA state -> grouped leaves: the converted branch
    must reproduce the reference's conv1d-grouped forward math."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from lit_llama_ja_tpu.io.convert import lora_checkpoint_to_native
    from lit_llama_ja_tpu.models.lora import lora_branch

    cfg = LLaMAConfig(block_size=16, vocab_size=32, n_layer=2, n_head=2, n_embd=8)
    D, r, g, alpha = cfg.n_embd, 2, 2, 4.0
    sd = {}
    rng_t = torch.Generator().manual_seed(0)
    for i in range(cfg.n_layer):
        sd[f"transformer.h.{i}.attn.c_attn.lora_A"] = torch.randn(
            g * r, D, generator=rng_t
        )
        sd[f"transformer.h.{i}.attn.c_attn.lora_B"] = torch.randn(
            g * D, r, generator=rng_t
        )
    leaves = lora_checkpoint_to_native(sd, cfg, alpha=alpha)
    assert leaves["lora_A"].shape == (cfg.n_layer, D, g * r)
    assert leaves["lora_B"].shape == (cfg.n_layer, g, r, D)

    x = torch.randn(1, 5, D, generator=rng_t)
    for i in range(cfg.n_layer):
        # reference forward math (lit_llama/lora.py:310-323): x@A^T -> grouped
        # conv1d with B -> zero-pad into [q, 0, v] sections -> * alpha/r
        A, B = sd[f"transformer.h.{i}.attn.c_attn.lora_A"], sd[
            f"transformer.h.{i}.attn.c_attn.lora_B"
        ]
        after_A = F.linear(x, A)  # (1, 5, g*r)
        after_B = F.conv1d(
            after_A.transpose(-2, -1), B.unsqueeze(-1), groups=g
        ).transpose(-2, -1)  # (1, 5, g*D)
        want = torch.zeros(1, 5, 3 * D)
        want[..., :D] = after_B[..., :D]  # q section
        want[..., 2 * D :] = after_B[..., D:]  # v section
        want = (want * (alpha / r)).numpy()

        leaf = {
            "weight": jnp.zeros((D, 3 * D)),
            "lora_A": leaves["lora_A"][i],
            "lora_B": leaves["lora_B"][i],
            "lora_alpha": leaves["lora_alpha"][i],
        }
        got = np.asarray(lora_branch(leaf, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_hf_golden_logit_parity(rng):
    """Convert a tiny random HF LlamaForCausalLM and require logit agreement —
    the golden-parity strategy of the reference test suite (SURVEY.md §4)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    cfg = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.n_embd,
        intermediate_size=cfg.n_hidden,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        num_key_value_heads=cfg.n_head,
        max_position_embeddings=cfg.block_size,
        rms_norm_eps=cfg.norm_eps,
        rope_theta=float(cfg.rope_base),
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    with torch.no_grad():
        hf_model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
        sd = hf_model.state_dict()
        lit_sd = hf_state_dict_to_lit(sd, cfg)
        params, _ = lit_state_dict_to_native(lit_sd, cfg)

        ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()

    ours = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
    # compare over the real vocab (ours is padded to 128)
    np.testing.assert_allclose(
        ours[..., : cfg.vocab_size], hf_logits, atol=2e-4, rtol=1e-3
    )


def test_native_to_hf_round_trip(rng):
    """native -> HF sd -> lit sd -> native is the identity."""
    from lit_llama_ja_tpu.io.convert import (
        hf_state_dict_to_lit,
        lit_state_dict_to_native,
        native_to_hf_state_dict,
    )
    from lit_llama_ja_tpu.models.llama import init_params

    cfg = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)
    params = init_params(jax.random.PRNGKey(3), cfg)
    hf_sd = native_to_hf_state_dict(params, cfg)
    back, _ = lit_state_dict_to_native(hf_state_dict_to_lit(hf_sd, cfg), cfg)
    for path, want in jax.tree_util.tree_leaves_with_path(params):
        got = back
        for k in path:
            got = got[k.key]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_native_to_hf_logit_parity(rng):
    """Export to HF, load into transformers, require logit agreement."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    from lit_llama_ja_tpu.io.convert import native_to_hf_state_dict
    from lit_llama_ja_tpu.models.llama import init_params

    cfg = LLaMAConfig(block_size=32, vocab_size=64, n_layer=2, n_head=4, n_embd=32)
    params = init_params(jax.random.PRNGKey(4), cfg)
    hf_sd = native_to_hf_state_dict(params, cfg)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.n_embd,
        intermediate_size=cfg.n_hidden, num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head, num_key_value_heads=cfg.n_head,
        max_position_embeddings=cfg.block_size, rms_norm_eps=cfg.norm_eps,
        rope_theta=float(cfg.rope_base), attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False,
    )
    with torch.no_grad():
        hf_model = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
        hf_model.load_state_dict(
            {k: torch.from_numpy(v.copy()) for k, v in hf_sd.items()}
        )
        ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
    np.testing.assert_allclose(
        ours[..., : cfg.vocab_size], hf_logits, atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("mode", ["llm.int8", "gptq.int4"])
def test_streaming_quantized_load_matches_posthoc(rng, mode):
    """Quantizing per layer WHILE streaming the state dict (constant-memory
    load, reference purpose `lit_llama/utils.py:105-194`) produces bit-identical
    leaves to materialize-then-quantize."""
    params = init_params(jax.random.PRNGKey(2), CFG)
    sd = native_to_lit_state_dict(params)

    streamed, _ = lit_state_dict_to_native(sd, CFG, quantize=mode)

    full, _ = lit_state_dict_to_native(sd, CFG)
    if mode == "llm.int8":
        from lit_llama_ja_tpu.quant.pipeline import int8_quantize_model

        want = int8_quantize_model(jax.tree.map(jnp.asarray, full))
    else:
        from lit_llama_ja_tpu.quant.linear import quantize_colblock
        from lit_llama_ja_tpu.quant.pipeline import SUBMODULES, _get, _set, _to_mutable

        want = _to_mutable(jax.tree.map(jnp.asarray, full))
        for name in SUBMODULES:
            leaf = _get(want["blocks"], name)
            w = leaf["weight"]
            qs = [quantize_colblock(w[l], bits=4) for l in range(w.shape[0])]
            _set(want["blocks"], name, dict(jax.tree.map(lambda *xs: jnp.stack(xs), *qs)))
        want["lm_head"] = dict(quantize_colblock(want["lm_head"]["weight"], bits=4))

    flat_s = jax.tree.leaves_with_path(streamed)
    flat_w = dict(
        (jax.tree_util.keystr(kp), v) for kp, v in jax.tree.leaves_with_path(want)
    )
    assert len(flat_s) == len(flat_w)
    for kp, a in flat_s:
        b = flat_w[jax.tree_util.keystr(kp)]
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(kp)
        )
