"""Opt-in NETWORKED golden-parity tests against the upstream original
implementations — the reference's core test strategy
(`/root/reference/tests/conftest.py:9-32`, `tests/test_model.py:40-213`,
fixture URLs in `scripts/download.py:5-8`): download the original Meta LLaMA
implementation and the LLaMA-Adapter gist, copy OUR weights into them, and
assert logit parity.

These are the first commands to run on a networked machine (VERDICT round-4
item #6); in the zero-egress build sandbox they skip cleanly. Run with:

    python -m pytest tests/test_upstream_golden.py -m network -v

The in-sandbox substitutes are `tests/test_golden_oracle.py` (from-scratch
torch float64 oracles) and the HF-transformers logit parity on a real trained
model (QUALITY.md, 8.4e-7 max rel diff).
"""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.network

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lit_llama_ja_tpu.core.config import LLaMAConfig  # noqa: E402
from lit_llama_ja_tpu.models import llama  # noqa: E402

# the reference's fixture URLs, verbatim (`scripts/download.py:5-8`)
UPSTREAM_FILES = {
    "original_model.py": "https://gist.githubusercontent.com/lantiga/fd36849fb1c498da949a0af635318a7b/raw/7dd20f51c2a1ff2886387f0e25c1750a485a08e1/llama_model.py",
    "original_adapter.py": "https://gist.githubusercontent.com/awaelchli/546f33fcdb84cc9f1b661ca1ca18418d/raw/e81d8f35fb1fec53af1099349b0c455fc8c9fb01/original_adapter.py",
}
FIXDIR = Path(__file__).resolve().parents[1] / "out" / "upstream"


def _fetch_module(name: str):
    FIXDIR.mkdir(parents=True, exist_ok=True)
    path = FIXDIR / name
    if not path.exists():
        import socket
        from urllib.request import urlretrieve

        socket.setdefaulttimeout(20)
        try:
            urlretrieve(UPSTREAM_FILES[name], path)
        except Exception as e:  # no egress — the expected sandbox outcome
            pytest.skip(f"cannot download upstream fixture {name}: {e}")
    spec = importlib.util.spec_from_file_location(name.removesuffix(".py"), path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def orig_llama():
    return _fetch_module("original_model.py")


@pytest.fixture(scope="module")
def orig_llama_adapter():
    return _fetch_module("original_adapter.py")


def _copy_into_torch(params, model, cfg):
    """Copy OUR (K=in, N=out) jax leaves into the original torch model's
    (out, in) Linears — the transposed analogue of the reference's
    `copy_weights` (`tests/test_model.py:6-37`)."""
    D = cfg.n_embd

    def t(a):  # jax (in, out) -> torch (out, in)
        return torch.from_numpy(np.asarray(a, np.float32).T.copy())

    with torch.no_grad():
        model.tok_embeddings.weight.copy_(
            torch.from_numpy(np.asarray(params["wte"]["weight"], np.float32))
        )
        model.norm.weight.copy_(
            torch.from_numpy(np.asarray(params["ln_f"]["scale"], np.float32))
        )
        model.output.weight.copy_(t(params["lm_head"]["weight"]))
        b = params["blocks"]
        for i, layer in enumerate(model.layers):
            c_attn = np.asarray(b["attn"]["c_attn"]["weight"][i], np.float32)
            layer.attention.wq.weight.copy_(t(c_attn[:, :D]))
            layer.attention.wk.weight.copy_(t(c_attn[:, D:2 * D]))
            layer.attention.wv.weight.copy_(t(c_attn[:, 2 * D:]))
            layer.attention.wo.weight.copy_(t(b["attn"]["c_proj"]["weight"][i]))
            layer.feed_forward.w1.weight.copy_(t(b["mlp"]["c_fc1"]["weight"][i]))
            layer.feed_forward.w3.weight.copy_(t(b["mlp"]["c_fc2"]["weight"][i]))
            layer.feed_forward.w2.weight.copy_(t(b["mlp"]["c_proj"]["weight"][i]))
            layer.attention_norm.weight.copy_(
                torch.from_numpy(np.asarray(b["rms_1"]["scale"][i], np.float32))
            )
            layer.ffn_norm.weight.copy_(
                torch.from_numpy(np.asarray(b["rms_2"]["scale"][i], np.float32))
            )


@torch.no_grad()
def test_upstream_llama_logit_parity(orig_llama, rng):
    """Full-forward logit parity vs the original Meta implementation
    (the reference's `test_model.py::test_to_orig_llama`)."""
    # vocab chosen so padded_vocab_size == vocab_size (the original has no pad)
    cfg = LLaMAConfig(
        block_size=64, vocab_size=128, n_layer=3, n_head=4, n_embd=32
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    ocfg = orig_llama.ModelArgs(
        dim=cfg.n_embd, n_layers=cfg.n_layer, n_heads=cfg.n_head,
        vocab_size=cfg.vocab_size, norm_eps=cfg.norm_eps,
        max_seq_len=cfg.block_size, max_batch_size=3,
    )
    omodel = orig_llama.Transformer(ocfg)
    _copy_into_torch(params, omodel, cfg)

    tokens = rng.integers(0, cfg.vocab_size, size=(3, cfg.block_size))
    ours = np.asarray(
        llama.forward(params, jnp.asarray(tokens, jnp.int32), cfg),
        np.float32,
    )
    theirs = omodel(torch.from_numpy(tokens).to(torch.int64), 0).float().numpy()
    if theirs.ndim == 2:  # some revisions return only the last position
        np.testing.assert_allclose(ours[:, -1], theirs, atol=5e-4, rtol=1e-3)
    else:
        np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


@torch.no_grad()
def test_upstream_adapter_logit_parity(orig_llama_adapter, rng):
    """Adapter-forward parity vs the LLaMA-Adapter reference gist
    (the reference's `test_model.py::test_adapter_parity`)."""
    from lit_llama_ja_tpu.models.adapter import (
        AdapterConfig, adapter_forward, add_adapter, init_adapter_params,
    )

    cfg = AdapterConfig(
        block_size=32, vocab_size=128, n_layer=2, n_head=4, n_embd=16,
        adapter_prompt_length=10, adapter_start_layer=0,
    )
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    aparams = add_adapter(params, init_adapter_params(jax.random.PRNGKey(2), cfg))

    ocfg = orig_llama_adapter.ModelArgs(
        dim=cfg.n_embd, n_layers=cfg.n_layer, n_heads=cfg.n_head,
        vocab_size=cfg.vocab_size, norm_eps=cfg.norm_eps,
        max_seq_len=cfg.block_size,
        adapter_len=cfg.adapter_prompt_length,
        adapter_layer=cfg.n_layer - cfg.adapter_start_layer,
    )
    omodel = orig_llama_adapter.Transformer(ocfg)
    _copy_into_torch(params, omodel, cfg)
    with torch.no_grad():
        # one flat adapter embedding upstream vs our per-layer stack
        wte = np.asarray(
            aparams["blocks"]["adapter"]["adapter_wte"], np.float32
        )[cfg.adapter_start_layer:]
        omodel.adapter_query.weight.copy_(
            torch.from_numpy(wte.reshape(-1, cfg.n_embd))
        )
        for layer in omodel.layers:
            if hasattr(layer.attention, "gate"):
                layer.attention.gate.fill_(1.0)
    g = aparams["blocks"]["adapter"]["gating_factor"]
    aparams["blocks"]["adapter"]["gating_factor"] = jnp.ones_like(g)

    tokens = rng.integers(0, cfg.vocab_size, size=(3, cfg.block_size))
    ours = np.asarray(
        adapter_forward(aparams, jnp.asarray(tokens, jnp.int32), cfg),
        np.float32,
    )
    theirs = omodel(torch.from_numpy(tokens).to(torch.int64), 0).float().numpy()
    if theirs.ndim == 2:
        np.testing.assert_allclose(ours[:, -1], theirs, atol=5e-4, rtol=1e-3)
    else:
        np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)
