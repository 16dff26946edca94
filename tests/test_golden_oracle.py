"""Independent-framework golden oracles for adapter v1/v2 and LoRA numerics.

The reference validates adapter math against the original LLaMA-Adapter gist
with gates force-enabled (`/root/reference/tests/conftest.py:9-32`,
`/root/reference/tests/test_model.py:159-213`) and LoRA against microsoft/LoRA.
This environment has no network egress, so instead of vendored gist outputs the
oracle here is a from-scratch PYTORCH reimplementation of the same published
math (prefix cross-attention with per-head zero-init gating; grouped low-rank
update scattered into the enabled q/v sections; per-linear scale/bias) — a
different framework, different SDP kernel, different op order. Agreement in
float64 to ~1e-10 rules out any JAX-side implementation artifact.

Weights flow JAX -> torch (transposed to torch's (out, in) Linear convention),
gates are forced non-zero exactly like the reference conftest.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lit_llama_ja_tpu.models import llama  # noqa: E402
from lit_llama_ja_tpu.models.adapter import (  # noqa: E402
    AdapterConfig,
    add_adapter,
    add_adapter_v2,
    adapter_forward,
    init_adapter_params,
)
from lit_llama_ja_tpu.models.lora import (  # noqa: E402
    add_lora,
    init_lora_params,
    merge_lora,
)

CFG = AdapterConfig(
    block_size=32, vocab_size=64, n_layer=3, n_head=2, n_embd=16,
    adapter_prompt_length=4, adapter_start_layer=1,
)


# --------------------------------------------------------------------------
# torch oracle (float64)
# --------------------------------------------------------------------------

def t64(a):
    return torch.from_numpy(np.asarray(a, np.float64))


def torch_rope(x, positions):
    """Standard pairwise RoPE: x (B, T, nh, hd), rotate adjacent pairs."""
    B, T, nh, hd = x.shape
    theta = 1.0 / (10000 ** (torch.arange(0, hd, 2, dtype=torch.float64) / hd))
    ang = positions[:, None].to(torch.float64) * theta[None]  # (T, hd/2)
    cos, sin = torch.cos(ang), torch.sin(ang)
    xs = x.reshape(B, T, nh, hd // 2, 2)
    x0, x1 = xs[..., 0], xs[..., 1]
    out = torch.stack(
        [x0 * cos[None, :, None], x1 * cos[None, :, None]], dim=-1
    )
    out[..., 0] -= x1 * sin[None, :, None]
    out[..., 1] += x0 * sin[None, :, None]
    return out.reshape(B, T, nh, hd)


def torch_rmsnorm(x, scale, eps):
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * scale


class Oracle:
    """From-scratch torch LLaMA with optional adapter v1/v2 and LoRA leaves.

    Consumes the JAX param tree directly (numpy bridges); every weight is used
    in torch's own convention via explicit F.linear(x, W.T)-free matmuls.
    """

    def __init__(self, params, config, v2=False, lora=None):
        self.p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        self.cfg = config
        self.v2 = v2
        self.lora = lora  # dict(enable_lora=..., r=...)

    def linear(self, leaf, x, layer=None):
        w = t64(leaf["weight"] if layer is None else leaf["weight"][layer])
        y = x @ w
        if self.v2 and "adapter_bias" in leaf:
            b = t64(leaf["adapter_bias"] if layer is None else leaf["adapter_bias"][layer])
            s = t64(leaf["adapter_scale"] if layer is None else leaf["adapter_scale"][layer])
            y = s * (y + b)
        return y

    def attn(self, blk, adapter, layer, x, positions):
        cfg = self.cfg
        B, T, C = x.shape
        nh, hd = cfg.n_head, cfg.head_dim
        qkv = self.linear(blk["attn"]["c_attn"], x, layer)
        if self.lora is not None:
            qkv = qkv + self.lora_delta(layer, x)
        q, k, v = qkv.split(C, dim=-1)
        q = torch_rope(q.reshape(B, T, nh, hd), positions).transpose(1, 2)
        k = torch_rope(k.reshape(B, T, nh, hd), positions).transpose(1, 2)
        v = v.reshape(B, T, nh, hd).transpose(1, 2)
        y = torch.nn.functional.scaled_dot_product_attention(
            q, k, v, is_causal=True
        )
        if adapter is not None and layer >= cfg.adapter_start_layer:
            aT = cfg.adapter_prompt_length
            prefix = t64(adapter["adapter_wte"][layer])[None]  # (1, aT, D)
            aqkv = self.linear(blk["attn"]["c_attn"], prefix, layer)
            _, ak, av = aqkv.split(C, dim=-1)  # NO rope on the prefix
            ak = ak.reshape(1, aT, nh, hd).transpose(1, 2).expand(B, -1, -1, -1)
            av = av.reshape(1, aT, nh, hd).transpose(1, 2).expand(B, -1, -1, -1)
            ay = torch.nn.functional.scaled_dot_product_attention(
                q, ak, av, is_causal=False
            )
            gate = t64(adapter["gating_factor"][layer]).reshape(1, nh, 1, 1)
            y = y + gate * ay
        y = y.transpose(1, 2).reshape(B, T, C)
        return self.linear(blk["attn"]["c_proj"], y, layer)

    def lora_delta(self, layer, x):
        """Independent formulation: materialize the scattered low-rank ΔW and
        apply it as one matmul (the JAX side factors through x@A then @B)."""
        lr = self.lora
        A = t64(self.p["blocks"]["attn"]["c_attn"]["lora_A"][layer])  # (D, g*r)
        Bm = t64(self.p["blocks"]["attn"]["c_attn"]["lora_B"][layer])  # (g, r, D)
        alpha = float(self.p["blocks"]["attn"]["c_attn"]["lora_alpha"][layer])
        g, r, out_per = Bm.shape
        D = A.shape[0]
        dW = torch.zeros(D, 3 * out_per, dtype=torch.float64)
        gi = 0
        for sec, enabled in enumerate(lr["enable_lora"]):
            if enabled:
                Ag = A[:, gi * r : (gi + 1) * r]
                dW[:, sec * out_per : (sec + 1) * out_per] = Ag @ Bm[gi]
                gi += 1
        return (x @ dW) * (alpha / r)

    def forward(self, idx):
        cfg = self.cfg
        p = self.p
        x = t64(p["wte"]["weight"])[torch.from_numpy(np.asarray(idx))]
        T = x.shape[1]
        positions = torch.arange(T)
        adapter = p["blocks"].get("adapter")
        blk = {k: v for k, v in p["blocks"].items() if k != "adapter"}
        for l in range(cfg.n_layer):
            h = torch_rmsnorm(x, t64(blk["rms_1"]["scale"][l]), cfg.norm_eps)
            x = x + self.attn(blk, adapter, l, h, positions)
            h = torch_rmsnorm(x, t64(blk["rms_2"]["scale"][l]), cfg.norm_eps)
            up = torch.nn.functional.silu(self.linear(blk["mlp"]["c_fc1"], h, l))
            gate = self.linear(blk["mlp"]["c_fc2"], h, l)
            x = x + self.linear(blk["mlp"]["c_proj"], up * gate, l)
        x = torch_rmsnorm(x, t64(p["ln_f"]["scale"]), cfg.norm_eps)
        return self.linear(p["lm_head"], x).numpy()


@pytest.fixture
def base_params():
    return llama.init_params(jax.random.PRNGKey(3), CFG)


IDX = np.array([[5, 1, 9, 33, 2, 17, 40, 8]], np.int64)


def _compare(jax_logits, torch_logits, tol=1e-6):
    np.testing.assert_allclose(
        np.asarray(jax_logits, np.float64), torch_logits, rtol=tol, atol=tol
    )


def test_base_forward_matches_torch_oracle(base_params):
    ours = llama.forward(base_params, jnp.asarray(IDX), CFG)
    golden = Oracle(base_params, CFG).forward(IDX)
    _compare(ours, golden)


def test_adapter_v1_matches_torch_oracle(base_params):
    """Gates forced non-zero, exactly like the reference conftest
    (`/root/reference/tests/conftest.py:9-32`)."""
    ap = init_adapter_params(jax.random.PRNGKey(7), CFG)
    ap["gating_factor"] = jax.random.normal(
        jax.random.PRNGKey(8), ap["gating_factor"].shape
    )
    params = add_adapter(base_params, ap)
    ours = adapter_forward(params, jnp.asarray(IDX), CFG)
    golden = Oracle(params, CFG).forward(IDX)
    _compare(ours, golden)


def test_adapter_v2_matches_torch_oracle(base_params):
    ap = init_adapter_params(jax.random.PRNGKey(7), CFG)
    ap["gating_factor"] = jax.random.normal(
        jax.random.PRNGKey(8), ap["gating_factor"].shape
    )
    params = add_adapter_v2(add_adapter(base_params, ap))
    # non-trivial scale/bias so the v2 patch actually changes the function
    key = jax.random.PRNGKey(9)
    mut = jax.tree.map(lambda a: a, params)
    for path in (("attn", "c_attn"), ("attn", "c_proj"), ("mlp", "c_fc1"),
                 ("mlp", "c_fc2"), ("mlp", "c_proj")):
        leaf = mut["blocks"][path[0]][path[1]]
        key, k1, k2 = jax.random.split(key, 3)
        leaf["adapter_bias"] = 0.1 * jax.random.normal(k1, leaf["adapter_bias"].shape)
        leaf["adapter_scale"] = 1.0 + 0.1 * jax.random.normal(
            k2, leaf["adapter_scale"].shape
        )
    key, k1, k2 = jax.random.split(key, 3)
    mut["lm_head"]["adapter_bias"] = 0.1 * jax.random.normal(
        k1, mut["lm_head"]["adapter_bias"].shape
    )
    mut["lm_head"]["adapter_scale"] = 1.0 + 0.1 * jax.random.normal(
        k2, mut["lm_head"]["adapter_scale"].shape
    )
    ours = adapter_forward(mut, jnp.asarray(IDX), CFG)
    golden = Oracle(mut, CFG, v2=True).forward(IDX)
    _compare(ours, golden)


def test_lora_matches_torch_oracle(base_params):
    enable = (True, False, True)
    lp = init_lora_params(jax.random.PRNGKey(11), CFG, r=4, alpha=16.0,
                          enable_lora=enable)
    # non-zero B so the branch is active
    lp["lora_B"] = 0.3 * jax.random.normal(jax.random.PRNGKey(12), lp["lora_B"].shape)
    params = add_lora(base_params, lp)
    ours = llama.forward(params, jnp.asarray(IDX), CFG)
    golden = Oracle(params, CFG, lora=dict(enable_lora=enable)).forward(IDX)
    _compare(ours, golden)


def test_lora_merge_matches_torch_oracle(base_params):
    """merge_lora folds ΔW into the dense weight; the merged tree must agree
    with the oracle's materialized-ΔW formulation too."""
    enable = (True, False, True)
    lp = init_lora_params(jax.random.PRNGKey(21), CFG, r=2, alpha=4.0,
                          enable_lora=enable)
    lp["lora_B"] = 0.5 * jax.random.normal(jax.random.PRNGKey(22), lp["lora_B"].shape)
    params = add_lora(base_params, lp)
    merged = merge_lora(params)
    ours = llama.forward(merged, jnp.asarray(IDX), CFG)
    golden = Oracle(params, CFG, lora=dict(enable_lora=enable)).forward(IDX)
    _compare(ours, golden, tol=1e-5)
