"""End-to-end finetune driver integration: tiny base checkpoint + tiny SFT data
through the real CLI driver for each PEFT variant, then reload the artifacts."""
import numpy as np
import jax
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.data.sft import prepare_sample, save_sft_dataset
from lit_llama_ja_tpu.io.checkpoint import load_state_npz, save_checkpoint
from lit_llama_ja_tpu.models.llama import init_params

CFG = LLaMAConfig(block_size=64, vocab_size=64, n_layer=2, n_head=2, n_embd=16)


class FakeTok:
    bos_id, eos_id, pad_id = 1, 2, 0

    def encode(self, s, bos=True, eos=False, max_length=-1, pad=False):
        toks = [3 + (ord(c) % 60) for c in s[:40]]
        if bos:
            toks = [self.bos_id] + toks
        if eos:
            toks = toks + [self.eos_id]
        if max_length > 0:
            toks = toks[:max_length]
        return np.asarray(toks, np.int32)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ft")
    params = init_params(jax.random.PRNGKey(0), CFG)
    save_checkpoint(root / "base", params, CFG)
    tok = FakeTok()
    samples = [
        prepare_sample(
            {"instruction": f"task {i}", "input": "", "output": "done"}, tok, 48
        )
        for i in range(8)
    ]
    save_sft_dataset(samples, root / "train.pt")
    save_sft_dataset(samples[:4], root / "test.pt")
    return root


def _run(variant, workspace, **kw):
    from lit_llama_ja_tpu.cli.finetune_cli import _finetune_driver

    out = workspace / f"out_{variant}"
    return _finetune_driver(
        data_dir=str(workspace),
        pretrained_path=str(workspace / "base"),
        out_dir=str(out),
        variant=variant,
        learning_rate=1e-3,
        weight_decay=0.0,
        micro_batch_size=2,
        batch_size=4,
        max_iters=3,
        warmup_iters=1,
        max_seq_length=48,
        eval_interval=2,
        save_interval=2,
        eval_iters=2,
        log_interval=1,
        **kw,
    ), out


def test_finetune_lora_end_to_end(workspace):
    params, out = _run("lora", workspace, lora_r=2, lora_alpha=4)
    npzs = list(out.glob("*.npz"))
    assert npzs, "LoRA state checkpoints written"
    state = load_state_npz(npzs[-1])
    assert set(state) == {"lora_A", "lora_B", "lora_alpha"}


def test_finetune_adapter_end_to_end(workspace):
    params, out = _run("adapter", workspace)
    npzs = list(out.glob("*.npz"))
    assert npzs
    state = load_state_npz(npzs[-1])
    assert "adapter" in state


def test_finetune_adapter_v2_end_to_end(workspace):
    params, out = _run("adapter_v2", workspace)
    npzs = list(out.glob("*.npz"))
    assert npzs
    state = load_state_npz(npzs[-1])
    flat_keys = set()

    def walk(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat_keys.add(prefix + k)

    walk(state)
    assert any("adapter_scale" in k for k in flat_keys)
    assert any("rms_1" in k for k in flat_keys)


def test_finetune_full_end_to_end(workspace):
    params, out = _run("full", workspace)
    # full variant saves complete native checkpoints
    saved = [p for p in out.iterdir() if (p / "params").exists()]
    assert saved
    from lit_llama_ja_tpu.io.checkpoint import load_checkpoint

    restored, cfg = load_checkpoint(saved[-1])
    assert cfg.n_layer == CFG.n_layer
