"""SFT data pipeline + finetune step tests (reference analogues:
`tests/test_prepare_*`, finetune scripts)."""
import numpy as np
import jax
import jax.numpy as jnp

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.data.sft import (
    IGNORE_INDEX,
    generate_prompt,
    load_sft_dataset,
    prepare_sample,
    save_sft_dataset,
    sft_batches,
)
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.train.step import init_opt_state, make_adamw, make_sft_train_step

CFG = LLaMAConfig(block_size=32, vocab_size=64, n_layer=1, n_head=2, n_embd=16)


class FakeTokenizer:
    bos_id, eos_id, pad_id = 1, 2, 0

    def encode(self, s, bos=True, eos=False, max_length=-1, pad=False):
        toks = [3 + (ord(c) % 60) for c in s[:50]]
        if bos:
            toks = [self.bos_id] + toks
        if eos:
            toks = toks + [self.eos_id]
        if max_length > 0:
            toks = toks[:max_length]
        return np.asarray(toks, np.int32)


def test_alpaca_prompt_template():
    with_input = generate_prompt({"instruction": "Add", "input": "1+1"})
    assert "### Instruction:\nAdd" in with_input
    assert "### Input:\n1+1" in with_input
    no_input = generate_prompt({"instruction": "Add", "input": ""})
    assert "### Input" not in no_input
    assert no_input.endswith("### Response:")


def test_prepare_sample_masks_prompt():
    tok = FakeTokenizer()
    s = prepare_sample(
        {"instruction": "Say hi", "input": "", "output": "hi"}, tok, 64,
        mask_inputs=True,
    )
    n_prompt = len(s["input_ids_no_response"])
    assert (s["labels"][:n_prompt] == IGNORE_INDEX).all()
    assert (s["labels"][n_prompt:] != IGNORE_INDEX).any()
    assert s["input_ids"][-1] == tok.eos_id


def test_sft_dataset_torch_interchange(tmp_path):
    tok = FakeTokenizer()
    samples = [
        prepare_sample({"instruction": f"i{k}", "input": "", "output": "o"}, tok, 32)
        for k in range(3)
    ]
    path = tmp_path / "train.pt"
    save_sft_dataset(samples, path)
    # readable by plain torch (the reference's loader contract)
    import torch

    raw = torch.load(str(path), weights_only=False)
    assert isinstance(raw[0]["input_ids"], torch.Tensor)
    back = load_sft_dataset(path)
    np.testing.assert_array_equal(back[1]["labels"], samples[1]["labels"])


def test_sft_batches_fixed_shape():
    tok = FakeTokenizer()
    data = [
        prepare_sample({"instruction": "a" * n, "input": "", "output": "b"}, tok, 24)
        for n in (3, 10, 17)
    ]
    it = sft_batches(data, micro_batch_size=2, max_seq_length=24)
    for _ in range(3):
        b = next(it)
        assert b["input_ids"].shape == (2, 24)
        assert b["labels"].shape == (2, 24)
        assert (b["labels"] == IGNORE_INDEX).any()  # right padding


def test_sft_train_step_reduces_loss(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    opt = make_adamw(1e-2, weight_decay=0.0)
    step = jax.jit(make_sft_train_step(CFG, opt))
    opt_state = init_opt_state(opt, params)
    x = rng.integers(1, CFG.vocab_size, size=(1, 2, 16)).astype(np.int32)
    y = x.copy()
    y[:, :, :4] = IGNORE_INDEX
    batch = {"input_ids": jnp.asarray(x), "labels": jnp.asarray(y)}
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, batch, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses
