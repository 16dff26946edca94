"""Config registry parity with the reference (`lit_llama/model.py:48-56`)."""
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig, find_multiple, llama_configs


# exact values from the reference registry, incl. the ja-fork sizes
REFERENCE_CONFIGS = {
    "19M": dict(n_layer=6, n_head=8, n_embd=512, vocab_size=35000),
    "49M": dict(n_layer=10, n_head=10, n_embd=640, vocab_size=35000),
    "125M": dict(n_layer=12, n_head=10, n_embd=780, vocab_size=35000),
    "7B": dict(n_layer=32, n_head=32, n_embd=4096, vocab_size=32000),
    "13B": dict(n_layer=40, n_head=40, n_embd=5120, vocab_size=32000),
    "30B": dict(n_layer=60, n_head=52, n_embd=6656, vocab_size=32000),
    "65B": dict(n_layer=80, n_head=64, n_embd=8192, vocab_size=32000),
}


@pytest.mark.parametrize("name", list(REFERENCE_CONFIGS))
def test_registry_matches_reference(name):
    cfg = LLaMAConfig.from_name(name)
    want = REFERENCE_CONFIGS[name]
    assert cfg.n_layer == want["n_layer"]
    assert cfg.n_head == want["n_head"]
    assert cfg.n_embd == want["n_embd"]
    assert cfg.vocab_size == want["vocab_size"]
    assert cfg.block_size == 2048
    assert cfg.padded_vocab_size == find_multiple(want["vocab_size"], 64)


def test_find_multiple():
    assert find_multiple(32000, 64) == 32000
    assert find_multiple(35000, 64) == 35008
    assert find_multiple(1, 256) == 256


def test_n_hidden_swiglu_formula():
    # reference MLP sizing: find_multiple(int(2*4*n_embd/3), 256)
    assert LLaMAConfig.from_name("7B").n_hidden == 11008
    assert LLaMAConfig.from_name("13B").n_hidden == 13824


def test_config_hashable_for_jit():
    a = LLaMAConfig.from_name("19M")
    b = LLaMAConfig.from_name("19M")
    assert hash(a) == hash(b)
    assert a == b


def test_registry_has_all_names():
    assert set(llama_configs) == set(REFERENCE_CONFIGS)
