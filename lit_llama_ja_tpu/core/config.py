"""Model configuration and registry.

Capability parity with the reference `lit_llama/model.py:23-56` (LLaMAConfig dataclass,
`llama_configs` registry incl. the Japanese-fork sizes 19M/49M/125M with vocab_size=35000,
vocab padding to a multiple of 64) — redesigned as a frozen dataclass with derived
properties so it can be a static argument to `jax.jit`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


def find_multiple(n: int, k: int) -> int:
    """Round ``n`` up to the nearest multiple of ``k`` (reference `lit_llama/utils.py:39`)."""
    if n % k == 0:
        return n
    return n + k - (n % k)


@dataclass(frozen=True)
class LLaMAConfig:
    """Static model hyperparameters.

    Frozen + hashable so a config can be passed as a static argnum through `jax.jit`
    without retracing on every call.
    """

    block_size: int = 2048
    vocab_size: int = 32000
    padded_vocab_size: Optional[int] = None
    n_layer: int = 32
    n_head: int = 32
    n_embd: int = 4096
    rope_base: int = 10000
    norm_eps: float = 1e-5

    def __post_init__(self):
        if self.padded_vocab_size is None:
            object.__setattr__(
                self, "padded_vocab_size", find_multiple(self.vocab_size, 64)
            )

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    @property
    def n_hidden(self) -> int:
        """SwiGLU hidden size (reference `lit_llama/model.py:249-251`)."""
        return find_multiple(int(2 * 4 * self.n_embd / 3), 256)

    @classmethod
    def from_name(cls, name: str, **overrides) -> "LLaMAConfig":
        return cls(**{**llama_configs[name], **overrides})

    def replace(self, **kw) -> "LLaMAConfig":
        return dataclasses.replace(self, **kw)

    def debug(self) -> None:
        for f in dataclasses.fields(self):
            print(f"{f.name}: ", getattr(self, f.name))


# Registry, incl. the ja-fork small configs (reference `lit_llama/model.py:48-56`).
llama_configs = {
    "19M": dict(n_layer=6, n_head=8, n_embd=512, vocab_size=35000),
    "49M": dict(n_layer=10, n_head=10, n_embd=640, vocab_size=35000),
    "125M": dict(n_layer=12, n_head=10, n_embd=780, vocab_size=35000),
    "7B": dict(n_layer=32, n_head=32, n_embd=4096),
    "13B": dict(n_layer=40, n_head=40, n_embd=5120),
    "30B": dict(n_layer=60, n_head=52, n_embd=6656),
    "65B": dict(n_layer=80, n_head=64, n_embd=8192),
}

# n_embd -> canonical name, for shape-based checkpoint identification
# (reference `lit_llama/utils.py:19-36` `llama_model_lookup`).
llama_model_sizes = {
    cfg["n_embd"]: name for name, cfg in llama_configs.items()
}


def llama_model_lookup(n_embd: int) -> str:
    """Infer the config name from the embedding width of a checkpoint."""
    return llama_model_sizes[n_embd]
