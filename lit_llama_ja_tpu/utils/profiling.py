"""Profiling / tracing utilities (SURVEY.md §5: the reference has none beyond
wall-clock prints; this adds jax.profiler traces + roofline accounting)."""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Reliable device barrier: pull one element to host.

    On remote PJRT platforms (axon tunnel) `block_until_ready` may return before
    execution completes; a host transfer is the dependable fence.
    """
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.tree.leaves(tree)[0].ravel()[0] if hasattr(leaf, "ravel") else leaf)


def timeit(fn, *args, iters: int = 10, warmup: int = 1, **kw) -> float:
    """Median wall-clock seconds per call with hard host synchronization."""
    for _ in range(warmup):
        sync(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@dataclass
class Roofline:
    """Roofline accounting for a kernel/step: report achieved vs peak."""

    flops: float = 0.0
    bytes_accessed: float = 0.0
    peak_flops: float = 197e12  # v5e bf16
    peak_bw: float = 819e9  # v5e HBM B/s

    def report(self, seconds: float) -> Dict[str, float]:
        achieved_flops = self.flops / seconds if self.flops else 0.0
        achieved_bw = self.bytes_accessed / seconds if self.bytes_accessed else 0.0
        t_compute = self.flops / self.peak_flops
        t_memory = self.bytes_accessed / self.peak_bw
        bound = "memory" if t_memory >= t_compute else "compute"
        sol = max(t_compute, t_memory) / seconds if seconds else 0.0
        return {
            "seconds": seconds,
            "tflops": achieved_flops / 1e12,
            "gbps": achieved_bw / 1e9,
            "bound": bound,
            "fraction_of_roofline": sol,
        }


def decode_step_roofline(config, quant_bits: int = 4, kv_bits: int = 16,
                         seq: int = 2048, batch: int = 1) -> Roofline:
    """Per-token decode roofline for a quantized LLaMA."""
    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    w_elems = L * (3 * D * D + D * D + 2 * D * H + H * D) + D * V
    kv_bytes = batch * 2 * L * config.n_head * seq * config.head_dim * (kv_bits // 8)
    return Roofline(
        flops=2.0 * batch * w_elems,
        bytes_accessed=w_elems * quant_bits / 8 + kv_bytes,
    )
