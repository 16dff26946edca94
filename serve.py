#!/usr/bin/env python
"""Batch serving with continuous batching + int8 KV cache (new vs reference)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.serve_cli import main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
