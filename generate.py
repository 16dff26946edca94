#!/usr/bin/env python
"""Quantized/base autoregressive generation (reference parity: generate.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.generate_cli import main as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
