#!/usr/bin/env python
"""Distributed pretraining on packed datasets (reference parity: pretrain/redpajama.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.pretrain_cli import main as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
