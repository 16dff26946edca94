#!/usr/bin/env python
"""Prepare the Dolly instruction dataset (reference parity: scripts/prepare_dolly.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.data.sft import prepare_dolly as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
