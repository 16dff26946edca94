#!/usr/bin/env python
"""Prepare Japanese corpora packed dataset (reference parity: scripts/prepare_ja.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.prepare_cli import prepare_ja as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
