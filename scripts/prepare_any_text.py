#!/usr/bin/env python
"""Prepare arbitrary line-based text (reference parity: scripts/prepare_any_text.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.prepare_cli import prepare_any_text as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
