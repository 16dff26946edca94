#!/usr/bin/env python
"""Generate from base + adapter weights (reference parity: generate/adapter.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.generate_finetuned import main_adapter as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
