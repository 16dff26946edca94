#!/usr/bin/env python
"""Convert HF LLaMA checkpoints (reference parity: scripts/convert_hf_checkpoint.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.convert_cli import convert_hf_checkpoint as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
