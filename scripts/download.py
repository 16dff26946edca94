#!/usr/bin/env python
"""Download weights from HF hub (reference parity: scripts/download.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.convert_cli import download_weights as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
