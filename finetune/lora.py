#!/usr/bin/env python
"""LoRA finetuning (reference parity: finetune/lora.py)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.finetune_cli import main_lora as main
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(main)
