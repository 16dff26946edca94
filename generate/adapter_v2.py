#!/usr/bin/env python
"""Generate from base + adapter v2 weights (reference parity: generate/adapter_v2.py)."""
import sys
from functools import partial
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

from lit_llama_ja_tpu.cli.generate_finetuned import main_adapter
from lit_llama_ja_tpu.utils.cli import CLI

if __name__ == "__main__":
    CLI(partial(main_adapter, v2=True))
