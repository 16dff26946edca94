"""CLI smoke tests (reference analogue: `tests/test_generate.py:113-117` runs
`script.py -h` in a subprocess for every entry point)."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent

SCRIPTS = [
    "generate.py",
    "serve.py",
    "generate/full.py",
    "generate/lora.py",
    "generate/adapter.py",
    "generate/adapter_v2.py",
    "finetune/full.py",
    "finetune/lora.py",
    "finetune/adapter.py",
    "finetune/adapter_v2.py",
    "pretrain/redpajama.py",
    "pretrain/shakespeare.py",
    "evaluate/full.py",
    "evaluate/lora.py",
    "evaluate/adapter.py",
    "evaluate/adapter_v2.py",
    "quantize/gptq.py",
    "scripts/prepare_alpaca.py",
    "scripts/prepare_dolly.py",
    "scripts/prepare_redpajama.py",
    "scripts/prepare_ja.py",
    "scripts/prepare_shakespeare.py",
    "scripts/prepare_any_text.py",
    "scripts/convert_checkpoint.py",
    "scripts/convert_hf_checkpoint.py",
    "scripts/convert_lora_weights.py",
    "scripts/download.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    out = subprocess.run(
        [sys.executable, str(REPO / script), "-h"],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage:" in out.stdout


def test_cli_type_parsing(tmp_path):
    """Typed flags parse ints/floats/bools (regression: PEP-563 string annotations)."""
    from lit_llama_ja_tpu.utils.cli import CLI

    captured = {}

    def main(n: int = 1, lr: float = 0.5, name: str = "x", flag: bool = False):
        captured.update(n=n, lr=lr, name=name, flag=flag)

    CLI(main, args=["--n", "3", "--lr", "0.25", "--flag", "true"])
    assert captured == {"n": 3, "lr": 0.25, "name": "x", "flag": True}
