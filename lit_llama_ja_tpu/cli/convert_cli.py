"""Checkpoint conversion CLIs (reference `scripts/convert_checkpoint.py`,
`scripts/convert_hf_checkpoint.py`, `scripts/convert_lora_weights.py`)."""
from __future__ import annotations

import gc
import json
import shutil
from pathlib import Path
from typing import Optional

import numpy as np


def convert_meta_checkpoint(
    checkpoint_dir: str = "checkpoints/llama/7B",
    output_dir: str = "checkpoints/lit-llama/7B",
    model_size: str = "7B",
    to_native: bool = True,
) -> None:
    """Merge Meta `consolidated.*.pth` model-parallel shards and convert
    (reference `scripts/convert_checkpoint.py:66-135`). Writes a native orbax
    checkpoint (default) and/or a lit-compatible `.pth`."""
    import torch

    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.io.checkpoint import save_checkpoint
    from lit_llama_ja_tpu.io.convert import lit_state_dict_to_native, meta_checkpoints_to_lit

    ckpt_dir = Path(checkpoint_dir)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    checkpoint_files = sorted(ckpt_dir.glob("*.pth"))
    if not checkpoint_files:
        raise RuntimeError(f"No consolidated.*.pth found at {ckpt_dir}")

    shards = [
        torch.load(str(f), map_location="cpu", mmap=True, weights_only=True)
        for f in checkpoint_files
    ]
    lit_sd = meta_checkpoints_to_lit(shards)
    del shards
    gc.collect()

    config = LLaMAConfig.from_name(model_size)
    if to_native:
        params, _ = lit_state_dict_to_native(lit_sd, config)
        save_checkpoint(out / "native", params, config)
        print(f"saved native checkpoint to {out / 'native'}")
    else:
        torch.save({k: torch.from_numpy(v) for k, v in lit_sd.items()},
                   out / "lit-llama.pth")
        print(f"saved lit checkpoint to {out / 'lit-llama.pth'}")


def convert_hf_checkpoint(
    checkpoint_dir: str = "checkpoints/hf-llama/7B",
    output_dir: str = "checkpoints/lit-llama/7B",
    model_size: str = "7B",
    verify: bool = False,
) -> None:
    """HF LLaMA -> native checkpoint (reference `scripts/convert_hf_checkpoint.py`).

    Reads sharded `pytorch_model*.bin` via the weight-map index, un-permutes q/k,
    fuses qkv, writes a native checkpoint. ``verify`` compares logits against
    transformers on a random sample (reference `:141-160`).
    """
    import torch

    from lit_llama_ja_tpu.core.config import LLaMAConfig
    from lit_llama_ja_tpu.io.checkpoint import save_checkpoint
    from lit_llama_ja_tpu.io.convert import hf_state_dict_to_lit, lit_state_dict_to_native

    ckpt_dir = Path(checkpoint_dir)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    index_path = ckpt_dir / "pytorch_model.bin.index.json"
    if index_path.exists():
        with open(index_path) as f:
            bin_index = json.load(f)
        bin_files = sorted({ckpt_dir / b for b in bin_index["weight_map"].values()})
    else:
        bin_files = sorted(ckpt_dir.glob("pytorch_model*.bin"))
    if not bin_files:
        raise RuntimeError(f"no pytorch_model*.bin under {ckpt_dir}")

    sd = {}
    for bf in bin_files:
        print(f"Processing {bf}")
        sd.update(torch.load(str(bf), map_location="cpu", mmap=True, weights_only=True))

    config = LLaMAConfig.from_name(model_size)
    lit_sd = hf_state_dict_to_lit(sd, config)
    params, _ = lit_state_dict_to_native(lit_sd, config)
    save_checkpoint(out / "native", params, config)
    print(f"saved native checkpoint to {out / 'native'}")

    if verify:
        import jax.numpy as jnp
        from transformers import LlamaForCausalLM

        from lit_llama_ja_tpu.models.llama import forward

        token_sample = np.random.default_rng(0).integers(
            0, config.vocab_size, size=(1, 64)
        )
        ours = np.asarray(forward(params, jnp.asarray(token_sample, jnp.int32), config))
        model_hf = LlamaForCausalLM.from_pretrained(str(ckpt_dir))
        with torch.no_grad():
            theirs = model_hf(torch.from_numpy(token_sample)).logits.numpy()
        np.testing.assert_allclose(
            ours[..., : config.vocab_size], theirs, atol=5e-3, rtol=1e-2
        )
        print("verified: logits match transformers")


def convert_lora_weights(
    lora_path: str = "out/lora/alpaca/final.npz",
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    output_path: str = "out/lora/alpaca/merged",
) -> None:
    """Merge LoRA weights into standalone full weights
    (reference `scripts/convert_lora_weights.py`)."""
    import jax
    import jax.numpy as jnp

    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.io.checkpoint import load_state_npz, save_checkpoint
    from lit_llama_ja_tpu.models.lora import add_lora, merge_lora

    params, config = load_model_any(Path(checkpoint_path))
    lora_state = jax.tree.map(jnp.asarray, load_state_npz(lora_path))
    merged = merge_lora(add_lora(params, lora_state))
    save_checkpoint(output_path, merged, config)
    print(f"saved merged checkpoint to {output_path}")


def download_weights(
    repo_id: str = "openlm-research/open_llama_7b",
    local_dir: str = "checkpoints/open-llama/7B",
) -> None:
    """HF-hub snapshot download (reference `scripts/download.py`)."""
    from huggingface_hub import snapshot_download

    snapshot_download(repo_id, local_dir=local_dir)
