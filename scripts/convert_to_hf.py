#!/usr/bin/env python
"""Export a native checkpoint as a HuggingFace LlamaForCausalLM state dict
(new capability — the reference converts HF -> lit only, `scripts/convert_hf_checkpoint.py`)."""
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    checkpoint_path: str = "checkpoints/lit-llama/7B/native",
    output_path: str = "checkpoints/hf-export/pytorch_model.bin",
    dtype: str = "float16",
) -> None:
    """Convert a native (orbax dir) or lit `.pth` checkpoint to HF format.

    Args:
        checkpoint_path: native checkpoint dir or lit-llama `.pth`.
        output_path: destination `pytorch_model.bin` (torch.save state dict);
            a matching `config.json` (HF LlamaConfig) is written alongside.
        dtype: float16 | bfloat16 | float32 tensor dtype for the export.
    """
    import json

    import torch

    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.io.convert import native_to_hf_state_dict

    params, config = load_model_any(Path(checkpoint_path), None)
    sd = native_to_hf_state_dict(params, config)
    tdt = getattr(torch, dtype)
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(v.copy()).to(tdt) for k, v in sd.items()}, out)
    hf_config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": config.vocab_size,
        "hidden_size": config.n_embd,
        "intermediate_size": config.n_hidden,
        "num_hidden_layers": config.n_layer,
        "num_attention_heads": config.n_head,
        "num_key_value_heads": config.n_head,
        "max_position_embeddings": config.block_size,
        "rms_norm_eps": config.norm_eps,
        "rope_theta": float(config.rope_base),
        "attention_bias": False,
        "mlp_bias": False,
        "tie_word_embeddings": False,
        "torch_dtype": dtype,
    }
    (out.parent / "config.json").write_text(json.dumps(hf_config, indent=2))
    print(f"wrote {out} and {out.parent / 'config.json'}")


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
