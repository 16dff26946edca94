"""GPTQ calibration CLI (reference `quantize/gptq.py:151-238`)."""
from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_sample_data() -> str:
    """C4 calibration text (reference `quantize/gptq.py:22-33`)."""
    from datasets import load_dataset

    traindata = load_dataset(
        "allenai/c4",
        data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
        split="train",
    )
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(traindata))[:1000]
    return "\n".join(traindata[int(i)]["text"] for i in idx)


def main(
    checkpoint_path: str = "checkpoints/lit-llama/7B/lit-llama.pth",
    output_path: Optional[str] = None,
    tokenizer_path: str = "checkpoints/lit-llama/tokenizer.json",
    n_samples: int = 128,
    quantize: str = "gptq.int4",
    groupsize: int = -1,
    calib_text_path: Optional[str] = None,
) -> None:
    """GPTQ-quantize all Linear layers of a checkpoint.

    Args:
        checkpoint_path: native dir or lit .pth to quantize.
        output_path: where to write the quantized native checkpoint.
        tokenizer_path: tokenizer for the calibration text.
        n_samples: calibration sequences of block_size tokens (default 128).
        quantize: "gptq.int{2,3,4,8}[-g<N>]" (round 5 extends the reference's
            bits in (4, 8), `lit_llama/quantization.py:338-345`, down to the
            sub-4-bit pack formats; a "-g<N>" suffix sets groupsize inline) or
            the mixed per-projection grammar "gptq.mix[-a<B>m<B>h<B>][-g<N>]"
            (attention / MLP / lm_head bit widths; bare "gptq.mix" =
            a4m2h4-g64).
        groupsize: column group size (-1 = per-channel whole-row).
        calib_text_path: local text file instead of downloading C4.
    """
    from lit_llama_ja_tpu.cli.generate_cli import load_model_any
    from lit_llama_ja_tpu.io.checkpoint import save_checkpoint
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer, Tokenizer
    from lit_llama_ja_tpu.quant.linear import parse_quant_mode
    from lit_llama_ja_tpu.quant.pipeline import gptq_quantize_model

    scheme, bits, mode_gs = parse_quant_mode(quantize)
    if scheme != "gptq":
        raise RuntimeError(f"unknown/unsupported quantization mode {quantize}")
    if mode_gs != -1:
        groupsize = mode_gs

    if output_path is None:
        from lit_llama_ja_tpu.quant.linear import mixed_mode_tag

        suffix = f"llama-gptq.{mixed_mode_tag(bits)}" + (
            f"-g{groupsize}" if groupsize != -1 else ""
        )
        output_path = str(Path(checkpoint_path).parent / suffix)

    print("Loading model ...", file=sys.stderr)
    params, config = load_model_any(Path(checkpoint_path))

    tok_path = Path(tokenizer_path)
    tokenizer = (
        Tokenizer(tok_path) if tok_path.suffix == ".model" else HFTokenizer(tok_path)
    )
    if calib_text_path:
        text = Path(calib_text_path).read_text()
    else:
        text = get_sample_data()
    encoded = tokenizer.encode(text, bos=True, eos=False)
    block_size = config.block_size  # 2048-token windows (reference gptq.py:215)
    n = min(n_samples, len(encoded) // block_size)
    calib = np.asarray(encoded[: n * block_size]).reshape(n, block_size)
    print(f"calibrating on {n} x {block_size} tokens", file=sys.stderr)

    t0 = time.perf_counter()
    qparams = gptq_quantize_model(
        params, config, jnp.asarray(calib, jnp.int32),
        bits=bits, groupsize=groupsize,
    )
    print(f"Time for quantization: {time.perf_counter() - t0:.02f} sec", file=sys.stderr)

    save_checkpoint(output_path, qparams, config)
    print(f"saved to {output_path}")


if __name__ == "__main__":
    from lit_llama_ja_tpu.utils.cli import CLI

    CLI(main)
