"""End-to-end generate-from-finetuned-checkpoint integration: real tokenizers-JSON
tokenizer + base checkpoint + LoRA npz through the CLI mains
(reference analogue: `tests/test_generate.py` end-to-end with mocks — here nothing
is mocked)."""
import json

import numpy as np
import jax
import pytest

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.io.checkpoint import save_checkpoint, save_state_npz
from lit_llama_ja_tpu.models.llama import init_params
from lit_llama_ja_tpu.models.lora import init_lora_params

CFG = LLaMAConfig(block_size=256, vocab_size=256, n_layer=2, n_head=2, n_embd=16)


def make_tokenizer_json(path):
    """A real HuggingFace tokenizers file: byte-level with the ja-fork specials."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    # train a minimal byte-level vocab from a tiny corpus
    from tokenizers.trainers import BpeTrainer

    trainer = BpeTrainer(
        vocab_size=CFG.vocab_size,
        special_tokens=["<PAD>", "<BOS>", "<EOS>", "<UNK>", "<MASK>"],
    )
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "instruction response"] * 50, trainer
    )
    tok.save(str(path))
    return path


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("genft")
    params = init_params(jax.random.PRNGKey(0), CFG)
    save_checkpoint(root / "base", params, CFG)
    lora = init_lora_params(jax.random.PRNGKey(1), CFG, r=2, alpha=4)
    save_state_npz(root / "lora.npz", lora)
    make_tokenizer_json(root / "tokenizer.json")
    return root


def test_tokenizer_roundtrip(artifacts):
    from lit_llama_ja_tpu.io.tokenizer import HFTokenizer

    tok = HFTokenizer(artifacts / "tokenizer.json")
    ids = tok.encode("hello world", bos=True, eos=True)
    assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
    assert "hello" in tok.decode(ids)


def test_generate_base_cli(artifacts, capsys):
    from lit_llama_ja_tpu.cli.generate_cli import main

    main(
        prompt="hello world",
        num_samples=1,
        max_new_tokens=5,
        checkpoint_path=str(artifacts / "base"),
        tokenizer_path=str(artifacts / "tokenizer.json"),
    )
    out = capsys.readouterr().out
    assert len(out.strip()) > 0


def test_generate_lora_cli(artifacts, capsys):
    from lit_llama_ja_tpu.cli.generate_finetuned import main_lora

    main_lora(
        prompt="do the task",
        lora_path=str(artifacts / "lora.npz"),
        checkpoint_path=str(artifacts / "base"),
        tokenizer_path=str(artifacts / "tokenizer.json"),
        max_new_tokens=5,
        temperature=0.0,
    )
    assert capsys.readouterr().out is not None


def test_generate_quantized_cli(artifacts, capsys):
    """llm.int8 load-time quantization through the CLI path."""
    from lit_llama_ja_tpu.cli.generate_cli import main

    main(
        prompt="hello",
        num_samples=1,
        max_new_tokens=4,
        checkpoint_path=str(artifacts / "base"),
        tokenizer_path=str(artifacts / "tokenizer.json"),
        quantize="llm.int8",
    )
    assert capsys.readouterr().out is not None


def test_generate_sharded_cli(artifacts, capsys):
    """--tp/--fsdp tensor-sharded generation through the CLI path matches the
    single-device greedy tokens exactly (8-device virtual mesh)."""
    from lit_llama_ja_tpu.cli.generate_cli import main

    kw = dict(
        prompt="hello world",
        num_samples=1,
        max_new_tokens=5,
        temperature=0.0,
        checkpoint_path=str(artifacts / "base"),
        tokenizer_path=str(artifacts / "tokenizer.json"),
    )
    main(**kw)
    want = capsys.readouterr().out
    main(**kw, tp=4, fsdp=2)
    got = capsys.readouterr().out
    assert got == want


def test_serve_sharded_cli(artifacts, capsys):
    """--tp/--fsdp through the serving CLI (paged engine) runs and prints
    per-request outputs identical to the single-device engine."""
    from lit_llama_ja_tpu.cli.serve_cli import main

    kw = dict(
        prompt="hello world",
        n_requests=2,
        max_new_tokens=4,
        max_batch=2,
        temperature=0.0,
        checkpoint_path=str(artifacts / "base"),
        tokenizer_path=str(artifacts / "tokenizer.json"),
        max_seq_length=64,
    )
    main(**kw)
    want = capsys.readouterr().out
    main(**kw, tp=4, fsdp=2)
    got = capsys.readouterr().out
    assert got == want


def test_serve_tp_pp_composed_cli(artifacts, capsys):
    """--tp composes with --pp-stages (pp wavefront manual over 'pp' only,
    tp under GSPMD — parallel/pp_decode.py pp × tp serving): same outputs as
    the single-device engine through the CLI."""
    from lit_llama_ja_tpu.cli.serve_cli import main

    kw = dict(
        prompt="hello world",
        n_requests=2,
        max_new_tokens=4,
        max_batch=2,
        temperature=0.0,
        checkpoint_path=str(artifacts / "base"),
        tokenizer_path=str(artifacts / "tokenizer.json"),
        max_seq_length=64,
    )
    main(**kw)
    want = capsys.readouterr().out
    main(**kw, tp=2, pp_stages=2, pp_microbatches=2)
    got = capsys.readouterr().out
    assert got == want


def test_generate_quantize_kv_cli(artifacts, capsys):
    """--quantize-kv int8/int4 through the generate CLI produce finite text
    (numerics differ from the fp cache by design — smoke + shape check)."""
    from lit_llama_ja_tpu.cli.generate_cli import main

    for mode in ("int8", "int4"):
        main(
            prompt="hello world",
            num_samples=1,
            max_new_tokens=4,
            temperature=0.0,
            checkpoint_path=str(artifacts / "base"),
            tokenizer_path=str(artifacts / "tokenizer.json"),
            quantize_kv=mode,
        )
        out = capsys.readouterr().out
        assert out.strip()
