"""lit_llama_ja_tpu — a TPU-native LLaMA framework (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capabilities of the reference `if001/lit-llama-ja`
(see SURVEY.md): model core, PEFT (LoRA / Adapter v1+v2), quantized inference
(INT8 weight-only + GPTQ INT4), packed streaming data pipeline, pretraining,
finetuning, evaluation, generation, and checkpoint conversion — redesigned TPU-first.
"""
from lit_llama_ja_tpu.core.config import (  # noqa: F401
    LLaMAConfig,
    find_multiple,
    llama_configs,
    llama_model_lookup,
)
from lit_llama_ja_tpu.models import llama  # noqa: F401

__version__ = "0.1.0"
