"""Headline benchmark: LLaMA-7B GPTQ-int4 single-chip decode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md), so ``vs_baseline`` is
reported against the **memory-bandwidth roofline** for this chip: int4 decode is
HBM-bound on weight streaming, so speed-of-light tokens/s ~= HBM_BW / bytes(weights
touched per token). vs_baseline = measured / roofline (1.0 == speed of light).

Weights are synthesized directly in packed int4 form (no fp32 7B intermediate, which
would not fit HBM); the compute path is identical to a calibrated checkpoint.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_ja_tpu.core.config import LLaMAConfig
from lit_llama_ja_tpu.models.llama import forward_with_cache, init_kv_cache

# v5e (one chip): ~819 GB/s HBM bandwidth.
HBM_GBPS = 819.0


def synth_int4_params(config: LLaMAConfig, key, tile_cols: int = -1):
    """Random packed-int4 model params (qweight/scales/zeros layout of quant/linear.py)."""
    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    ks = iter(jax.random.split(key, 16))

    def qlin(k, kin, nout):
        n_tiles = 1 if tile_cols == -1 else (kin + tile_cols - 1) // tile_cols
        return {
            "qweight": jax.random.randint(k, (kin // 2, nout), 0, 255, jnp.int32).astype(jnp.uint8),
            "scales": jnp.full((n_tiles, nout), 0.01, jnp.float32),
            "zeros": jnp.full((n_tiles, nout), 7.0, jnp.float32),
        }

    def qlin_stack(k, kin, nout):
        lin = qlin(k, kin, nout)
        return jax.tree.map(lambda a: jnp.broadcast_to(a[None], (L, *a.shape)), lin)

    std = 0.02
    return {
        "wte": {"weight": (jax.random.normal(next(ks), (V, D), jnp.bfloat16) * std)},
        "lm_head": qlin(next(ks), D, V),
        "ln_f": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "blocks": {
            "rms_1": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attn": {
                "c_attn": qlin_stack(next(ks), D, 3 * D),
                "c_proj": qlin_stack(next(ks), D, D),
            },
            "rms_2": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "mlp": {
                "c_fc1": qlin_stack(next(ks), D, H),
                "c_fc2": qlin_stack(next(ks), D, H),
                "c_proj": qlin_stack(next(ks), H, D),
            },
        },
    }


def weight_bytes_per_token(config: LLaMAConfig) -> float:
    """Bytes of (packed int4) weights streamed from HBM per decoded token."""
    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    per_layer = (D * 3 * D + D * D + 2 * D * H + H * D) / 2  # int4 = 0.5 byte
    return L * per_layer + (D * V) / 2 + V * D * 2  # + lm_head int4 + wte bf16 row gather (negligible)


def synth_sub4_params(config: LLaMAConfig, key, bits: int, groupsize: int = -1):
    """Random packed int2/int3 params (pack formats of quant/linear.py:
    qweight (Kp//4, N) low-bit planes, int3 adds a (Kp//8, N) high-bit plane;
    K pads per `sub4_pad_rows` so the kernel keeps a 128-aligned k-grid).
    ``groupsize`` > 0 synthesizes the grouped scale/zero rows the quality-
    measured configs (e.g. int2-g64) actually stream."""
    from lit_llama_ja_tpu.quant.linear import sub4_pad_rows

    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    ks = iter(jax.random.split(key, 16))

    def qlin(k, kin, nout):
        Kp = sub4_pad_rows(kin, groupsize)
        n_tiles = 1 if groupsize <= 0 else Kp // groupsize
        d = {
            "qweight": jax.random.randint(k, (Kp // 4, nout), 0, 255, jnp.int32
                                          ).astype(jnp.uint8),
            "scales": jnp.full((n_tiles, nout), 0.01, jnp.float32),
            "zeros": jnp.full((n_tiles, nout), float(2 ** (bits - 1)), jnp.float32),
        }
        if bits == 3:
            d["qweight_hi"] = jax.random.randint(
                jax.random.fold_in(k, 1), (Kp // 8, nout), 0, 255, jnp.int32
            ).astype(jnp.uint8)
        return d

    def qlin_stack(k, kin, nout):
        lin = qlin(k, kin, nout)
        return jax.tree.map(lambda a: jnp.broadcast_to(a[None], (L, *a.shape)), lin)

    std = 0.02
    return {
        "wte": {"weight": (jax.random.normal(next(ks), (V, D), jnp.bfloat16) * std)},
        "lm_head": qlin(next(ks), D, V),
        "ln_f": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "blocks": {
            "rms_1": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attn": {
                "c_attn": qlin_stack(next(ks), D, 3 * D),
                "c_proj": qlin_stack(next(ks), D, D),
            },
            "rms_2": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "mlp": {
                "c_fc1": qlin_stack(next(ks), D, H),
                "c_fc2": qlin_stack(next(ks), D, H),
                "c_proj": qlin_stack(next(ks), H, D),
            },
        },
    }


def sub4_weight_bytes_per_token(config: LLaMAConfig, bits: int,
                                groupsize: int = -1) -> float:
    from lit_llama_ja_tpu.quant.linear import sub4_pad_rows

    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    Dp, Hp = sub4_pad_rows(D, groupsize), sub4_pad_rows(H, groupsize)
    frac = bits / 8.0
    per_layer = (Dp * 3 * D + Dp * D + 2 * Dp * H + Hp * D) * frac
    if groupsize > 0:  # grouped f32 scale+zero rows stream with the weights
        per_layer += (Dp // groupsize) * (3 * D + D + 2 * H) * 8
        per_layer += (Hp // groupsize) * D * 8
    return L * per_layer + Dp * V * frac + V * D * 2


def synth_mixed_params(config: LLaMAConfig, key, attn_bits=4, mlp_bits=2,
                       groupsize: int = -1):
    """Mixed per-projection synth (gptq.mix-a4m2h4[-g64] shape): attention +
    lm_head at int4, MLP at int2 (whole-row scales by default — grouped f32
    scale streams measurably drag decode, PERF.md round 5)."""
    p4 = synth_int4_params(config, key)
    p2 = synth_sub4_params(config, jax.random.fold_in(key, 1), mlp_bits, groupsize)
    assert attn_bits == 4 and mlp_bits == 2
    p4["blocks"]["mlp"] = p2["blocks"]["mlp"]
    return p4


def mixed_weight_bytes_per_token(config: LLaMAConfig, groupsize: int = -1) -> float:
    from lit_llama_ja_tpu.quant.linear import sub4_pad_rows

    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    Dp, Hp = sub4_pad_rows(D, groupsize), sub4_pad_rows(H, groupsize)
    attn = (D * 3 * D + D * D) / 2  # int4
    mlp = (2 * Dp * H + Hp * D) / 4.0  # int2
    if groupsize > 0:
        mlp += ((Dp // groupsize) * 2 * H + (Hp // groupsize) * D) * 8  # f32 s+z
    return L * (attn + mlp) + (D * V) / 2 + V * D * 2


def synth_int8_params(config: LLaMAConfig, key):
    """Random int8 weight-only params (qweight int8 (K, N) + absmax scales)."""
    L, D, H, V = config.n_layer, config.n_embd, config.n_hidden, config.padded_vocab_size
    ks = iter(jax.random.split(key, 16))

    def qlin(k, kin, nout):
        return {
            "qweight": jax.random.randint(k, (kin, nout), -127, 128, jnp.int32).astype(jnp.int8),
            "scales": jnp.full((1, nout), 0.01, jnp.float32),
            "zeros": jnp.zeros((1, nout), jnp.float32),
        }

    def qlin_stack(k, kin, nout):
        lin = qlin(k, kin, nout)
        return jax.tree.map(lambda a: jnp.broadcast_to(a[None], (L, *a.shape)), lin)

    std = 0.02
    return {
        "wte": {"weight": (jax.random.normal(next(ks), (V, D), jnp.bfloat16) * std)},
        "lm_head": qlin(next(ks), D, V),
        "ln_f": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "blocks": {
            "rms_1": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attn": {
                "c_attn": qlin_stack(next(ks), D, 3 * D),
                "c_proj": qlin_stack(next(ks), D, D),
            },
            "rms_2": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "mlp": {
                "c_fc1": qlin_stack(next(ks), D, H),
                "c_fc2": qlin_stack(next(ks), D, H),
                "c_proj": qlin_stack(next(ks), H, D),
            },
        },
    }


def measure_decode(params, config, batch, seq, decode_steps, quantized_kv="int4"):
    cache = init_kv_cache(config, batch, seq, quantized=quantized_kv)
    tok = jnp.zeros((batch, 1), jnp.int32)

    def step(params, cache, tok, pos):
        logits, cache = forward_with_cache(params, tok, pos, cache, config)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        return cache, nxt

    step = jax.jit(step, donate_argnums=(1,))

    # warmup / compile. NOTE: sync via host transfer — on the axon remote platform
    # `block_until_ready` returns before execution completes; np.asarray is the
    # reliable barrier. Steps chain data (tok, cache), so the final transfer
    # bounds the whole sequence.
    pos = jnp.array([16], jnp.int32)
    cache, tok = step(params, cache, tok, pos)
    _ = np.asarray(tok)

    t0 = time.perf_counter()
    for i in range(decode_steps):
        cache, tok = step(params, cache, tok, jnp.array([17 + i], jnp.int32))
    _ = np.asarray(tok)
    return batch * decode_steps / (time.perf_counter() - t0)


def main():
    model = "7B"
    batch = 1
    seq = 2048
    decode_steps = 32

    config = LLaMAConfig.from_name(model)
    # `python bench.py int2|int3|int8` prints that config in the same JSON
    # format (for A/B runs); the no-arg default below stays the recorded
    # headline: BASELINE's metric is defined on gptq.int4.
    alt = sys.argv[1] if len(sys.argv) > 1 else None
    if alt in ("int2", "int3", "int2-g64", "mixed", "mixed-g64"):
        if alt.startswith("mixed"):
            gs = 64 if alt == "mixed-g64" else -1
            p = synth_mixed_params(config, jax.random.PRNGKey(0), groupsize=gs)
            roof = HBM_GBPS * 1e9 / mixed_weight_bytes_per_token(config, gs)
            tag = "gptq.mix-a4m2h4" + ("-g64" if gs == 64 else "")
        else:
            bits = int(alt[3])
            gs = 64 if alt.endswith("-g64") else -1
            p = synth_sub4_params(config, jax.random.PRNGKey(0), bits, gs)
            roof = HBM_GBPS * 1e9 / sub4_weight_bytes_per_token(config, bits, gs)
            tag = f"gptq.{alt}"
        tps = measure_decode(p, config, batch, seq, decode_steps)
        print(json.dumps({
            "metric": f"llama-{model}-{tag}-decode-tokens/s/chip",
            "value": round(tps, 2), "unit": "tokens/s",
            "vs_baseline": round(tps / roof, 4),
        }))
        return

    params = synth_int4_params(config, jax.random.PRNGKey(0))
    # north-star config: int4 weights + INT4 head-pair-packed KV cache
    # (round 3: decode-path ppl of int4-KV measured indistinguishable from fp
    # on a real checkpoint — QUALITY.md; int8-KV single-stream is 66.6 tok/s
    # on the same kernels, PERF.md)
    toks_per_s = measure_decode(params, config, batch, seq, decode_steps)
    del params

    # comparison points (stderr — the driver parses the single stdout JSON
    # line below): int8 weight-only must lose single-stream (2x the weight
    # bytes); int2 is the round-5 fewer-HBM-bytes lever (QUALITY.md 125M grid
    # carries its measured Δppl).
    params8 = synth_int8_params(config, jax.random.PRNGKey(1))
    toks_int8 = measure_decode(params8, config, batch, seq, decode_steps)
    del params8
    params2 = synth_sub4_params(config, jax.random.PRNGKey(2), 2)
    toks_int2 = measure_decode(params2, config, batch, seq, decode_steps)
    del params2
    print(
        f"# llama-{model}-llm.int8-decode-tokens/s/chip: {toks_int8:.2f}; "
        f"gptq.int2 {toks_int2:.2f} "
        "(comparison points; the one JSON line below is the headline)",
        file=sys.stderr,
    )

    roofline = HBM_GBPS * 1e9 / weight_bytes_per_token(config)
    print(
        json.dumps(
            {
                "metric": f"llama-{model}-gptq.int4-decode-tokens/s/chip",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(toks_per_s / roofline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
