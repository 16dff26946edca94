"""Quantized linear parameterization + XLA matmul path.

TPU-native replacement for the reference's quantized linears:
  * `Linear8bitLt` (bitsandbytes, `lit_llama/quantization.py:36-75`) → symmetric
    per-output-channel INT8 absmax weights (`quantize_int8_absmax`).
  * `ColBlockQuantizedLinear` (`lit_llama/quantization.py:338-421`) → asymmetric
    4/8-bit packed weights with per-(col-tile, out-channel) scale/zero.

Layout is transposed from torch to the JAX (in, out) = (K, N) convention:
  * INT8: ``qweight`` int8/uint8 ``(K, N)``.
  * INT4: ``qweight`` uint8 ``(K // 2, N)`` — byte ``r`` packs K-rows ``2r`` (low
    nibble) and ``2r+1`` (high nibble), the same adjacent-pair packing as the
    reference's ``weight[:, nr::entries_per_byte] << (nr * bits)``
    (`lit_llama/quantization.py:385-388`), transposed.
  * ``scales`` / ``zeros``: ``(n_tiles, N)`` float, tiling K by ``tile_cols``
    (``n_tiles == 1`` when groupsize == -1). Dequant: ``w = (q - zero) * scale``.
  * Symmetric INT8 absmax is the special case ``zero == 0``, int8 storage.

The quantized tree contains ONLY arrays (bits are inferred from shapes), so it is a
clean pytree for jit/pjit — no static metadata threading.

`quant_matmul` is the XLA path (dequant + matmul, which XLA fuses); the Pallas fused
kernel in `ops/pallas/quant_matmul.py` is dispatched on TPU for the hot decode path.
"""
from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_MIX_RE = re.compile(r"^(gptq|rtn)\.mix-a([2348])m([2348])h([2348])$")


def parse_quant_mode(mode: str):
    """Parse a CLI quantization mode string into (scheme, bits, groupsize).

    Grammar: ``{gptq|rtn}.int{2,3,4,8}[-g<N>]`` plus the llm.int8 modes:

      * ``gptq.int4``        -> ("gptq", 4, -1)
      * ``gptq.int3``        -> ("gptq", 3, -1)
      * ``rtn.int2-g64``     -> ("rtn", 2, 64)
      * ``llm.int8``         -> ("llm.int8", 8, -1)   (static outlier cols)
      * ``llm.int8-rtn``     -> ("llm.int8-rtn", 8, -1)
      * ``llm.int8-dyn``     -> ("llm.int8-dyn", 8, -1) (per-forward bnb
        threshold-6.0 activation decomposition)

    Mixed per-projection-type bit widths (round 5 — the middle points between
    the int4 headline and the +25%-throughput int2 pack):

      * ``gptq.mix-a4m2h4-g64`` -> ("gptq", {"attn": 4, "mlp": 2, "head": 4}, 64)
      * ``gptq.mix``            -> alias for ``gptq.mix-a4m2h4-g64`` (the
        measured-recommended split: the MLP holds ~2/3 of 7B weight bytes)

    ``a``/``m``/``h`` set the attention projections (c_attn + attn c_proj),
    the MLP projections (c_fc1/c_fc2/mlp c_proj), and lm_head. The model is a
    stacked-layer `lax.scan`, so bits can vary by projection *type* but not by
    layer index (per-layer bits would destack the scan). In mixed mode the
    groupsize applies to the sub-4-bit projections only; >=4-bit projections
    keep whole-row scales (-1) and GPTQ actorder.
    """
    if mode in ("llm.int8", "llm.int8-rtn", "llm.int8-dyn"):
        return mode, 8, -1
    groupsize = -1
    body = mode
    if "-g" in mode:
        body, g = mode.rsplit("-g", 1)
        groupsize = int(g)
    if body.endswith(".mix"):
        body += "-a4m2h4"
        if groupsize == -1:
            groupsize = 64
    m = _MIX_RE.match(body)
    if m:
        scheme = m.group(1)
        bits = {"attn": int(m.group(2)), "mlp": int(m.group(3)),
                "head": int(m.group(4))}
        if all(b == next(iter(bits.values())) for b in bits.values()):
            bits = next(iter(bits.values()))  # degenerate mix == uniform
        return scheme, bits, groupsize
    try:
        scheme, ib = body.split(".")
        bits = int(ib.removeprefix("int"))
        assert scheme in ("gptq", "rtn") and bits in (2, 3, 4, 8)
    except (ValueError, AssertionError):
        raise ValueError(
            f"unknown quantization mode {mode!r} (expected "
            "{gptq|rtn}.int{2,3,4,8}[-g<N>], {gptq|rtn}.mix[-a<B>m<B>h<B>][-g<N>], "
            "llm.int8, llm.int8-rtn, or llm.int8-dyn)"
        ) from None
    return scheme, bits, groupsize


def resolve_bits(bits, name: str) -> int:
    """Per-projection bit width: ``bits`` is an int (uniform) or the mixed-mode
    dict keyed by projection type. ``name`` is a pipeline submodule name
    ("attn.c_attn", "mlp.c_fc1", ...) or "lm_head"."""
    if isinstance(bits, int):
        return bits
    key = "head" if name == "lm_head" else name.split(".", 1)[0]
    return bits[key]


def resolve_groupsize(bits, name: str, groupsize: int) -> int:
    """Mixed mode: groupsize applies to the sub-4-bit projections only (the
    >=4-bit ones keep whole-row scales and actorder)."""
    if isinstance(bits, int):
        return groupsize
    return groupsize if resolve_bits(bits, name) < 4 else -1


def mixed_mode_tag(bits) -> str:
    """Filesystem tag for a bits spec: 4 -> "4bit", mix dict -> "mix-a4m2h4"."""
    if isinstance(bits, int):
        return f"{bits}bit"
    return f"mix-a{bits['attn']}m{bits['mlp']}h{bits['head']}"


def _is_sub4_rows(rows: int, in_features: int) -> bool:
    """rows·4 covers a plausibly-padded K: [default pad, +one group quantum)."""
    return sub4_pad_rows(in_features) <= rows * 4 < in_features + 2048


def infer_bits(qweight: jax.Array, in_features: int) -> int:
    # exact matches first — the sub-4-bit row range is checked last so a
    # small-K int4 pack can never be mistaken for a padded int2 one
    if qweight.shape[0] == in_features:
        return 8
    if qweight.shape[0] * 2 == in_features:
        return 4
    if _is_sub4_rows(qweight.shape[0], in_features):
        return 2
    raise ValueError(
        f"qweight rows {qweight.shape[0]} incompatible with in_features {in_features}"
    )


def infer_bits_params(params: Dict[str, jax.Array], in_features: int) -> int:
    """Bit width of a quantized-linear leaf dict. int3 shares the int2 packed
    shape for its low bits and is distinguished by the ``qweight_hi`` plane."""
    if "qweight_hi" in params:
        assert _is_sub4_rows(params["qweight"].shape[-2], in_features)
        return 3
    return infer_bits(params["qweight"], in_features)


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------

# On-disk format tag for the int4 byte layout below. v1 (rounds 1-2, tag
# absent) stored BOTH nibbles plain; v2 (round 3+) stores the high nibble
# two's-complement biased. The quantized tree itself is deliberately
# metadata-free (ONLY arrays, see module docstring) so the tag travels in the
# checkpoint directory (`io/checkpoint.save_checkpoint` writes
# quant_format.json; the loader refuses int4 trees with a missing/mismatched
# tag — `tools/repack_int4.py` migrates v1 checkpoints in place).
INT4_PACK_VERSION = "hi-biased-v2"


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack unsigned 4-bit levels ``(K, N)`` -> uint8 ``(K//2, N)``.

    Byte layout (round 3): the LOW nibble stores the even-row level plain
    (q ∈ [0,15]); the HIGH nibble stores the odd-row level two's-complement
    biased, ``(q - 8) & 0xF``. With that bias, on-device
    ``(byte & 0xF0).astype(int8) == 16·(q_odd − 8)`` EXACTLY — which lets the
    decode kernel unpack both nibbles with two uint8 ANDs + u8→i8 casts and
    feed the MXU int8 operands, no shift anywhere (sub-32-bit shifts do not
    compile on this Mosaic toolchain; see quant_matmul_int4 ``int8dot_bias``
    and tools/bench_unpack_probe.py)."""
    q = q.astype(jnp.uint8)
    lo = q[0::2]
    hi = (q[1::2] - jnp.uint8(8)) & jnp.uint8(0xF)
    return lo | (hi << 4)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """uint8 ``(..., K//2, N)`` -> unsigned levels ``(..., K, N)`` uint8
    (inverse of `pack_int4`, including the biased high nibble; leading batch
    dims, e.g. a stacked layer axis, pass through)."""
    lo = packed & 0xF
    hi = ((packed >> 4) + 8) & 0xF
    K2, N = packed.shape[-2:]
    lead = packed.shape[:-2]
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, K2 * 2, N)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def sub4_pad_rows(K: int, groupsize: int = -1) -> int:
    """Padded K for the sub-4-bit pack formats.

    Multiples of 8 so the bit plane packs; large dims are rounded up to 1024
    so the TPU kernel's activation blocks hit Mosaic's 128-lane alignment rule
    with a MULTI-tile k-grid (pipelined weight streaming) even for dims like
    the 7B MLP's 11008 (11008/8 = 1376 has no 128-multiple divisor — without
    padding that matmul runs as one un-pipelined grid step). Padded rows hold
    level 0 and are sliced off on dequant; the kernel zero-pads the matching
    activation lanes, so they contribute exactly nothing.

    ``groupsize``: grouped layouts additionally pad so scale groups tile the
    padded K UNIFORMLY (the kernel's in-tile group slicing needs equal
    groups; e.g. the 125M model's K=780 with groupsize 64 pads to 832 = 13
    whole groups). `infer_bits` accepts the resulting row-count range.
    """
    import math

    quantum = 1024 if K >= 2048 else 8
    if groupsize and groupsize > 0:
        quantum = math.lcm(quantum, groupsize)
    return _round_up(K, quantum)


def _pad_rows_to(q: jax.Array, rows: int) -> jax.Array:
    if q.shape[0] == rows:
        return q
    return jnp.pad(q, ((0, rows - q.shape[0]), (0, 0)))


def pack_int2(q: jax.Array) -> jax.Array:
    """Pack unsigned 2-bit levels ``(K, N)`` -> uint8 ``(sub4_pad_rows(K)//4, N)``.

    Byte ``r`` holds K-rows ``4r+j`` at bit positions ``2j``. Fields 0-2 store
    the level plain, so on-device ``(byte & (0x3 << 2j)).astype(int8)`` is
    ``4^j · q_j`` with no shift; field 3 is stored bias-2, ``(q3 - 2) & 0x3``,
    so ``(byte & 0xC0)`` BITCAST to int8 equals ``64·(q3 − 2)`` exactly (the
    mod-256 wrap IS the wanted signed value) — the same trick as the int4
    high nibble (`pack_int4`), extended to the top 2-bit field. Every plane
    therefore unpacks with one uint8 AND + one cast/bitcast; the ``4^-j``
    normalizations fold into the kernel's f32 accumulation scalars (sub-32-bit
    shifts do not compile on this Mosaic toolchain).
    """
    q = _pad_rows_to(q.astype(jnp.uint8), sub4_pad_rows(q.shape[0]))
    f0, f1, f2 = q[0::4], q[1::4], q[2::4]
    f3 = (q[3::4] - jnp.uint8(2)) & jnp.uint8(0x3)
    return f0 | (f1 << 2) | (f2 << 4) | (f3 << 6)


def unpack_int2(packed: jax.Array) -> jax.Array:
    """uint8 ``(..., K//4, N)`` -> unsigned levels ``(..., K, N)`` uint8."""
    f0 = packed & 0x3
    f1 = (packed >> 2) & 0x3
    f2 = (packed >> 4) & 0x3
    f3 = ((packed >> 6) + 2) & 0x3
    K4, N = packed.shape[-2:]
    lead = packed.shape[:-2]
    return jnp.stack([f0, f1, f2, f3], axis=-2).reshape(*lead, K4 * 4, N)


def pack_int3(q: jax.Array) -> Dict[str, jax.Array]:
    """Pack unsigned 3-bit levels ``(K, N)`` as ``q = q2 + 4·hi``:

      * ``qweight``: the low 2 bits, int2-packed ``(K//4, N)`` (`pack_int2`).
      * ``qweight_hi``: the high bit as a bit-plane ``(K//8, N)`` — byte ``r``
        holds the high bits of K-rows ``8r+i`` at bit ``i``. On-device
        ``(byte & (1 << i)).astype(int8)`` is ``2^i · b_i`` for ``i < 7`` and
        the ``i = 7`` mask BITCAST to int8 is ``−128·b_7`` — all shift-free;
        the ``±2^-i`` normalizations fold into f32 accumulation scalars.

    3 bits/weight of HBM traffic total; both halves stream as dense uint8
    tiles with the same (K-major, N-lane) layout as the int4 format.
    """
    q = _pad_rows_to(q.astype(jnp.uint8), sub4_pad_rows(q.shape[0]))
    hi = q >> 2  # (K, N) in {0, 1}
    parts = [(hi[i::8] << i) for i in range(8)]
    hi_packed = parts[0]
    for p in parts[1:]:
        hi_packed = hi_packed | p
    return {"qweight": pack_int2(q & jnp.uint8(0x3)), "qweight_hi": hi_packed}


def unpack_int3(packed: jax.Array, packed_hi: jax.Array) -> jax.Array:
    """Inverse of `pack_int3` -> unsigned levels ``(..., K, N)`` uint8."""
    q2 = unpack_int2(packed)
    K8, N = packed_hi.shape[-2:]
    lead = packed_hi.shape[:-2]
    bits = jnp.stack(
        [(packed_hi >> i) & 1 for i in range(8)], axis=-2
    ).reshape(*lead, K8 * 8, N)
    return q2 + (bits << 2)


# ---------------------------------------------------------------------------
# Quantize / dequantize
# ---------------------------------------------------------------------------

def quantize_int8_absmax(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel absmax INT8 (the LLM.int8 weight-only scheme,
    minus the fp16 outlier decomposition — weight-only inference needs none).

    w: ``(K, N)`` float -> {qweight int8 (K, N), scales (1, N), zeros (1, N)=0}.
    """
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {
        "qweight": q,
        "scales": scale,
        "zeros": jnp.zeros_like(scale),
    }


def quantize_int8_outlier(w: jax.Array, outlier_frac: float = 0.005) -> Dict[str, jax.Array]:
    """Outlier-aware LLM.int8: mixed-precision on the ~0.5% most scale-setting
    input channels (reference `Linear8bitLt`'s threshold-6.0 decomposition,
    `lit_llama/quantization.py:36-75`, bitsandbytes semantics).

    TPU-native redesign of the outlier split: bnb selects outlier columns of
    the ACTIVATION at runtime (data-dependent shapes — jit-hostile on XLA).
    Here the outlier set is chosen once at quantize time from the weights —
    the input channels that set (or nearly set) the per-output-channel absmax
    scales. Those rows are kept in bf16 (``outlier_w``, gathered by
    ``outlier_idx``) and ZEROED in the int8 tensor before scaling, so the
    remaining bulk quantizes against strictly smaller scales. Shapes stay
    static; the bulk still streams through the int8 Pallas kernel.

    w: ``(K, N)`` float -> {qweight int8, scales, zeros, outlier_idx (n_out,),
    outlier_w (n_out, N) bf16}.
    """
    w = jnp.asarray(w)
    K, N = w.shape
    n_out = max(1, int(round(outlier_frac * K)))
    absw = jnp.abs(w)
    col_absmax = jnp.maximum(absw.max(axis=0, keepdims=True), 1e-12)
    # how close each row comes to setting any column's scale
    score = (absw / col_absmax).max(axis=1)
    idx = jax.lax.top_k(score, n_out)[1].astype(jnp.int32)
    outlier_w = w[idx].astype(jnp.bfloat16)
    bulk = w.at[idx].set(0.0)
    out = quantize_int8_absmax(bulk)
    out["outlier_idx"] = idx
    out["outlier_w"] = outlier_w
    return out


def quantize_int8_dynamic(
    w: jax.Array, threshold: float = 6.0, max_outlier_frac: float = 0.01
) -> Dict[str, jax.Array]:
    """Plain absmax int8 weights + ACTIVATION-dynamic outlier metadata.

    This is the faithful bitsandbytes `Linear8bitLt` scheme the reference
    wraps (`lit_llama/quantization.py:36-75`): weights are plain per-channel
    absmax int8, and at every forward the input columns whose activation
    magnitude exceeds ``threshold`` (bnb default 6.0) are pulled out of the
    int8 matmul and computed in 16-bit against dequantized weight rows.

    bnb materializes a data-dependent number of outlier columns — jit-hostile
    on XLA. The TPU-native formulation keeps shapes static: a fixed budget of
    ``max_outlier_frac·K`` candidate columns is selected per forward with
    ``top_k`` on the activation column peaks, then gated by the threshold
    (non-qualifying candidates multiply by zero). Semantics match bnb exactly
    whenever the true outlier count is within the budget — emergent-outlier
    models show ~0.1-1% outlier dims (Dettmers et al., LLM.int8()), so 1%
    is a generous cap. The two sentinel leaves keep the tree arrays-only.
    """
    out = quantize_int8_absmax(w)
    out["dyn_threshold"] = jnp.float32(threshold)
    out["dyn_budget"] = jnp.zeros(
        (max(1, int(round(max_outlier_frac * w.shape[0]))),), jnp.int8
    )
    return out


def _dynamic_outlier_split(x2: jax.Array, threshold, k_out: int):
    """Per-forward bnb-style decomposition: returns (bulk x with outlier
    columns zeroed, outlier column ids (k_out,), live gate (k_out,))."""
    peak = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=0)
    vals, idx = jax.lax.top_k(peak, k_out)
    live = (vals > threshold).astype(x2.dtype)  # threshold gate, static shape
    keep = jnp.ones((x2.shape[-1],), x2.dtype).at[idx].set(1.0 - live)
    return x2 * keep[None, :], idx, live


def find_qparams(w: jax.Array, bits: int, sym: bool = False):
    """Per-output-channel (axis=-1 of (K, N)) scale/zero over the K axis.

    Faithful to the reference's `find_params_weight` (`lit_llama/quantization.py:475-511`):
    min clipped to <=0, max to >=0; all-zero channels get [-1, 1]; asymmetric zero
    is ``round(-xmin / scale)``.
    Returns (scale, zero) of shape ``(1, N)``.
    """
    maxq = 2**bits - 1
    xmin = jnp.minimum(w.min(axis=0), 0.0)
    xmax = jnp.maximum(w.max(axis=0), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
    return scale[None, :].astype(jnp.float32), zero[None, :].astype(jnp.float32)


def quantize_colblock(
    w: jax.Array, bits: int, tile_cols: int = -1, sym: bool = False
) -> Dict[str, jax.Array]:
    """Round-to-nearest col-block quantization of ``(K, N)`` weights.

    (GPTQ produces better levels; this is the direct RTN equivalent of the
    reference's `ColBlockQuantizedLinear.pack_weight` + `find_params_weight`.)
    """
    K, N = w.shape
    if bits in (2, 3):
        # pad up front (zero rows) so the tile grid covers the padded K the
        # pack formats store — keeps grouped scales uniform over every k-tile
        w = _pad_rows_to(w, sub4_pad_rows(K, tile_cols))
        K = w.shape[0]
    tile = K if tile_cols == -1 else tile_cols
    n_tiles = (K + tile - 1) // tile
    scales, zeros, qs = [], [], []
    for t in range(n_tiles):
        chunk = w[t * tile : (t + 1) * tile]
        s, z = find_qparams(chunk, bits, sym)
        q = jnp.clip(jnp.round(chunk / s + z), 0, 2**bits - 1)
        scales.append(s)
        zeros.append(z)
        qs.append(q)
    q = jnp.concatenate(qs, axis=0)
    out = pack_prequantized(
        q,
        jnp.concatenate(scales, axis=0),
        jnp.concatenate(zeros, axis=0),
        bits,
    )
    return out


def pack_prequantized(
    q_levels: jax.Array, scales: jax.Array, zeros: jax.Array, bits: int,
    groupsize: int = -1,
) -> Dict[str, jax.Array]:
    """Pack already-chosen levels (e.g. from the GPTQ solver). q_levels: (K, N).

    ``groupsize``: for grouped sub-4-bit layouts, K pads so groups tile the
    stored rows uniformly (see `sub4_pad_rows`); the solver's ragged last
    group keeps its scale row — padded columns hold level 0 and matmul
    against zeroed activation lanes, contributing nothing either way."""
    if bits in (2, 3):
        K = q_levels.shape[0]
        Kp = sub4_pad_rows(K, groupsize)
        q_levels = _pad_rows_to(q_levels, Kp)
        if groupsize and groupsize > 0:
            need = Kp // groupsize
            extra = need - scales.shape[0]
            assert extra >= 0, (scales.shape, need, K, Kp, groupsize)
            if extra:
                scales = jnp.concatenate(
                    [scales, jnp.ones((extra, scales.shape[1]), scales.dtype)]
                )
                zeros = jnp.concatenate(
                    [zeros, jnp.zeros((extra, zeros.shape[1]), zeros.dtype)]
                )
    out = {"scales": scales, "zeros": zeros}
    if bits == 4:
        out["qweight"] = pack_int4(q_levels)
    elif bits == 3:
        out.update(pack_int3(q_levels))
    elif bits == 2:
        out["qweight"] = pack_int2(q_levels)
    else:
        out["qweight"] = q_levels.astype(jnp.uint8)
    return out


def _expand_tiles(t: jax.Array, K: int) -> jax.Array:
    """Expand (n_tiles, N) per-tile values to (K, N) by repeating each tile row."""
    n_tiles = t.shape[0]
    tile = -(-K // n_tiles)
    reps = jnp.repeat(t, tile, axis=0)
    return reps[:K]


def dequantize_with_k(
    params: Dict[str, jax.Array], in_features: int, dtype=jnp.float32
) -> jax.Array:
    """Reconstruct ``(K, N)`` float weights; ``in_features`` disambiguates packing."""
    qweight, scales, zeros = params["qweight"], params["scales"], params["zeros"]
    bits = infer_bits_params(params, in_features)
    if bits == 4:
        levels = unpack_int4(qweight).astype(jnp.float32)
    elif bits == 3:
        levels = unpack_int3(qweight, params["qweight_hi"]).astype(jnp.float32)
    elif bits == 2:
        levels = unpack_int2(qweight).astype(jnp.float32)
    else:
        levels = qweight.astype(jnp.float32)
    K = levels.shape[-2]  # padded K for the sub-4-bit formats
    w = (levels - _expand_tiles(zeros, K)) * _expand_tiles(scales, K)
    w = w[..., :in_features, :]
    if "outlier_w" in params:
        w = w.at[params["outlier_idx"]].set(
            params["outlier_w"].astype(w.dtype)
        )
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Matmul
# ---------------------------------------------------------------------------

import os

_FORCE_XLA = os.environ.get("LLJT_NO_PALLAS", "0") == "1"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def quant_matmul(x: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
    """``x @ dequant(params)``.

    On TPU this dispatches to the fused Pallas dequant-matmul kernels
    (`ops/pallas/quant_matmul.py`) — weights stream from HBM at int4/int8 width.
    Elsewhere (CPU tests) the XLA dequant path runs. Set LLJT_NO_PALLAS=1 to force
    the XLA path for A/B comparison.
    """
    K = x.shape[-1]
    if "dyn_threshold" in params:
        # Activation-dynamic LLM.int8 (bnb `Linear8bitLt` semantics): pull the
        # per-forward outlier columns out of the quantized matmul and run them
        # in 16-bit against dequantized weight rows. The bulk goes through the
        # W8A8 kernel (activations int8-rounded per k-group) — zeroing the
        # outlier columns is what shrinks its activation scales; the weight
        # rows need no masking since the zeroed x columns contribute nothing.
        x2 = x.reshape(-1, K)
        bulk, idx, live = _dynamic_outlier_split(
            x2, params["dyn_threshold"], params["dyn_budget"].shape[0]
        )
        base = {k: v for k, v in params.items() if not k.startswith("dyn_")}
        if _on_tpu() and not _FORCE_XLA:
            from lit_llama_ja_tpu.ops.pallas.quant_matmul import quant_matmul_int8

            y = quant_matmul_int8(
                bulk, base["qweight"], base["scales"], base["zeros"],
                out_dtype=x.dtype, unpack="int8dot",
            )
        else:
            y = bulk @ dequantize_with_k(base, K, dtype=x.dtype)
        w_rows = params["qweight"][idx].astype(x.dtype) * params["scales"][
            0
        ][None, :].astype(x.dtype)
        xs = x2[:, idx] * live[None, :]
        y = y + xs.astype(x.dtype) @ w_rows
        return y.reshape(*x.shape[:-1], y.shape[-1])
    if _on_tpu() and not _FORCE_XLA:
        from lit_llama_ja_tpu.ops.pallas.quant_matmul import (
            quant_matmul_int4,
            quant_matmul_int8,
        )
        from lit_llama_ja_tpu.ops.pallas.quant_matmul_sub4 import (
            quant_matmul_int2,
            quant_matmul_int3,
        )

        bits = infer_bits_params(params, K)
        if bits == 4:
            y = quant_matmul_int4(
                x, params["qweight"], params["scales"], params["zeros"],
                out_dtype=x.dtype,
            )
        elif bits == 3:
            y = quant_matmul_int3(
                x, params["qweight"], params["qweight_hi"],
                params["scales"], params["zeros"], out_dtype=x.dtype,
            )
        elif bits == 2:
            y = quant_matmul_int2(
                x, params["qweight"], params["scales"], params["zeros"],
                out_dtype=x.dtype,
            )
        else:
            y = quant_matmul_int8(
                x, params["qweight"], params["scales"], params["zeros"],
                out_dtype=x.dtype,
            )
        if "outlier_w" in params:
            # mixed-precision outlier term (quantize_int8_outlier): a thin
            # bf16 gather-matmul on ~0.5% of K, fused by XLA around the kernel
            y = y + x[..., params["outlier_idx"]] @ params["outlier_w"].astype(x.dtype)
        return y
    w = dequantize_with_k(params, K, dtype=x.dtype)
    return x @ w
