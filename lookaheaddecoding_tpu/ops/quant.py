"""Weight-only quantization (INT8 / INT4) for the decode path.

The reference has no quantization support (USE_AWQ is asserted False,
reference decoding.py:863-874); this framework makes it first-class because
single-chip decode throughput is HBM-bandwidth-bound: int8 weights halve and
int4 weights quarter the bytes-per-step.

Representation: a quantized linear layer replaces the plain ``[in, out]``
bf16 array with a dict of arrays (scan-compatible pytree; the key name
carries the bit width):

    int8: {"q":  int8[in, out],   "scale": f32[1, out]}
    int4: {"q4": int8[in/2, out], "scale": f32[1, out]}  (two nibbles/byte)

Per-output-channel symmetric scaling. Dequantization is expressed as
``q.astype(bf16) * scale`` right before the matmul so XLA fuses the convert
into the MXU operand load — weights stream from HBM at the quantized width.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("bits", "cap_k"))
def _quantize_fused(wf, bits: int, cap_k: int = 0):
    """Jitted so XLA streams the big stacks through fused elementwise ops —
    eager mode materializes every intermediate ([L, in, out] fp32 temps
    OOM'd the device on 3B-class trees). ``cap_k`` (the kernel K-block cap
    governing pad sizing) is a static argument so changing
    ``LADE_INT4_CAP_K``/``quant_matmul.CAP_K`` mid-process recompiles with
    the new padding instead of silently reusing a stale cached layout."""
    wf = wf.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    if bits == 8:
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.rint(wf / scale), -127, 127).astype(jnp.int8)
        return {"q": q, "scale": scale}
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.rint(wf / scale), -7, 7).astype(jnp.int8)
    # Split-half packing: byte row r holds input rows r (low nibble) and
    # r + K/2 (high nibble). Unpacking is then a plain concat of the two
    # nibble planes — no row interleave — which keeps the in-kernel
    # dequant (ops/quant_matmul.py) free of sublane shuffles.
    half = q.shape[-2] // 2
    lo = q[..., :half, :] & 0x0F
    hi = (q[..., half:, :] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    # Kernel-friendly row padding: dims like Llama-7B's 11008 pack to
    # 128*43 rows (43 prime) which the Pallas kernel cannot tile — zero
    # packed rows unpack to zero weights, so padding is exact
    # (ops/quant_matmul.py:pad_packed_rows; the matmul and the dequant
    # fallback both pad the activation halves to match).
    from .quant_matmul import pad_packed_rows
    k2p = pad_packed_rows(half, cap=cap_k)
    if k2p != half:
        widths = [(0, 0)] * (packed.ndim - 2) + [(0, k2p - half), (0, 0)]
        packed = jnp.pad(packed, widths)
    # Pad metadata travels IN THE SHAPE of a zero-element sentinel leaf
    # (size 0, so no HBM and no traced value): consumers recover the
    # logical packed-row count as q4.shape[-2] - q4_pad.shape[-2] without
    # caller cooperation, at trace time. A plain int leaf would become a
    # tracer under jit and could not drive static layout decisions.
    sentinel = packed.shape[:-2] + (k2p - half, 0)
    return {"q4": packed, "scale": scale,
            "q4_pad": jnp.zeros(sentinel, jnp.int8)}


def quantize_weight(w: jax.Array, bits: int = 8) -> Dict[str, Any]:
    """Symmetric per-output-channel quantization of an ``[..., in, out]``
    matrix (or stack of them — the reduction runs over axis -2). Pure jnp,
    ON DEVICE: weights never round-trip to the host (pulling a multi-GB
    param tree over the remote-TPU tunnel took minutes; on-device this is
    milliseconds)."""
    if bits not in (8, 4):
        raise ValueError(f"unsupported bits: {bits}")
    w = jnp.asarray(w)
    if bits == 4:
        assert w.shape[-2] % 2 == 0, "input dim must be even for int4 packing"
        from . import quant_matmul as qm
        return _quantize_fused(w, bits, cap_k=qm.CAP_K)
    return _quantize_fused(w, bits)


def logical_packed_rows(wq: Dict[str, Any]):
    """Logical (pre-padding) packed-row count of an int4 dict, or None for
    legacy dicts quantized before the ``q4_pad`` sentinel existed."""
    if "q4_pad" not in wq:
        return None
    return wq["q4"].shape[-2] - wq["q4_pad"].shape[-2]


def dequantize_weight(wq: Dict[str, Any], dtype=jnp.bfloat16,
                      k: int = 0) -> jax.Array:
    """Reconstruct the bf16 weight. int4 pad rows (pad_packed_rows) are
    stripped automatically via the ``q4_pad`` sentinel shape; ``k`` (the
    logical input dim) is cross-checked when given and required only for
    legacy dicts lacking the sentinel — a padded legacy dict without ``k``
    would silently return the padded layout (zero rows interleaved
    mid-matrix), so callers of old checkpoints should pass it."""
    if "q" in wq:
        return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)
    # int4: unpack the split-half nibble planes (axis -2 mirrors the
    # packing, so stacked [L, K/2, N] trees dequantize correctly too)
    packed = wq["q4"]
    k2 = logical_packed_rows(wq)
    if k:
        if k2 is not None and k != 2 * k2:
            raise ValueError(
                f"int4 weight packed for input dim {2 * k2}, got k={k}")
        k2 = k // 2
    lo = (packed << 4).astype(jnp.int8) >> 4        # sign-extend low nibble
    hi = packed >> 4                                 # arithmetic shift
    if k2 is not None and packed.shape[-2] != k2:
        lo = lo[..., :k2, :]
        hi = hi[..., :k2, :]
    q = jnp.concatenate([lo, hi], axis=-2)          # split-half layout
    return (q.astype(jnp.float32) * wq["scale"]).astype(dtype)


INT4_KERNEL_ENABLED = True
# Double-buffered unpack/MXU overlap in the int4 kernel (see
# ops/quant_matmul.py:_kernel_pipe). Off by default: measured e2e on the
# 1.1B bench model it LOSES to the serialized kernel (AR 267 vs 349 tok/s,
# LADE 492 vs 538) — the scratch round-trip and the drain grid step cost
# more than the VPU/MXU overlap buys at decode-size dots. Env override for
# A/B remeasurement on other shapes/hardware.
INT4_PIPELINE = os.environ.get("LADE_INT4_PIPELINE", "0") != "0"
# Nibble-unpack lane width inside the kernel: 32 (default) or 16. i16 lanes
# would halve the vector-op count of the unpack, but the current Mosaic
# toolchain FAILS to legalize i16 vector shifts on real TPU
# (vector<8x128x2xi16> lowering error; works in interpret mode) — measured
# 2026-08-17, scripts/int4_sweep.py. Keep 32 until the toolchain moves.
INT4_UNPACK_BITS = int(os.environ.get("LADE_INT4_UNPACK_BITS", "32"))


# int8 matmul implementation: "xla" (default) relies on XLA fusing the
# int8->bf16 convert into the MXU operand load; "kernel" routes through
# the Pallas int8 kernel (in-kernel convert + epilogue scale) — measured
# per-shape before switching any default.
INT8_IMPL = os.environ.get("LADE_INT8_IMPL", "xla")

# int4 matmul implementation: "kernel" = fused Pallas unpack-matmul;
# "bitcast" = XLA-native s4 operands (bitcast the packed bytes to
# jnp.int4 nibble planes and let XLA fuse the s4->bf16 convert into the
# MXU operand load — zero VPU unpack if the fusion happens);
# "dequant" = explicit dequantize (debug / CPU reference).
INT4_IMPL = os.environ.get("LADE_INT4_IMPL", "kernel")


@functools.partial(jax.jit, static_argnames=("dtype",))
def _int4_bitcast_matmul_impl(x, q4, scale, dtype):
    k = x.shape[-1]
    k2 = k // 2
    planes = jax.lax.bitcast_convert_type(q4, jnp.int4)   # [..., k2p, N, 2]
    lo = planes[..., :k2, :, 0].astype(dtype)
    hi = planes[..., :k2, :, 1].astype(dtype)
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    acc = (jax.lax.dot_general(x[..., :k2], lo, dims,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(x[..., k2:], hi, dims,
                                 preferred_element_type=jnp.float32))
    return (acc * scale).astype(dtype)


def _int4_bitcast_matmul(x: jax.Array, w, dtype) -> jax.Array:
    """x @ dequant(q4) expressed on jnp.int4 views of the packed bytes.

    Split-half packing (quantize_weight): byte row r = input row r (low
    nibble) + row r + K/2 (high nibble). ``bitcast_convert_type(int8 ->
    int4)`` exposes the nibbles as a trailing axis of 2 (LSB-first, so
    index 0 = low nibble = the signed low-half weight — verified against
    dequantize_weight in tests/test_quant_matmul.py). Two narrow dots per
    projection, one per nibble plane; per-output-channel scales factor out
    of the contraction exactly.

    The body is jitted with q4 as an ARGUMENT, which kills two birds:
    eager int4 arrays never reach the backend client (the axon remote-TPU
    client RecursionErrors on them — round-4 TPU test run), and the XLA
    *CPU* constant folder's nibble mis-ordering on closure-embedded q4
    CONSTANTS cannot trigger (correct on TPU and for traced operands on
    both backends — tests/test_quant_matmul.py pins both; PARITY.md
    documents the miscompile). An enclosing jit inlines this one, so the
    engine's fused paths are unchanged. Callers who close over q4 in
    their OWN jit on CPU still hit the folder bug — keep passing
    quantized params as arguments there."""
    return _int4_bitcast_matmul_impl(x, w["q4"], w["scale"], dtype)


def qmatmul(x: jax.Array, w, dtype=None) -> jax.Array:
    """``x @ w`` where w is a plain array or a quantized dict. int8 relies
    on XLA fusing the convert into the MXU load; int4 dispatches to the
    fused Pallas unpack-matmul kernel on TPU (the XLA nibble unpack does not
    fuse), falling back to explicit dequant on CPU / unsupported shapes."""
    if not isinstance(w, dict):
        return x @ w
    dtype = dtype or x.dtype
    if "q" in w and INT8_IMPL == "kernel" and dtype == x.dtype:
        # dtype != x.dtype falls through to the dequant path (the kernel
        # emits x.dtype); the guard keeps qmatmul's dtype contract
        # independent of LADE_INT8_IMPL.
        from .quant_matmul import int8_matmul, int8_matmul_supported
        if (jax.default_backend() != "cpu" and x.ndim == 2
                and int8_matmul_supported(x.shape[-1], w["q"].shape,
                                          t=x.shape[0])):
            return int8_matmul(x, w["q"], w["scale"])
    if "q4" in w and INT4_IMPL == "bitcast":
        return _int4_bitcast_matmul(x, w, dtype)
    if "q4" in w and INT4_KERNEL_ENABLED and INT4_IMPL == "kernel":
        from .quant_matmul import int4_matmul, int4_matmul_supported
        if (jax.default_backend() != "cpu"
                and int4_matmul_supported(x.shape[-1], w["q4"].shape,
                                          logical_k2=logical_packed_rows(w))):
            return int4_matmul(x, w["q4"], w["scale"],
                               pipeline=INT4_PIPELINE,
                               unpack_bits=INT4_UNPACK_BITS)
    return x @ dequantize_weight(w, dtype=dtype, k=x.shape[-1])


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
               "wqkv", "w_gate_up")


def quantize_params(params: Dict, bits: int = 8,
                    quantize_lm_head: bool = False,
                    lm_head_bits: int = 8) -> Dict:
    """Quantize the per-layer projection matrices (stacked [L, in, out] —
    quantized per layer per output channel). Embedding and norms stay in
    bf16; the lm_head optionally (``lm_head_bits`` defaults to 8 even for
    int4 weights: the [H, V] vocab matmul is XLA-fused at int8 while the
    int4 kernel's wide-N grid loses there, scripts/int4_micro.py). Works on
    fused layouts (``fuse_params`` first -> wqkv/w_gate_up quantize as one
    wide matrix; output-channel scales make it exactly equivalent)."""
    out = {k: v for k, v in params.items()}
    layers = dict(params["layers"])
    for key in _QUANT_KEYS:
        if key not in layers:
            continue
        # one vectorized on-device pass over the whole [L, in, out] stack
        # (per-layer per-output-channel scales via the axis -2 reduction)
        layers[key] = quantize_weight(layers[key], bits)
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"], lm_head_bits)
    return out


def quantized_bits(w) -> int:
    if not isinstance(w, dict):
        return 0
    return 8 if "q" in w else 4
