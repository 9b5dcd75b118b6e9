"""Fused int4 unpack-matmul kernel parity tests (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lookaheaddecoding_tpu.ops.quant import dequantize_weight, quantize_weight
from lookaheaddecoding_tpu.ops.quant_matmul import (
    int4_matmul, int4_matmul_supported)


@pytest.mark.parametrize("pipeline", [False, True])
@pytest.mark.parametrize("t,k,n", [(1, 512, 256), (17, 512, 512),
                                   (240, 1024, 256)])
def test_int4_matmul_matches_dequant_path(t, k, n, pipeline):
    rng = np.random.RandomState(t)
    x = jnp.asarray(rng.randn(t, k).astype(np.float32))
    w = rng.randn(k, n).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=4)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32)
    out = int4_matmul(x, wq["q4"], wq["scale"], pipeline=pipeline,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int4_matmul_i16_unpack():
    """i16-lane nibble shifts must match the i32 formulation exactly,
    in both the plain and pipelined kernels."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(8, 512).astype(np.float32))
    w = rng.randn(512, 256).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=4)
    ref = int4_matmul(x, wq["q4"], wq["scale"], interpret=True)
    for pipeline in (False, True):
        out = int4_matmul(x, wq["q4"], wq["scale"], unpack_bits=16,
                          pipeline=pipeline, interpret=True)
        if jax.default_backend() == "cpu":
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        else:
            # interpret mode still runs its dots on the real backend,
            # where plain vs pipelined accumulation tile differently —
            # identical nibbles, reassociated f32 sums (TPU run r4)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-2, atol=1e-3)
    with pytest.raises(ValueError, match="unpack_bits"):
        int4_matmul(x, wq["q4"], wq["scale"], unpack_bits=8, interpret=True)


def test_int4_matmul_multi_nblock_pipeline():
    """Pipeline accumulator must reset per N block (grid dim 0)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(9, 512).astype(np.float32))
    w = rng.randn(512, 512).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=4)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32)
    out = int4_matmul(x, wq["q4"], wq["scale"], block_n=256, block_k=128,
                      pipeline=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t,k,n", [(1, 512, 256), (17, 512, 512),
                                   (56, 1024, 256)])
def test_int8_matmul_matches_dequant_path(t, k, n):
    from lookaheaddecoding_tpu.ops.quant_matmul import (
        int8_matmul, int8_matmul_supported)
    rng = np.random.RandomState(t)
    x = jnp.asarray(rng.randn(t, k).astype(np.float32))
    w = rng.randn(k, n).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=8)
    assert int8_matmul_supported(k, wq["q"].shape)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32)
    out = int8_matmul(x, wq["q"], wq["scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int8_impl_env_dispatch(monkeypatch):
    """LADE_INT8_IMPL=kernel routes qmatmul through the Pallas int8 path
    (on non-CPU backends; CPU falls through to dequant — asserted by the
    dispatch staying numerically correct either way)."""
    from lookaheaddecoding_tpu.ops import quant
    rng = np.random.RandomState(5)
    k, n = 512, 256
    x = jnp.asarray(rng.randn(4, k).astype(np.float32))
    wq = quantize_weight(rng.randn(k, n).astype(np.float32) * 0.2, bits=8)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32)
    monkeypatch.setattr(quant, "INT8_IMPL", "kernel")
    out = quant.qmatmul(x, wq, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_supported_predicate():
    assert int4_matmul_supported(512, (256, 256))
    assert not int4_matmul_supported(512, (256, 100))   # N not tiled
    assert not int4_matmul_supported(100, (50, 256))    # K not tiled
    assert not int4_matmul_supported(512, (200, 256))   # half mismatch
    # Pad-extended rows are accepted ONLY with the sentinel's proof the
    # weight was packed for THIS k; legacy dicts need exact k2p == k/2.
    assert not int4_matmul_supported(512, (384, 256))             # legacy
    assert int4_matmul_supported(512, (384, 256), logical_k2=256)
    # q4 packed for a LARGER K must be rejected, not silently mis-multiplied
    assert not int4_matmul_supported(512, (384, 256), logical_k2=384)


def test_dequantize_auto_strips_pad_and_checks_k():
    """The q4_pad sentinel makes pad stripping caller-independent: a padded
    weight dequantized WITHOUT k must come back at the logical shape, and a
    mismatched k must raise instead of slicing garbage."""
    rng = np.random.RandomState(2)
    k, n = 5888, 128
    w = rng.randn(k, n).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=4)
    assert wq["q4"].shape == (3072, n)                  # padded
    assert wq["q4_pad"].shape == (3072 - k // 2, 0)     # zero-element
    deq = dequantize_weight(wq, dtype=jnp.float32)      # no k needed
    assert deq.shape == (k, n)
    np.testing.assert_allclose(np.asarray(deq), w, atol=0.1)
    with pytest.raises(ValueError, match="packed for input dim"):
        dequantize_weight(wq, k=2 * 3072)


def test_pad_packed_rows_rules():
    from lookaheaddecoding_tpu.ops.quant_matmul import pad_packed_rows
    # clean dims stay untouched
    assert pad_packed_rows(2048) == 2048     # single block
    assert pad_packed_rows(2816) == 2816
    assert pad_packed_rows(256) == 256       # fits one block, no pad
    assert pad_packed_rows(5632) == 5632     # 2 x 2816 exact
    # Llama-2-7B down projection: 11008/2 = 5504 = 128*43 (43 prime) —
    # untileable without padding; pads to 2 blocks of 2816
    assert pad_packed_rows(5504) == 5632
    # Qwen2-7B: 18944/2 = 9472 tiles only as 37 x 256; padding buys
    # 5 big blocks of 1920 for 1.4% extra rows
    assert pad_packed_rows(9472) == 9600


def test_int4_matmul_padded_rows_parity():
    """K=5888 packs to k2=2944 = 128*23 (23 prime): quantize_weight pads
    the packed rows to 3072 and both the kernel and the dequant fallback
    must reproduce the unpadded result exactly."""
    from lookaheaddecoding_tpu.ops.quant import qmatmul
    rng = np.random.RandomState(11)
    k, n = 5888, 256
    x = jnp.asarray(rng.randn(9, k).astype(np.float32))
    w = rng.randn(k, n).astype(np.float32) * 0.2
    from lookaheaddecoding_tpu.ops.quant import logical_packed_rows
    wq = quantize_weight(w, bits=4)
    assert wq["q4"].shape == (3072, n)           # padded
    assert int4_matmul_supported(k, wq["q4"].shape,
                                 logical_k2=logical_packed_rows(wq))
    ref = x @ dequantize_weight(wq, dtype=jnp.float32, k=k)
    assert dequantize_weight(wq, dtype=jnp.float32, k=k).shape == (k, n)
    out = int4_matmul(x, wq["q4"], wq["scale"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # qmatmul fallback (CPU backend) slices the pad rows via k
    out2 = qmatmul(x, wq)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # padded quantization loses nothing vs the unpadded reference values
    ref_w = np.asarray(dequantize_weight(wq, dtype=jnp.float32, k=k))
    direct = quantize_weight(w[: k // 2], bits=4)  # clean half, no pad
    assert np.all(np.abs(ref_w) <= np.abs(w).max() + 1e-3)


def test_int4_matmul_padded_rows_stacked():
    """Stacked [L, K, N] trees pad on axis -2 like the 7B builder's
    per-leaf quantization."""
    rng = np.random.RandomState(5)
    k, n = 5888, 128
    w = rng.randn(2, k, n).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=4)
    assert wq["q4"].shape == (2, 3072, n)
    deq = dequantize_weight(wq, dtype=jnp.float32, k=k)
    assert deq.shape == (2, k, n)
    np.testing.assert_allclose(np.asarray(deq[1]), w[1], atol=0.1)


@pytest.mark.parametrize("t,k,n", [(8, 512, 256), (9, 5888, 256)])
def test_int4_bitcast_matmul_matches_dequant(t, k, n):
    """XLA-native s4 path (quant._int4_bitcast_matmul): bitcast the packed
    bytes to int4 nibble planes and contract each half separately. Must
    match the explicit-dequant reference at tileable AND padded K (padding
    appends zero packed rows AFTER split-half packing, so the :k//2 plane
    slice is exact).

    The packed weights MUST be jit ARGUMENTS here: XLA's constant folder
    mis-orders int8->int4 bitcast nibbles on closure-embedded constants
    (observed on the 2026-08 CPU backend; traced operands are correct on
    CPU and TPU). The engine always passes params as jit arguments, so
    production is on the traced path."""
    from lookaheaddecoding_tpu.ops.quant import _int4_bitcast_matmul

    rng = np.random.RandomState(t)
    x = jnp.asarray(rng.randn(t, k).astype(np.float32))
    w = rng.randn(k, n).astype(np.float32) * 0.2
    wq = quantize_weight(w, bits=4)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32, k=k)
    out = jax.jit(
        lambda x, wq: _int4_bitcast_matmul(x, wq, jnp.float32))(x, wq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int4_impl_env_dispatch(monkeypatch):
    """LADE_INT4_IMPL=bitcast routes qmatmul through the s4 path."""
    from lookaheaddecoding_tpu.ops import quant

    rng = np.random.RandomState(3)
    k, n = 512, 256
    x = jnp.asarray(rng.randn(4, k).astype(np.float32))
    wq = quantize_weight(rng.randn(k, n).astype(np.float32) * 0.2, bits=4)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32, k=k)
    monkeypatch.setattr(quant, "INT4_IMPL", "bitcast")
    out = quant.qmatmul(x, wq, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int8_auto_blocks_respect_vmem_bound():
    """The auto block sizing and the supported-predicate must agree, and
    neither may hand the kernel an over-VMEM block. Regression: N = 128 x
    prime cannot shrink below its only lane-aligned divisor, so the old
    guard gave up and compiled a ~105 MB block (K=8192, N=8576=128x67)
    while int8_matmul_supported still said True -> Mosaic crash instead of
    the XLA fallback."""
    from lookaheaddecoding_tpu.ops.quant_matmul import (
        _int8_blocks, int8_matmul_supported)
    bk, bn = _int8_blocks(8192, 8576)       # shrinks K once N is stuck
    assert bk * bn <= 8 * 1024 * 1024
    assert 8192 % bk == 0 and 8576 % bn == 0
    assert int8_matmul_supported(8192, (8192, 8576))
    # genuinely unshrinkable: K at the 256 floor, N a huge 128 x prime
    assert _int8_blocks(256, 128 * 1009) is None
    assert not int8_matmul_supported(256, (256, 128 * 1009))
    # supported() mirrors the sizing for the ordinary shapes too
    for k, n in ((512, 256), (2048, 5632), (4096, 11008)):
        blocks = _int8_blocks(k, n)
        assert blocks and blocks[0] * blocks[1] <= 8 * 1024 * 1024
        assert int8_matmul_supported(k, (k, n))


def test_int8_auto_blocks_account_for_t_axis():
    """The T-scaled buffers (double-buffered x blocks, f32 accumulator,
    output) are part of the VMEM budget: blocks fine at decode T must
    shrink — or the predicate must refuse — at prefill-sized T, instead of
    letting qmatmul dispatch a kernel Mosaic cannot fit (7B prefill_chunk
    4096: x blocks alone would be ~134 MB at the decode-T blocking)."""
    from lookaheaddecoding_tpu.ops.quant_matmul import (
        _int8_blocks, int8_matmul_supported)

    def vmem(bk, bn, t):
        tp = max(8, -(-t // 8) * 8)
        return 3 * bk * bn + 4 * tp * bk + 8 * tp * bn

    # decode sizes: T plays no role, blocking matches the benched configs
    assert _int8_blocks(4096, 32000, t=56) == _int8_blocks(4096, 32000)
    for t in (1, 56, 4096):
        blocks = _int8_blocks(4096, 32000, t=t)
        if blocks is None:
            assert not int8_matmul_supported(4096, (4096, 32000), t=t)
            continue
        bk, bn = blocks
        assert vmem(bk, bn, t) <= 64 * 1024 * 1024
        assert int8_matmul_supported(4096, (4096, 32000), t=t)
    # un-shrinkable at huge T: predicate refuses rather than over-commits
    big_t = 512 * 1024
    assert _int8_blocks(256, 128 * 1009, t=big_t) is None
