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
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
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


def test_supported_predicate():
    assert int4_matmul_supported(512, (256, 256))
    assert not int4_matmul_supported(512, (256, 100))   # N not tiled
    assert not int4_matmul_supported(100, (50, 256))    # K not tiled
    assert not int4_matmul_supported(512, (200, 256))   # half mismatch
