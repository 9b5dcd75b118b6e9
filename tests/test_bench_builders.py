"""The bench's leaf-streamed pre-quantized builder must produce EXACTLY the
tree that quantize_params(init_params(...)) would (same PRNG key usage, same
quantization, same fusion) — it exists only to cap the 7B build's transient
memory, not to change semantics."""

import sys
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import build_predictable_model, build_predictable_model_quantized  # noqa: E402
from lookaheaddecoding_tpu.models.llama import fuse_params  # noqa: E402
from lookaheaddecoding_tpu.ops.quant import quantize_params  # noqa: E402

ARCH = dict(hidden=64, inter=112, layers=3, heads=4, kv_heads=2)


@pytest.mark.parametrize("bits", [8, 4])
def test_prequantized_builder_matches_reference_route(bits):
    mcfg_a, params, nxt_a = build_predictable_model(seed=5, **ARCH)
    ref = quantize_params(params, bits=bits, quantize_lm_head=True,
                          lm_head_bits=8)
    if bits == 4:
        ref = fuse_params(ref)
    mcfg_b, mine, nxt_b = build_predictable_model_quantized(
        seed=5, bits=bits, **ARCH)
    assert mcfg_a == mcfg_b
    np.testing.assert_array_equal(nxt_a, nxt_b)
    ref_leaves = jax.tree.leaves_with_path(ref)
    my_leaves = jax.tree.leaves_with_path(mine)
    assert [p for p, _ in ref_leaves] == [p for p, _ in my_leaves]
    for (path, a), (_, b) in zip(ref_leaves, my_leaves):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"mismatch at {jax.tree_util.keystr(path)}")
