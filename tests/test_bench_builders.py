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


def test_bf16_streamed_builder_matches_reference_route():
    """bits=None streams a PLAIN bf16 tree (the 7B bf16 bench variant);
    must equal init_params + the transition embed/head exactly."""
    mcfg_a, params, nxt_a = build_predictable_model(seed=5, **ARCH)
    mcfg_b, mine, nxt_b = build_predictable_model_quantized(
        seed=5, bits=None, **ARCH)
    assert mcfg_a == mcfg_b
    np.testing.assert_array_equal(nxt_a, nxt_b)
    ref_leaves = jax.tree.leaves_with_path(params)
    my_leaves = jax.tree.leaves_with_path(mine)
    assert [p for p, _ in ref_leaves] == [p for p, _ in my_leaves]
    for (path, a), (_, b) in zip(ref_leaves, my_leaves):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"mismatch at {jax.tree_util.keystr(path)}")


def test_emit_writes_detail_file_and_compact_stdout_line(tmp_path,
                                                         monkeypatch,
                                                         capsys):
    """Round-3 regression: the stdout JSON line inlined every variant and
    overflowed the driver's tail capture (BENCH_r03.json parsed=null). The
    line must stay compact no matter how much detail variants carry, with
    the full detail in the side file."""
    import json
    import bench

    monkeypatch.setattr(bench, "DETAIL_FILE",
                        str(tmp_path / "detail.json"))
    detail = {
        "backend": "cpu", "token_exact": True,
        "variants": {
            "big": {"speedup": 1.5,
                    "blob": "x" * 20000},          # would overflow inline
            "nested": {"a": {"speedup": 2.0}, "b": {"speedup": 3.0}},
            "skipped_one": "skipped (budget)",
        },
    }
    bench.emit(1.23, detail)
    line = capsys.readouterr().out.strip()
    assert len(line) < 2000, f"stdout line too long: {len(line)}"
    parsed = json.loads(line)
    assert parsed["value"] == 1.23
    assert parsed["variant_speedups"]["big"] == 1.5
    assert parsed["variant_speedups"]["nested"] == {"a": 2.0, "b": 3.0}
    full = json.loads((tmp_path / "detail.json").read_text())
    assert full["detail"]["variants"]["big"]["blob"] == "x" * 20000


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
