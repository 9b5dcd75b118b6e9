"""Checkpoint round-trip tests (params + config, incl. quantized trees)."""

import numpy as np
import jax
import jax.numpy as jnp

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.ops.quant import quantize_params
from lookaheaddecoding_tpu.utils.checkpoint import load_params, save_params


def test_roundtrip_plain_and_quantized(tmp_path):
    mcfg = lt.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling=("linear", 2.0), dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0))
    for tree in (params, quantize_params(params, bits=4)):
        p = str(tmp_path / "ckpt.npz")
        save_params(p, mcfg, tree)
        cfg2, tree2 = load_params(p)
        assert cfg2 == mcfg
        a = jax.tree.leaves(tree)
        b = jax.tree.leaves(tree2)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
