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


def test_roundtrip_nested_rope_scaling(tmp_path):
    """llama3/yarn rope_scaling nests a params tuple; json round-trips it
    as a list — load must restore tuples so the config stays hashable."""
    mcfg = lt.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling=("llama3", (8.0, 1.0, 4.0, 64.0)), dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(1))
    p = str(tmp_path / "ckpt3.npz")
    save_params(p, mcfg, params)
    cfg2, _ = load_params(p)
    assert cfg2 == mcfg
    hash(cfg2)   # jit static-arg requirement
