"""Regression tests for code-review findings (round 1 review of
8e248c3..HEAD): prefill clamp corruption, bf16 checkpoints, unsupported
rope scaling, bias-model sharding, auto attention fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.models.llama import LlamaConfig
from lookaheaddecoding_tpu.parallel.sharding import make_mesh, shard_params
from lookaheaddecoding_tpu.utils.checkpoint import load_params, save_params


def small_model(**kw):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32, **kw)
    return mcfg, lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)


def test_prefill_chunking_never_clamps_writes():
    """A near-capacity prompt whose padded chunk grid would exceed
    max_seq_len must produce identical output to a chunk size that tiles
    exactly (the clamped dynamic_update_slice used to corrupt prompt KV)."""
    mcfg, params = small_model()
    lcfg = lt.LookaheadConfig(level=3, window_size=2, guess_set_size=1)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=58))
    outs = []
    for chunk in (8, 12):   # 12 does not tile 58; padded grid would be 60
        eng = lt.LookaheadEngine(
            mcfg, params, lcfg,
            lt.EngineConfig(max_seq_len=64, prefill_chunk=chunk,
                            dtype="float32"))
        outs.append(eng.generate(prompt, 4).tokens)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_bfloat16_checkpoint_roundtrip(tmp_path):
    mcfg = lt.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype=jnp.bfloat16)
    params = lt.init_params(mcfg, jax.random.PRNGKey(1))
    p = str(tmp_path / "ckpt")          # no .npz suffix on purpose
    save_params(p, mcfg, params)
    cfg2, params2 = load_params(p)
    assert cfg2 == mcfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16))


def test_unsupported_rope_scaling_fails_loud():
    """llama3/yarn are implemented now (tests/test_llama_vs_hf.py); the
    fail-loud guard must still catch the kinds that are NOT (longrope)."""
    class FakeCfg:
        vocab_size = 64; hidden_size = 32; intermediate_size = 64
        num_hidden_layers = 2; num_attention_heads = 4
        num_key_value_heads = 2; rms_norm_eps = 1e-5
        max_position_embeddings = 128
        rope_scaling = {"rope_type": "longrope",
                        "short_factor": [1.0] * 8, "long_factor": [2.0] * 8,
                        "original_max_position_embeddings": 64}

    with pytest.raises(NotImplementedError, match="longrope"):
        LlamaConfig.from_hf(FakeCfg())

    class Llama3Cfg(FakeCfg):
        rope_scaling = {"rope_type": "llama3", "factor": 8.0,
                        "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                        "original_max_position_embeddings": 8192}

    assert LlamaConfig.from_hf(Llama3Cfg()).rope_scaling[0] == "llama3"


def test_shard_params_handles_bias_models():
    mcfg, params = small_model(attention_bias=True)
    mesh = make_mesh(tp=4)
    sharded = shard_params(params, mesh, mcfg)
    assert "bq" in sharded["layers"]
    prompt = list(np.random.RandomState(2).randint(0, 128, size=10))
    eng = lt.LookaheadEngine(
        mcfg, sharded,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4),
        lt.EngineConfig(max_seq_len=128, prefill_chunk=16, dtype="float32"))
    ref = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4),
        lt.EngineConfig(max_seq_len=128, prefill_chunk=16, dtype="float32"))
    np.testing.assert_array_equal(
        eng.generate(prompt, 20).tokens, ref.generate(prompt, 20).tokens)


def test_auto_attention_falls_back_for_untileable_capacity():
    from lookaheaddecoding_tpu.core.engine import pallas_tileable

    # tiling predicate used by auto-selection on accelerators
    assert not pallas_tileable(2056)     # no lane-aligned divisor
    assert pallas_tileable(2048)
    assert pallas_tileable(2560)         # tiles as 640-wide KV blocks
    assert pallas_tileable(1024)
    assert pallas_tileable(768)          # single-block regime
    # feasible-but-overhead-dominated (only 128-wide blocks): auto says no
    assert not pallas_tileable(1408)

    # on the CPU backend auto always resolves to the dense path (the kernel
    # would only run in slow interpret mode there)
    mcfg, params = small_model()
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                              attention_impl="auto")
    eng = lt.LookaheadEngine(
        mcfg, params, lcfg,
        lt.EngineConfig(max_seq_len=2048, prefill_chunk=16, dtype="float32"))
    assert eng.lcfg.attention_impl == "xla"
