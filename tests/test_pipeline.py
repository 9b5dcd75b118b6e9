"""Pipeline-parallel (layer-stage sharding) tests on the 8-virtual-CPU-device
mesh. The reference's PP is the external accelerate device_map="balanced"
integration (reference eval_mtbench.py:219-231); here it is a "pp" mesh axis:
stacked layer params and KV caches sharded on the layer axis, hidden state
flowing stage-to-stage via lax.ppermute inside a partial-manual shard_map
(models/llama.py:forward)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.parallel.sharding import make_mesh, shard_params


def _model(layers=4):
    cfg = lt.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=8,
        num_key_value_heads=4, max_position_embeddings=256,
        dtype=jnp.float32)
    params = lt.init_params(cfg, jax.random.PRNGKey(0), scale=0.1)
    return cfg, params


LCFG = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                          pool_from_prompt=True)


def _gen(cfg, params, ecfg, mesh=None, n=32):
    eng = lt.LookaheadEngine(cfg, params, LCFG, ecfg, mesh=mesh)
    prompt = list(np.random.RandomState(3).randint(1, 256, size=12))
    return eng.generate(prompt, n)


def test_pp2_generation_token_identical():
    cfg, params = _model()
    ref = _gen(cfg, params,
               lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                               dtype="float32"))

    mesh = make_mesh(pp=2)
    sharded = shard_params(params, mesh, cfg)
    out = _gen(cfg, sharded,
               lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                               dtype="float32", pp=2), mesh=mesh)
    np.testing.assert_array_equal(ref.tokens, out.tokens)
    assert out.steps == ref.steps


def test_pp2_tp2_composed_generation_token_identical():
    """VERDICT round-1 acceptance: make_mesh(pp=2, tp=2) generates
    token-identically (pp manual axis composed with tp GSPMD-auto)."""
    cfg, params = _model()
    ref = _gen(cfg, params,
               lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                               dtype="float32"))

    mesh = make_mesh(pp=2, tp=2)
    sharded = shard_params(params, mesh, cfg)
    out = _gen(cfg, sharded,
               lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                               dtype="float32", pp=2, tp=2), mesh=mesh)
    np.testing.assert_array_equal(ref.tokens, out.tokens)


def test_pp4_with_int8_kv_cache():
    """Layer-stage sharding composes with the quantized KV cache (the cache
    dict leaves are sharded on the stacked layer axis too)."""
    cfg, params = _model()
    mesh = make_mesh(pp=4)
    sharded = shard_params(params, mesh, cfg)
    out = _gen(cfg, sharded,
               lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                               dtype="float32", pp=4, kv_quant="int8"),
               mesh=mesh)
    ref = _gen(cfg, params,
               lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                               dtype="float32", kv_quant="int8"))
    np.testing.assert_array_equal(ref.tokens, out.tokens)


def test_pp_requires_divisible_layers_and_mesh():
    cfg, params = _model(layers=3)
    mesh = make_mesh(pp=2)
    with pytest.raises(ValueError, match="divisible"):
        lt.LookaheadEngine(
            cfg, params, LCFG,
            lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                            dtype="float32", pp=2), mesh=mesh)
    cfg4, params4 = _model()
    with pytest.raises(ValueError, match="mesh"):
        lt.LookaheadEngine(
            cfg4, params4, LCFG,
            lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                            dtype="float32", pp=2))
    # mesh pp axis size must EQUAL ecfg.pp (a larger axis would silently
    # skip layer stages)
    mesh4 = make_mesh(pp=4)
    with pytest.raises(ValueError, match="axis size"):
        lt.LookaheadEngine(
            cfg4, params4, LCFG,
            lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                            dtype="float32", pp=2), mesh=mesh4)


def test_prefix_cache_composes_with_pp_and_tp():
    """PrefixCache built on a sharded engine keeps its cache shardings as
    it round-trips through later generates; decode stays token-identical
    to the unsharded full-prefill reference under pp=2 and pp=2 x tp=2."""
    cfg, params = _model()
    rng = np.random.RandomState(9)
    system = list(rng.randint(1, 256, size=24))
    prompt = system + list(rng.randint(1, 256, size=8))
    ref = lt.LookaheadEngine(
        cfg, params, LCFG,
        lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                        dtype="float32")).generate(prompt, 24)

    for kwargs in (dict(pp=2), dict(pp=2, tp=2)):
        mesh = make_mesh(**kwargs)
        sharded = shard_params(params, mesh, cfg)
        eng = lt.LookaheadEngine(
            cfg, sharded, LCFG,
            lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                            dtype="float32", **kwargs), mesh=mesh)
        pc = eng.precompute_prefix(system)
        out = eng.generate(prompt, 24, prefix=pc)
        np.testing.assert_array_equal(out.tokens, ref.tokens,
                                      err_msg=str(kwargs))
