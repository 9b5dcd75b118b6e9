"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
the TPU-native replacement for the reference's NCCL/DeepSpeed distributed
modes (SURVEY.md §2 parallelism inventory)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.models import llama
from lookaheaddecoding_tpu.parallel.sharding import (
    make_mesh, param_specs, shard_params)
from lookaheaddecoding_tpu.training.train_step import (
    init_opt_state, make_train_step, next_token_loss)


def small_cfg():
    return lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128, dtype=jnp.float32)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_train_step_matches_single_device():
    cfg = small_cfg()
    params = lt.init_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0, 128)

    step1 = make_train_step(cfg, seq_len=64)
    p1, m1, loss1 = step1(params, init_opt_state(params), batch)

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh, cfg)
    stepN = make_train_step(cfg, seq_len=64, mesh=mesh)
    pN, mN, lossN = stepN(sharded, init_opt_state(sharded), batch)

    np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-5)
    # adam's rsqrt(nu) normalization amplifies cross-shard reduction-order
    # noise up to ~lr per element; compare at that scale
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=1e-2)


def test_tp_sharded_generation_matches_replicated():
    """The lookahead engine jitted with tensor-sharded params must produce
    identical tokens (XLA inserts ICI collectives; math unchanged)."""
    cfg = small_cfg()
    params = lt.init_params(cfg, jax.random.PRNGKey(2), scale=0.4)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4)
    ecfg = lt.EngineConfig(max_seq_len=128, prefill_chunk=16, dtype="float32")
    prompt = list(np.random.RandomState(0).randint(0, 128, size=12))

    eng = lt.LookaheadEngine(cfg, params, lcfg, ecfg)
    ref = eng.generate(prompt, 40)

    mesh = make_mesh(tp=8)
    sharded = shard_params(params, mesh, cfg)
    eng_tp = lt.LookaheadEngine(cfg, sharded, lcfg, ecfg)
    out = eng_tp.generate(prompt, 40)
    np.testing.assert_array_equal(ref.tokens, out.tokens)


def test_lookahead_parallel_axis_matches_replicated():
    """Sharding the speculative token axis over the 'la' mesh axis (the
    reference's DIST_WORKERS mode, decoding.py:956-986) must not change
    outputs."""
    cfg = small_cfg()
    params = lt.init_params(cfg, jax.random.PRNGKey(5), scale=0.4)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                              pool_from_prompt=True)
    ecfg = lt.EngineConfig(max_seq_len=128, prefill_chunk=16, dtype="float32")
    prompt = list(np.random.RandomState(4).randint(0, 128, size=12))

    ref = lt.LookaheadEngine(cfg, params, lcfg, ecfg).generate(prompt, 40)

    mesh = make_mesh(tp=4, la=2)
    sharded = shard_params(params, mesh, cfg)
    ecfg_la = lt.EngineConfig(max_seq_len=128, prefill_chunk=16,
                              dtype="float32", tp=4, la=2)
    eng = lt.LookaheadEngine(cfg, sharded, lcfg, ecfg_la, mesh=mesh)
    out = eng.generate(prompt, 40)
    np.testing.assert_array_equal(ref.tokens, out.tokens)
    assert out.compression_ratio >= 1.0


def test_lookahead_parallel_axis_actually_partitions_compute():
    """The 'la' axis must make XLA PARTITION the composite-token matmuls
    (the reference's mode exists to scale per-step FLOPs across devices,
    decoding.py:973-986) — not silently all-gather the tokens and run every
    dot replicated. Compile the decode step under la=2 and assert the HLO
    contains (a) ICI collectives and (b) dots over S/2-row operands."""
    import jax.numpy as jnp

    cfg = lt.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, dtype=jnp.float32)
    params = lt.init_params(cfg, jax.random.PRNGKey(0), scale=0.1)
    lcfg = lt.LookaheadConfig(level=5, window_size=8, guess_set_size=4,
                              pool_from_prompt=True)   # S = 48
    mesh = make_mesh(la=2)
    sharded = shard_params(params, mesh, cfg)
    eng = lt.LookaheadEngine(
        cfg, sharded, lcfg,
        lt.EngineConfig(max_seq_len=128, prefill_chunk=16, dtype="float32",
                        la=2), mesh=mesh)
    assert eng.layout.seq_len == 48
    state = eng._prepare(list(range(1, 13)), 0)
    txt = eng._step.lower(
        eng.params, state, jnp.int32(16), jnp.full((4,), -1, jnp.int32)
    ).compile().as_text()

    n_collectives = sum(txt.count(p) for p in
                        ("all-gather", "all-reduce", "collective-permute"))
    assert n_collectives > 0, "no ICI collectives in the la=2 step"
    dots = [l for l in txt.splitlines() if " dot(" in l]
    half_row_dots = [l for l in dots if "f32[24," in l]   # 48/2 rows
    # the composite qkv/mlp projections must run on the LOCAL token shard
    assert len(half_row_dots) >= len(dots) // 2, (
        f"only {len(half_row_dots)}/{len(dots)} dots partitioned over la")


def test_training_reduces_loss():
    cfg = small_cfg()
    params = lt.init_params(cfg, jax.random.PRNGKey(3), scale=0.2)
    rng = np.random.RandomState(0)
    # deterministic repeating corpus
    base = rng.randint(0, 128, size=32)
    batch = jnp.asarray(np.stack([np.tile(base, 2)[:48] for _ in range(4)]))
    step = make_train_step(cfg, seq_len=64, learning_rate=0.5)
    opt = init_opt_state(params)
    rope = llama.rope_tables(cfg, 64)
    loss0 = float(next_token_loss(params, cfg, batch, *rope))
    for _ in range(20):
        params, opt, loss = step(params, opt, batch)
    assert float(loss) < loss0 * 0.7
