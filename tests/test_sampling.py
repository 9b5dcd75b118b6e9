"""Sampling-mode tests: warper parity with HF and distribution preservation
of the SpecInfer-style verification (reference decoding.py:137-692)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.config import SamplingConfig
from lookaheaddecoding_tpu.models import llama
from lookaheaddecoding_tpu.ops.sampling import warp_logits

NEG = float("-inf")


def tiny_engine(seed=0, **kw):
    mcfg = lt.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(seed), scale=0.6)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                              pool_from_prompt=kw.pop("pool_from_prompt", True))
    ecfg = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32")
    return lt.LookaheadEngine(mcfg, params, lcfg, ecfg), mcfg, params


# ---------------------------------------------------------------------------
# Warpers vs HF transformers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("temp,top_k,top_p", [
    (1.0, 0, 1.0), (0.7, 0, 1.0), (1.0, 5, 1.0), (1.0, 0, 0.8),
    (0.9, 7, 0.85),
])
def test_warp_logits_matches_hf_warpers(temp, top_k, top_p):
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper)

    rng = np.random.RandomState(0)
    logits = rng.randn(3, 50).astype(np.float32) * 3

    ref = torch.tensor(logits)
    ids = torch.zeros((3, 1), dtype=torch.long)
    ref = TemperatureLogitsWarper(temp)(ids, ref)
    if top_k:
        ref = TopKLogitsWarper(top_k)(ids, ref)
    if top_p < 1.0:
        ref = TopPLogitsWarper(top_p)(ids, ref)
    ref = ref.numpy()

    mine = np.asarray(warp_logits(
        jnp.asarray(logits), jnp.float32(temp), top_k, jnp.float32(top_p)))
    # compare supports and values on the support
    np.testing.assert_array_equal(np.isneginf(mine), np.isneginf(ref))
    np.testing.assert_allclose(
        np.where(np.isneginf(mine), 0, mine),
        np.where(np.isneginf(ref), 0, ref), atol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end sampling
# ---------------------------------------------------------------------------

def test_near_zero_temperature_matches_greedy():
    eng, _, _ = tiny_engine()
    prompt = list(np.random.RandomState(0).randint(0, 64, size=16))
    greedy = eng.generate(prompt, 48)
    for seed in (0, 1, 2):
        s = eng.generate_sample(
            prompt, 48, SamplingConfig(temperature=0.01), seed=seed)
        np.testing.assert_array_equal(s.tokens, greedy.tokens)


def test_sampled_tokens_lie_in_warped_support():
    """Every emitted token must be inside the top-k/top-p support of the
    model's conditional distribution at its position (teacher-forced
    check) — validates that verification never accepts out-of-support
    drafts."""
    eng, mcfg, params = tiny_engine()
    prompt = list(np.random.RandomState(1).randint(0, 64, size=12))
    cfg = SamplingConfig(temperature=0.8, top_k=8, top_p=0.95)
    r = eng.generate_sample(prompt, 40, cfg, seed=3)
    toks = r.tokens
    # teacher-forced full forward for conditionals
    T = len(toks)
    k_cache, v_cache = llama.make_kv_cache(mcfg, 128)
    cos, sin = llama.rope_tables(mcfg, 128)
    col = jnp.arange(128)
    pos = jnp.arange(T)
    mask = jnp.where(col[None, :] <= pos[:, None], 0.0, NEG)
    logits, _, _ = llama.forward(
        params, mcfg, jnp.asarray(toks), pos, k_cache, v_cache,
        jnp.int32(0), mask, cos, sin)
    warped = np.asarray(warp_logits(
        logits, jnp.float32(cfg.temperature), cfg.top_k,
        jnp.float32(cfg.top_p)))
    for i in range(len(prompt), T):
        assert not np.isneginf(warped[i - 1, toks[i]]), (
            f"token at {i} outside warped support")


def test_first_token_marginal_matches_model_distribution():
    """Empirical distribution of the first sampled token over many seeds
    must match the model's softmax (distribution-exactness smoke test)."""
    eng, mcfg, params = tiny_engine(pool_from_prompt=False)
    prompt = [3, 9, 27, 14, 9, 3]
    n = 400
    counts = np.zeros(mcfg.vocab_size)
    for seed in range(n):
        r = eng.generate_sample(prompt, 1, SamplingConfig(), seed=seed)
        counts[r.new_tokens[0]] += 1
    emp = counts / n
    # model distribution via teacher-forced forward
    T = len(prompt)
    k_cache, v_cache = llama.make_kv_cache(mcfg, 64)
    cos, sin = llama.rope_tables(mcfg, 64)
    col = jnp.arange(64)
    pos = jnp.arange(T)
    mask = jnp.where(col[None, :] <= pos[:, None], 0.0, NEG)
    logits, _, _ = llama.forward(
        params, mcfg, jnp.asarray(prompt), pos, k_cache, v_cache,
        jnp.int32(0), mask, cos, sin)
    target = np.asarray(jax.nn.softmax(logits[-1]))
    tv = 0.5 * np.abs(emp - target).sum()
    # TV distance of a 400-sample empirical distribution: expected ~sqrt(V/n)
    assert tv < 0.35, f"total variation too high: {tv}"


def test_first_token_marginal_with_active_guesses():
    """Same marginal check but with verification candidates ACTIVE for the
    very first sampled token (pool seeded from a repetitive prompt): the
    SpecInfer accept/reject path must leave the output distribution equal
    to the model's softmax regardless of what the drafts propose."""
    eng, mcfg, params = tiny_engine(pool_from_prompt=True)
    prompt = [5, 9, 13, 5, 9, 13, 5, 9, 13, 5, 9, 13]
    # confirm guesses are active at step 0
    from lookaheaddecoding_tpu.core.pool import pool_lookup
    st = eng._prepare(prompt, 0)
    _, valid = pool_lookup(st.pool, jnp.int32(prompt[-1]))
    assert bool(np.asarray(valid).any())

    n = 400
    counts = np.zeros(mcfg.vocab_size)
    for seed in range(n):
        r = eng.generate_sample(prompt, 1, SamplingConfig(), seed=seed)
        counts[r.new_tokens[0]] += 1
    emp = counts / n
    T = len(prompt)
    k_cache, v_cache = llama.make_kv_cache(mcfg, 64)
    cos, sin = llama.rope_tables(mcfg, 64)
    col = jnp.arange(64)
    pos = jnp.arange(T)
    mask = jnp.where(col[None, :] <= pos[:, None], 0.0, NEG)
    logits, _, _ = llama.forward(
        params, mcfg, jnp.asarray(prompt), pos, k_cache, v_cache,
        jnp.int32(0), mask, cos, sin)
    target = np.asarray(jax.nn.softmax(logits[-1]))
    tv = 0.5 * np.abs(emp - target).sum()
    assert tv < 0.35, f"total variation too high with guesses active: {tv}"


def test_sampling_seeds_differ():
    eng, _, _ = tiny_engine()
    prompt = list(np.random.RandomState(2).randint(0, 64, size=10))
    a = eng.generate_sample(prompt, 32, SamplingConfig(), seed=0)
    b = eng.generate_sample(prompt, 32, SamplingConfig(), seed=1)
    assert not np.array_equal(a.tokens, b.tokens)
