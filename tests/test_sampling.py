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


def test_mid_ngram_conditional_distribution_preserved():
    """Statistical check of the WARPED-CONTINUATION path (the 2nd+ token of
    a verified n-gram, reference decoding.py:504-540): conditioned on the
    first position accepting draft token tau, the next emitted token must
    follow the target conditional q(. | tau) = guess_probs[g, 0] EXACTLY —
    through the multi-candidate accept/reject walk, the zero-out/renormalize
    residual, and the candidate narrowing. This is where SpecInfer
    implementations usually go wrong (e.g. continuing from the unwarped
    base distribution, or from the wrong candidate's row).

    Setup: V=8, three candidates — two sharing first token 2 (continuations
    5 and 6) and one with first token 3 — so position 1 exercises the full
    multi-candidate walk. Candidates sharing a prefix carry IDENTICAL
    continuation rows (same context => same model conditional), as a real
    teacher-forced forward would produce.
    """
    from lookaheaddecoding_tpu.ops.sampling import rejection_sample_verify

    V, N_SAMPLES = 8, 20_000
    rng = np.random.RandomState(0)

    def rand_dist(peak_ix, peak):
        p = rng.rand(V).astype(np.float64) * (1 - peak)
        p[peak_ix] = 0
        p = p / p.sum() * (1 - peak)
        p[peak_ix] = peak
        return p

    # moderate draft probabilities so both accept and reject paths fire
    probs_next = rand_dist(2, 0.35)
    probs_next[3] += probs_next[4] * 0.5   # give draft 3 real mass too
    probs_next[4] *= 0.5
    probs_next /= probs_next.sum()
    q_after2 = rand_dist(5, 0.4)    # target conditional given t0 = 2
    q_after3 = rand_dist(1, 0.3)    # target conditional given t0 = 3

    guess_tokens = jnp.asarray([[2, 5], [2, 6], [3, 1]], jnp.int32)
    gp = np.zeros((3, 2, V), np.float64)
    gp[0, 0] = gp[1, 0] = q_after2   # same prefix -> same conditional row
    gp[2, 0] = q_after3
    gp[:, 1] = 1.0 / V               # beyond-accept rows (unused marginals)
    guess_probs = jnp.asarray(gp, jnp.float32)
    guess_valid = jnp.ones((3,), bool)

    keys = jax.random.split(jax.random.PRNGKey(42), N_SAMPLES)
    run = jax.jit(jax.vmap(lambda k: rejection_sample_verify(
        jnp.asarray(probs_next, jnp.float32), guess_probs, guess_tokens,
        guess_valid, k)))
    res = run(keys)
    hits = np.asarray(res.hits)
    max_hit = np.asarray(res.max_hit)

    # invariant 0: first-token marginal is probs_next (existing coverage,
    # re-asserted here because the conditional test depends on it)
    emp0 = np.bincount(hits[:, 0], minlength=V) / N_SAMPLES
    tv0 = 0.5 * np.abs(emp0 - probs_next).sum()
    assert tv0 < 0.02, f"first-token marginal off: TV={tv0:.4f}"

    # invariant 1: t0 = draft token tau  <=>  position 1 emitted
    for tau in (2, 3):
        sel = hits[:, 0] == tau
        assert np.all(max_hit[sel] >= 1), "accepted draft but no continuation"

    # invariant 2 (the mid-n-gram check): t1 | t0=tau ~ q(.|tau)
    for tau, q in ((2, q_after2), (3, q_after3)):
        sel = hits[:, 0] == tau
        n_sel = int(sel.sum())
        assert n_sel > 2000, f"too few acceptances of {tau} ({n_sel})"
        emp1 = np.bincount(hits[sel, 1], minlength=V) / n_sel
        tv = 0.5 * np.abs(emp1 - q).sum()
        # empirical TV of a V=8 distribution at n>=2000: E ~ sqrt(V/n)~0.06
        assert tv < 0.08, (
            f"continuation conditional biased after t0={tau}: TV={tv:.4f}\n"
            f"emp={np.round(emp1, 3)}\nq  ={np.round(q, 3)}")

    # invariant 3: non-draft first tokens never continue (reject-all stops)
    sel = ~np.isin(hits[:, 0], [2, 3])
    assert np.all(max_hit[sel] == 0)


def test_sampling_seeds_differ():
    eng, _, _ = tiny_engine()
    prompt = list(np.random.RandomState(2).randint(0, 64, size=10))
    a = eng.generate_sample(prompt, 32, SamplingConfig(), seed=0)
    b = eng.generate_sample(prompt, 32, SamplingConfig(), seed=1)
    assert not np.array_equal(a.tokens, b.tokens)
