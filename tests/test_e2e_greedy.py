"""End-to-end greedy lookahead decoding tests on a tiny random model.

The exactness property is the reference's own acceptance criterion: lookahead
output must be token-identical to vanilla greedy decoding
(reference README.md:130-133; minimal.py compares USE_LADE on/off)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt


def tiny_engine(level=4, window=5, guess=4, pool_from_prompt=False, seed=0,
                max_seq=256, **ecfg_kw):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(seed), scale=0.5)
    lcfg = lt.LookaheadConfig(level=level, window_size=window,
                              guess_set_size=guess,
                              pool_from_prompt=pool_from_prompt)
    ecfg = lt.EngineConfig(max_seq_len=max_seq, prefill_chunk=16,
                           dtype="float32", **ecfg_kw)
    return lt.LookaheadEngine(mcfg, params, lcfg, ecfg)


@pytest.mark.parametrize("pool_from_prompt", [False, True])
def test_token_exact_vs_baseline(pool_from_prompt):
    eng = tiny_engine(pool_from_prompt=pool_from_prompt)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=20))
    base = eng.generate_baseline(prompt, 64)
    lade = eng.generate(prompt, 64)
    assert base.num_generated == 64
    np.testing.assert_array_equal(base.tokens, lade.tokens)
    assert lade.steps <= base.steps


def test_compression_ratio_above_one_on_repetitive_model():
    # Random tiny models greedily decode into loops, which the n-gram pool
    # exploits; compression must exceed 1 once guesses start hitting.
    eng = tiny_engine(level=5, window=6, guess=6)
    prompt = list(np.random.RandomState(1).randint(0, 128, size=16))
    r = eng.generate(prompt, 100)
    assert r.num_generated == 100
    assert r.compression_ratio > 1.0


def test_eos_stops_generation():
    eng = tiny_engine()
    prompt = list(np.random.RandomState(0).randint(0, 128, size=12))
    free = eng.generate(prompt, 80)
    # Pick a token that actually occurs in the free-running output and use it
    # as EOS; generation must stop right at its first occurrence.
    gen = free.new_tokens
    eos = int(gen[10])
    first = int(np.argmax(gen == eos))
    r = eng.generate(prompt, 80, eos_token_id=eos)
    np.testing.assert_array_equal(r.new_tokens, gen[:first + 1])


def test_streaming_matches_oneshot():
    eng = tiny_engine()
    prompt = list(np.random.RandomState(2).randint(0, 128, size=10))
    oneshot = eng.generate(prompt, 40)
    chunks = list(eng.generate_stream(prompt, 40))
    streamed = np.concatenate(chunks)
    np.testing.assert_array_equal(streamed, oneshot.new_tokens)


def test_baseline_streaming_matches_baseline():
    # reference greedy_search_chat analog: plain AR loop with streaming
    eng = tiny_engine()
    prompt = list(np.random.RandomState(2).randint(0, 128, size=10))
    base = eng.generate_baseline(prompt, 30)
    chunks = list(eng.generate_stream(prompt, 30, lookahead=False))
    assert all(len(c) == 1 for c in chunks)     # one token per AR step
    np.testing.assert_array_equal(np.concatenate(chunks), base.new_tokens)


def test_sampling_streaming_matches_oneshot():
    """generate_stream(sampling=...) runs the same SpecInfer sample step
    sequence from the same rng as generate_sample — identical tokens."""
    import lookaheaddecoding_tpu as lt
    eng = tiny_engine()
    prompt = list(np.random.RandomState(2).randint(0, 128, size=10))
    scfg = lt.SamplingConfig(temperature=0.9, top_k=20, top_p=0.95)
    oneshot = eng.generate_sample(prompt, 40, scfg, seed=7)
    chunks = list(eng.generate_stream(prompt, 40, seed=7, sampling=scfg))
    np.testing.assert_array_equal(np.concatenate(chunks),
                                  oneshot.new_tokens)
    # the baseline streaming loop is greedy-only (reference
    # greedy_search_chat): sampling without lookahead must fail loud
    with pytest.raises(ValueError, match="lookahead"):
        next(eng.generate_stream(prompt, 8, lookahead=False, sampling=scfg))


def test_multiple_eos_ids():
    eng = tiny_engine()
    prompt = list(np.random.RandomState(0).randint(0, 128, size=12))
    free = eng.generate(prompt, 80)
    gen = free.new_tokens
    eos_a, eos_b = int(gen[20]), int(gen[9])
    first = min(int(np.argmax(gen == eos_a)), int(np.argmax(gen == eos_b)))
    r = eng.generate(prompt, 80, eos_token_id=[eos_a, eos_b])
    np.testing.assert_array_equal(r.new_tokens, gen[:first + 1])


def test_prompt_of_length_one():
    eng = tiny_engine()
    base = eng.generate_baseline([5], 32)
    lade = eng.generate([5], 32)
    np.testing.assert_array_equal(base.tokens, lade.tokens)


def test_fused_projections_match_unfused():
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=14))
    outs = []
    for fuse in (False, True):
        eng = lt.LookaheadEngine(
            mcfg, params, lcfg,
            lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                            dtype="float32", fuse_projections=fuse))
        assert ("wqkv" in eng.params["layers"]) == fuse
        outs.append(eng.generate(prompt, 40).tokens)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_batched_generation_matches_individual():
    """Batched decode (vmapped loop, beyond the reference's batch==1
    assert) must reproduce each sequence's individual output, including
    lanes that finish at different times (EOS vs max_new)."""
    eng = tiny_engine()
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 14, 8)]
    singles = [eng.generate(p, 30, seed=i) for i, p in enumerate(prompts)]
    # give lane 1 an early EOS so lanes finish at different steps
    eos = int(singles[1].new_tokens[5])
    singles = [eng.generate(p, 30, eos_token_id=eos, seed=i)
               for i, p in enumerate(prompts)]
    batch = eng.generate_batch(prompts, 30, eos_token_id=eos)
    assert len(batch) == 3
    for s, b in zip(singles, batch):
        np.testing.assert_array_equal(s.tokens, b.tokens)


def test_max_new_trims_overshoot():
    eng = tiny_engine()
    prompt = list(np.random.RandomState(3).randint(0, 128, size=10))
    r = eng.generate(prompt, 17)
    assert r.num_generated == 17


def test_generate_batch_rejects_empty_prompt_list():
    import pytest
    eng = tiny_engine()
    with pytest.raises(ValueError, match="at least one prompt"):
        eng.generate_batch([], 8)


def test_donate_state_disabled_still_generates():
    """donate_state=False must thread through to the jits (no donation)
    and produce identical output to the donating default."""
    eng_d = tiny_engine(pool_from_prompt=True)
    eng_n = tiny_engine(pool_from_prompt=True, donate_state=False)
    assert eng_d._don == (1,) and eng_n._don == ()
    prompt = [5, 9, 3, 7, 5, 9, 3, 7, 5, 9]
    rd = eng_d.generate(prompt, 16)
    rn = eng_n.generate(prompt, 16)
    np.testing.assert_array_equal(rd.tokens, rn.tokens)


def test_dynamic_ntk_engine_end_to_end():
    """Engine with dynamic-NTK scaling and capacity > max_position_embeddings:
    the decode loop computes rope rows in-graph (prefill keyed on the full
    prompt length) and lookahead stays token-exact vs AR."""
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, rope_scaling=("dynamic", 2.0),
        dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(4), scale=0.5)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=128, prefill_chunk=16, dtype="float32"))
    prompt = list(np.random.RandomState(6).randint(0, 128, size=40))
    r = eng.generate(prompt, 48)      # crosses the max_pos=32 threshold
    rb = eng.generate_baseline(prompt, 48)
    np.testing.assert_array_equal(r.tokens, rb.tokens)


def test_generate_batch_sampling_matches_individual():
    """Sampling-mode batched decode (round 5): per-lane seeds AND per-lane
    temperature/top_p must reproduce each standalone generate_sample."""
    eng = tiny_engine()
    rng = np.random.RandomState(17)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 14, 8)]
    scfg = lt.SamplingConfig(temperature=0.9, top_k=16)
    temps = [0.9, 0.6, 1.2]
    singles = [
        eng.generate_sample(
            p, 20, lt.SamplingConfig(temperature=t, top_k=16), seed=i + 3)
        for i, (p, t) in enumerate(zip(prompts, temps))]
    batch = eng.generate_batch(prompts, 20, sampling=scfg,
                               seeds=[3, 4, 5], temperatures=temps)
    for s, b in zip(singles, batch):
        np.testing.assert_array_equal(s.tokens, b.tokens)
    # greedy mode must reject per-lane warper arrays
    with pytest.raises(ValueError, match="sampling"):
        eng.generate_batch(prompts, 8, temperatures=temps)


def test_generate_batch_sampling_with_shared_prefix():
    eng = tiny_engine(pool_from_prompt=True)
    rng = np.random.RandomState(19)
    system = list(rng.randint(0, 128, size=24))
    prompts = [system + list(rng.randint(0, 128, size=6)) for _ in range(2)]
    scfg = lt.SamplingConfig(temperature=0.8)
    singles = [eng.generate_sample(p, 16, scfg, seed=i)
               for i, p in enumerate(prompts)]
    pc = eng.precompute_prefix(system)
    batch = eng.generate_batch(prompts, 16, sampling=scfg,
                               seeds=[0, 1], prefix=pc)
    for s, b in zip(singles, batch):
        np.testing.assert_array_equal(s.tokens, b.tokens)


@pytest.mark.parametrize("mode", ["greedy", "baseline", "sample"])
def test_stream_steps_per_yield_output_identical(mode):
    """steps_per_yield fuses K steps per dispatch; the streamed token
    sequence must be identical for any K (finished steps no-op)."""
    eng = tiny_engine(pool_from_prompt=(mode != "baseline"))
    prompt = list(np.random.RandomState(23).randint(0, 128, size=12))
    kw = dict(lookahead=mode != "baseline")
    if mode == "sample":
        kw["sampling"] = lt.SamplingConfig(temperature=0.8, top_k=8)
    ref = np.concatenate(
        list(eng.generate_stream(prompt, 40, seed=2, **kw)))
    for k in (2, 5):
        got = list(eng.generate_stream(prompt, 40, seed=2,
                                       steps_per_yield=k, **kw))
        np.testing.assert_array_equal(np.concatenate(got), ref)
        assert len(got) >= 1
    with pytest.raises(ValueError, match="steps_per_yield"):
        next(eng.generate_stream(prompt, 8, steps_per_yield=0))
