"""Prefix caching (shared system-prompt KV reuse): decode results must be
token-identical to full-prefill runs in every mode, the cached buffers must
stay reusable across requests, and misuse must fail loud. Beyond the
reference, which re-prefills every prompt in full (decoding.py:937-939)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.serving import ContinuousBatchingEngine, Request


def make_engine(kv_quant=None, rope_scaling=None):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_scaling=rope_scaling,
        dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    return lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32",
                        kv_quant=kv_quant))


RNG = np.random.RandomState(7)
SYSTEM = list(RNG.randint(0, 128, size=40))   # crosses prefill chunks (16)


def suffixed(n, seed):
    return SYSTEM + list(np.random.RandomState(seed).randint(0, 128, size=n))


def test_generate_with_prefix_matches_full_prefill():
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    for seed, n_suf in ((1, 9), (2, 17)):
        prompt = suffixed(n_suf, seed)
        full = eng.generate(prompt, 32, seed=seed)
        px = eng.generate(prompt, 32, seed=seed, prefix=pc)
        np.testing.assert_array_equal(px.tokens, full.tokens)
        ar_full = eng.generate_baseline(prompt, 32, seed=seed)
        ar_px = eng.generate_baseline(prompt, 32, seed=seed, prefix=pc)
        np.testing.assert_array_equal(ar_px.tokens, ar_full.tokens)


def test_prefix_reusable_across_many_requests():
    """The cached buffers are not donated: the SAME PrefixCache must keep
    producing exact results call after call."""
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    for seed in range(4):
        prompt = suffixed(11, 100 + seed)
        full = eng.generate(prompt, 24, seed=seed)
        px = eng.generate(prompt, 24, seed=seed, prefix=pc)
        np.testing.assert_array_equal(px.tokens, full.tokens)


def test_sample_and_stream_with_prefix_match():
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    prompt = suffixed(10, 3)
    scfg = lt.SamplingConfig(temperature=0.8)
    full = eng.generate_sample(prompt, 20, scfg, seed=9)
    px = eng.generate_sample(prompt, 20, scfg, seed=9, prefix=pc)
    np.testing.assert_array_equal(px.tokens, full.tokens)

    got = np.concatenate(list(eng.generate_stream(prompt, 16, prefix=pc)))
    want = np.concatenate(list(eng.generate_stream(prompt, 16)))
    np.testing.assert_array_equal(got, want)


def test_prompt_equal_to_prefix_and_chunk_overlap():
    """Edge cases: the prompt IS the prefix (empty suffix), and a suffix
    shorter than the prefill chunk (forces the overlap-aligned chunk to
    rewrite prefix rows — must be idempotent)."""
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    full = eng.generate(SYSTEM, 24)
    px = eng.generate(SYSTEM, 24, prefix=pc)
    np.testing.assert_array_equal(px.tokens, full.tokens)

    prompt = suffixed(3, 4)     # 3-token suffix < 16-token chunk
    full = eng.generate(prompt, 24)
    px = eng.generate(prompt, 24, prefix=pc)
    np.testing.assert_array_equal(px.tokens, full.tokens)


def test_prefix_with_int8_kv_cache():
    eng = make_engine(kv_quant="int8")
    pc = eng.precompute_prefix(SYSTEM)
    prompt = suffixed(9, 5)
    full = eng.generate(prompt, 24)
    px = eng.generate(prompt, 24, prefix=pc)
    np.testing.assert_array_equal(px.tokens, full.tokens)


def test_serving_lanes_share_one_prefix():
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    prompts = [suffixed(n, 200 + n) for n in (8, 11, 9, 13, 10)]
    singles = [eng.generate(p, 16, seed=i) for i, p in enumerate(prompts)]
    for objective in ("fairness", "throughput", "adaptive"):
        server = ContinuousBatchingEngine(eng, num_lanes=2,
                                          objective=objective)
        results = server.run([
            Request(prompt=p, max_new_tokens=16, seed=i, request_id=i,
                    prefix=pc)
            for i, p in enumerate(prompts)])
        by_id = {r.request_id: r for r in results}
        for i, s in enumerate(singles):
            np.testing.assert_array_equal(by_id[i].tokens, s.tokens,
                                          err_msg=objective)


def test_prefix_misuse_fails_loud():
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    with pytest.raises(ValueError, match="does not start with"):
        eng.generate(list(np.arange(50) % 128), 8, prefix=pc)
    with pytest.raises(ValueError, match="does not start with"):
        eng.generate(SYSTEM[:-1], 8, prefix=pc)   # shorter than the prefix
    with pytest.raises(ValueError, match="empty prefix"):
        eng.precompute_prefix([])
    with pytest.raises(ValueError, match="leaves no room"):
        eng.precompute_prefix(list(np.zeros(250, np.int32)))
    # a bad prefix request in serving fails alone
    server = ContinuousBatchingEngine(eng, num_lanes=2)
    results = server.run([
        Request(prompt=list(np.arange(30) % 128), max_new_tokens=8,
                request_id="bad", prefix=pc),
        Request(prompt=suffixed(5, 6), max_new_tokens=8, request_id="ok",
                prefix=pc)])
    by_id = {r.request_id: r for r in results}
    assert by_id["bad"].error is not None
    assert by_id["ok"].error is None and by_id["ok"].num_generated == 8


def test_prefix_rejected_under_dynamic_ntk():
    eng = make_engine(rope_scaling=("dynamic", 4.0))
    with pytest.raises(ValueError, match="dynamic-NTK"):
        eng.precompute_prefix(SYSTEM)


def test_conversation_kv_reuse_across_turns():
    """return_prefix=True chains turns: each turn passes the previous
    result's PrefixCache and prefills only the new user message —
    token-identical to full prefill every turn."""
    eng = make_engine()
    turn1 = SYSTEM + list(np.random.RandomState(31).randint(0, 128, size=8))
    r1 = eng.generate(turn1, 16, return_prefix=True)
    assert r1.prefix is not None
    # the cached tokens must be a prefix of the running conversation
    np.testing.assert_array_equal(
        r1.prefix.tokens, r1.tokens[:r1.prefix.length])

    msg2 = list(np.random.RandomState(32).randint(0, 128, size=7))
    turn2 = list(r1.tokens) + msg2
    full2 = eng.generate(turn2, 16)
    px2 = eng.generate(turn2, 16, prefix=r1.prefix, return_prefix=True)
    np.testing.assert_array_equal(px2.tokens, full2.tokens)

    msg3 = list(np.random.RandomState(33).randint(0, 128, size=5))
    turn3 = list(px2.tokens) + msg3
    full3 = eng.generate(turn3, 12)
    px3 = eng.generate(turn3, 12, prefix=px2.prefix)
    np.testing.assert_array_equal(px3.tokens, full3.tokens)

    # baseline decode carries the same chain
    rb = eng.generate_baseline(turn1, 16, return_prefix=True)
    turn2b = list(rb.tokens) + msg2
    full2b = eng.generate_baseline(turn2b, 16)
    px2b = eng.generate_baseline(turn2b, 16, prefix=rb.prefix)
    np.testing.assert_array_equal(px2b.tokens, full2b.tokens)


def test_return_prefix_rejected_under_dynamic_ntk():
    eng = make_engine(rope_scaling=("dynamic", 4.0))
    with pytest.raises(ValueError, match="dynamic-NTK"):
        eng.generate(SYSTEM, 8, return_prefix=True)
    # every entry point that can hand out a PrefixCache must refuse:
    # sampling is the main chat path, so a silent leak here would put
    # stale-rope KV under the likeliest conversation-reuse use case
    with pytest.raises(ValueError, match="dynamic-NTK"):
        eng.generate_sample(SYSTEM, 8, return_prefix=True)
    with pytest.raises(ValueError, match="dynamic-NTK"):
        eng.generate_baseline(SYSTEM, 8, return_prefix=True)


def test_stream_return_prefix_chains_turns():
    """generate_stream(return_prefix=True) returns the PrefixCache as the
    generator's StopIteration value; chaining it must stay exact."""
    eng = make_engine()
    turn1 = SYSTEM + list(np.random.RandomState(41).randint(0, 128, size=8))
    gen = eng.generate_stream(turn1, 16, return_prefix=True)
    pieces = []
    while True:
        try:
            pieces.extend(next(gen).tolist())
        except StopIteration as e:
            px = e.value
            break
    assert px is not None
    conv = turn1 + pieces
    np.testing.assert_array_equal(px.tokens, conv[:px.length])

    turn2 = conv + list(np.random.RandomState(42).randint(0, 128, size=6))
    full = np.concatenate(list(eng.generate_stream(turn2, 12)))
    chained = np.concatenate(list(eng.generate_stream(turn2, 12, prefix=px)))
    np.testing.assert_array_equal(chained, full)


def test_generate_batch_with_shared_prefix():
    """One PrefixCache broadcasts across vmapped lanes; each lane prefills
    only its own suffix — results match standalone generates."""
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    prompts = [suffixed(n, 300 + n) for n in (7, 12, 9)]
    singles = [eng.generate(p, 16, seed=50 + i)
               for i, p in enumerate(prompts)]
    outs = eng.generate_batch(prompts, 16,
                              seeds=[50 + i for i in range(3)], prefix=pc)
    for o, s in zip(outs, singles):
        np.testing.assert_array_equal(o.tokens, s.tokens)
    # a prompt that doesn't start with the prefix fails the whole batch
    # loudly (validated before any device work)
    with pytest.raises(ValueError, match="does not start with"):
        eng.generate_batch([prompts[0], list(np.arange(50) % 128)], 8,
                           prefix=pc)


def test_serving_batch_group_groups_same_prefix():
    """batch_group in the throughput path fuses same-prefix requests via
    generate_batch; results stay exact."""
    eng = make_engine()
    pc = eng.precompute_prefix(SYSTEM)
    prompts = [suffixed(n, 400 + n) for n in (8, 8, 8, 8)]
    singles = [eng.generate(p, 12, seed=i) for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      batch_group=2)
    results = server.run([
        Request(prompt=p, max_new_tokens=12, seed=i, request_id=i,
                prefix=pc)
        for i, p in enumerate(prompts)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_conversation_pool_carry_warms_next_turn():
    """return_prefix also carries the n-gram pool, so turn k+1 starts with
    warm guesses instead of re-warming from scratch (the reference rebuilds
    token_map every generate call, decoding.py:363/:911). Output must stay
    token-identical — the pool only proposes candidates, verification
    decides — while the warm turn takes strictly fewer decode steps on a
    predictable workload."""
    import dataclasses

    # Deterministic-cycle model (bench.py's transition trick at test
    # scale): one-hot embeddings, head[t] -> onehot(t+1 mod V), tiny
    # random layers that cannot overpower the embedding-dominated
    # residual — greedy continuation is the cycle, so n-gram guesses hit.
    V, H = 16, 64   # short cycle (period 16) so n-grams actually recur
    nxt = np.roll(np.arange(V), -1)
    mcfg = lt.LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(3), scale=0.002)
    params["embed"] = jnp.asarray(np.eye(V, H) * np.sqrt(H), jnp.float32)
    head = np.zeros((H, V), np.float32)
    head[np.arange(V), nxt] = 1.0
    params["lm_head"] = jnp.asarray(head)
    for pool_from_prompt in (False, True):
        eng = lt.LookaheadEngine(
            mcfg, params,
            lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                               pool_from_prompt=pool_from_prompt),
            lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                            dtype="float32"))

        p = [7]
        for _ in range(11):
            p.append(int(nxt[p[-1]]))
        r1 = eng.generate(p, 24, return_prefix=True)
        assert r1.prefix.pool is not None

        msg2 = []
        t = int(r1.tokens[-1])
        for _ in range(4):
            t = int(nxt[t])
            msg2.append(t)
        turn2 = list(r1.tokens) + msg2

        warm = eng.generate(turn2, 24, prefix=r1.prefix)
        cold = eng.generate(turn2, 24,
                            prefix=dataclasses.replace(r1.prefix, pool=None))
        full = eng.generate(turn2, 24)
        np.testing.assert_array_equal(warm.tokens, full.tokens)
        np.testing.assert_array_equal(cold.tokens, full.tokens)
        if pool_from_prompt:
            # the full-conversation prompt fill warms "cold" too on this
            # cyclic workload; the carry must at least never regress it
            # (the suffix-restricted fill + clock-offset merge — a full
            # re-fill with a rewound clock would invert LRU eviction)
            assert warm.steps <= cold.steps, (warm.steps, cold.steps)
        else:
            assert warm.steps < cold.steps, (warm.steps, cold.steps)
        # the carried clock only ever advances (LRU time never rewinds)
        assert int(jax.device_get(r1.prefix.pool.clock)) > 0
        # precompute_prefix (no decode ran) stays pool-less by design
        assert eng.precompute_prefix(p).pool is None
