"""Continuous-batching scheduler tests: outputs must match individual
generates; lanes must be reused when there are more requests than lanes."""

import numpy as np
import jax
import jax.numpy as jnp

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.serving import ContinuousBatchingEngine, Request


def tiny_engine():
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    return lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"))


def test_continuous_batching_matches_individual():
    eng = tiny_engine()
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(0, 128, size=n))
               for n in (10, 13, 9, 11, 8)]   # 5 requests > 2 lanes
    max_news = [20, 35, 12, 28, 16]           # staggered completion times
    singles = [eng.generate(p, m, seed=i)
               for i, (p, m) in enumerate(zip(prompts, max_news))]

    server = ContinuousBatchingEngine(eng, num_lanes=2)
    results = server.run([
        Request(prompt=p, max_new_tokens=m, seed=i, request_id=i)
        for i, (p, m) in enumerate(zip(prompts, max_news))])
    assert len(results) == 5
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_latency_accounting_fields():
    """Every completed request carries TTFT and end-to-end latency anchored
    at submit time, under both objectives; TTFT never exceeds latency, and
    the fairness scheduler records a first-token time strictly before
    completion for multi-step requests."""
    eng = tiny_engine()
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(0, 128, size=10)) for _ in range(4)]
    for kwargs in (dict(objective="fairness", num_lanes=2,
                        steps_per_sync=1),
                   dict(objective="throughput"),
                   dict(objective="throughput", batch_group=2)):
        srv = ContinuousBatchingEngine(eng, **kwargs)
        results = srv.run([Request(p, 24, seed=i, request_id=i)
                           for i, p in enumerate(prompts)])
        assert len(results) == 4
        for r in results:
            assert r.error is None
            assert r.ttft_s is not None and r.latency_s is not None
            assert 0 < r.ttft_s <= r.latency_s + 1e-9
        if kwargs["objective"] == "fairness":
            # steps_per_sync=1: first token lands on the first sync, well
            # before a 24-token completion
            assert all(r.ttft_s < r.latency_s for r in results)


def test_bad_request_fails_gracefully_without_killing_lanes():
    eng = tiny_engine()
    rng = np.random.RandomState(5)
    good = list(rng.randint(0, 128, size=10))
    oversized = list(rng.randint(0, 128, size=300))   # > max_seq_len=256
    server = ContinuousBatchingEngine(eng, num_lanes=2)
    results = server.run([
        Request(prompt=good, max_new_tokens=12, request_id="ok"),
        Request(prompt=oversized, max_new_tokens=12, request_id="bad"),
        Request(prompt=good, max_new_tokens=8, request_id="ok2"),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["bad"].error and "exceeds" in by_id["bad"].error
    assert by_id["ok"].error is None and by_id["ok"].num_generated == 12
    assert by_id["ok2"].num_generated == 8


def test_bad_eos_and_sampling_params_fail_only_that_request():
    """A >MAX_EOS_IDS stop list or invalid per-request sampling params must
    fail that request alone — not abort the scheduler after lane insert."""
    eng = tiny_engine()
    rng = np.random.RandomState(6)
    good = list(rng.randint(0, 128, size=10))
    server = ContinuousBatchingEngine(eng, num_lanes=2)
    results = server.run([
        Request(prompt=good, max_new_tokens=10, request_id="ok"),
        Request(prompt=good, max_new_tokens=10, request_id="bad_eos",
                eos_token_id=[1, 2, 3, 4, 5]),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["bad_eos"].error and "eos" in by_id["bad_eos"].error
    assert by_id["ok"].error is None and by_id["ok"].num_generated == 10

    scfg = lt.SamplingConfig(temperature=1.0)
    server = ContinuousBatchingEngine(eng, num_lanes=2, sampling=scfg)
    results = server.run([
        Request(prompt=good, max_new_tokens=10, request_id="ok", seed=1),
        Request(prompt=good, max_new_tokens=10, request_id="bad_temp",
                temperature=0.0),
        Request(prompt=good, max_new_tokens=10, request_id="bad_topp",
                top_p=0.0),
    ])
    by_id = {r.request_id: r for r in results}
    assert "temperature" in by_id["bad_temp"].error
    assert "top_p" in by_id["bad_topp"].error
    assert by_id["ok"].error is None and by_id["ok"].num_generated == 10


def test_continuous_batching_incremental_submit():
    eng = tiny_engine()
    rng = np.random.RandomState(4)
    server = ContinuousBatchingEngine(eng, num_lanes=2)
    p1 = list(rng.randint(0, 128, size=10))
    p2 = list(rng.randint(0, 128, size=12))
    server.submit(Request(prompt=p1, max_new_tokens=25, request_id="a"))
    # run a few steps, then submit a second request mid-flight
    for _ in range(3):
        server.step()
    server.submit(Request(prompt=p2, max_new_tokens=10, request_id="b"))
    while server.step():
        pass
    ids = {r.request_id for r in server._results}
    assert ids == {"a", "b"}
    by_id = {r.request_id: r for r in server._results}
    np.testing.assert_array_equal(
        by_id["a"].tokens, eng.generate(p1, 25, seed=0).tokens)
    np.testing.assert_array_equal(
        by_id["b"].tokens, eng.generate(p2, 10, seed=0).tokens)


def test_continuous_batching_sampling_lanes_match_individual():
    """Sampling-mode lanes (SpecInfer verification) with PER-LANE
    temperature/top_p must reproduce the sequential generate_sample outputs
    for the same seeds (VERDICT round-1 item 7)."""
    eng = tiny_engine()
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 12, 9)]
    temps = [0.7, 1.0, 1.3]
    scfg = lt.SamplingConfig(temperature=1.0, top_p=0.9)
    singles = [
        eng.generate_sample(
            p, 24, lt.SamplingConfig(temperature=t, top_p=0.9), seed=i)
        for i, (p, t) in enumerate(zip(prompts, temps))]

    server = ContinuousBatchingEngine(eng, num_lanes=2, sampling=scfg)
    results = server.run([
        Request(prompt=p, max_new_tokens=24, seed=i, request_id=i,
                temperature=t)
        for i, (p, t) in enumerate(zip(prompts, temps))])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(s.tokens, by_id[i].tokens)


def test_greedy_engine_rejects_sampling_overrides():
    """A greedy-mode scheduler (no SamplingConfig) must fail requests that
    set temperature/top_p instead of silently running them greedy."""
    eng = tiny_engine()
    rng = np.random.RandomState(11)
    good = list(rng.randint(0, 128, size=10))
    server = ContinuousBatchingEngine(eng, num_lanes=2)
    results = server.run([
        Request(prompt=good, max_new_tokens=8, request_id="plain"),
        Request(prompt=good, max_new_tokens=8, request_id="sampled",
                temperature=0.7),
        Request(prompt=good, max_new_tokens=8, request_id="topp",
                top_p=0.9),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["plain"].error is None
    assert by_id["sampled"].error and "SamplingConfig" in by_id["sampled"].error
    assert by_id["topp"].error and "SamplingConfig" in by_id["topp"].error


def test_throughput_objective_matches_individual():
    """objective="throughput" (sequential fused generates) must produce
    token-identical results to individual engine.generate calls."""
    eng = tiny_engine()
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 13, 9)]
    max_news = [20, 12, 16]
    singles = [eng.generate(p, m, seed=i)
               for i, (p, m) in enumerate(zip(prompts, max_news))]
    server = ContinuousBatchingEngine(eng, objective="throughput")
    results = server.run([
        Request(prompt=p, max_new_tokens=m, seed=i, request_id=i)
        for i, (p, m) in enumerate(zip(prompts, max_news))])
    assert len(results) == 3
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_throughput_batch_group_matches_individual():
    """batch_group=2 routes same-shaped greedy requests through
    generate_batch; outputs must still match individual generates."""
    eng = tiny_engine()
    rng = np.random.RandomState(8)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 12, 9, 11)]
    singles = [eng.generate(p, 14) for p in prompts]
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      batch_group=2)
    results = server.run([
        Request(prompt=p, max_new_tokens=14, request_id=i)
        for i, p in enumerate(prompts)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_throughput_bad_request_fails_alone():
    eng = tiny_engine()
    rng = np.random.RandomState(9)
    good = list(rng.randint(0, 128, size=10))
    oversized = list(rng.randint(0, 128, size=300))   # > max_seq_len=256
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      batch_group=2)
    results = server.run([
        Request(prompt=good, max_new_tokens=10, request_id="ok"),
        Request(prompt=oversized, max_new_tokens=10, request_id="bad"),
        Request(prompt=good, max_new_tokens=6, request_id="ok2"),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["bad"].error and "exceeds" in by_id["bad"].error
    assert by_id["ok"].error is None and by_id["ok"].num_generated == 10
    assert by_id["ok2"].num_generated == 6


def test_throughput_sampling_matches_individual():
    sampling = lt.SamplingConfig(temperature=0.9, top_p=0.95)
    eng = tiny_engine()
    rng = np.random.RandomState(10)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 12)]
    singles = [eng.generate_sample(p, 12, sampling, seed=i + 1)
               for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      sampling=sampling)
    results = server.run([
        Request(prompt=p, max_new_tokens=12, seed=i + 1, request_id=i)
        for i, p in enumerate(prompts)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_objective_validation():
    import pytest
    eng = tiny_engine()
    with pytest.raises(ValueError, match="objective"):
        ContinuousBatchingEngine(eng, objective="latency")


def test_throughput_batch_group_sampling_matches_individual():
    """batch_group + sampling (round 5): the fused group drain runs the
    vmapped SAMPLING loop with per-request seeds AND per-request
    temperature/top_p overrides, matching sequential generate_sample."""
    eng = tiny_engine()
    scfg = lt.SamplingConfig(temperature=0.8, top_k=16)
    rng = np.random.RandomState(21)
    prompts = [list(rng.randint(0, 128, size=10)) for _ in range(4)]
    temps = [0.8, 1.1, 0.8, 0.6]
    singles = [
        eng.generate_sample(
            p, 12, lt.SamplingConfig(temperature=t, top_k=16), seed=i)
        for i, (p, t) in enumerate(zip(prompts, temps))]
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      batch_group=4, sampling=scfg)
    results = server.run([
        Request(prompt=p, max_new_tokens=12, seed=i, request_id=i,
                temperature=None if t == 0.8 else t)
        for i, (p, t) in enumerate(zip(prompts, temps))])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_batch_group_rejects_sampling_overrides_in_greedy_mode():
    """A sampling override must fail in greedy mode even when the request
    would otherwise be grouped through generate_batch (which has no
    sampling path and would silently run greedy)."""
    eng = tiny_engine()
    rng = np.random.RandomState(12)
    good = list(rng.randint(0, 128, size=10))
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      batch_group=2)
    results = server.run([
        Request(prompt=good, max_new_tokens=8, request_id="a",
                temperature=0.7),
        Request(prompt=good, max_new_tokens=8, request_id="b"),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["a"].error and "SamplingConfig" in by_id["a"].error
    assert by_id["b"].error is None and by_id["b"].num_generated == 8


def test_batch_group_honors_per_request_seeds():
    """Grouped requests must produce the same steps/compression metrics as
    standalone generates with their own seeds (seeds thread through
    generate_batch)."""
    eng = tiny_engine()
    rng = np.random.RandomState(13)
    prompts = [list(rng.randint(0, 128, size=11)) for _ in range(2)]
    seeds = [100, 7]
    singles = [eng.generate(p, 14, seed=s) for p, s in zip(prompts, seeds)]
    server = ContinuousBatchingEngine(eng, objective="throughput",
                                      batch_group=2)
    results = server.run([
        Request(prompt=p, max_new_tokens=14, seed=s, request_id=i)
        for i, (p, s) in enumerate(zip(prompts, seeds))])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
        assert by_id[i].steps == s.steps


# --------------------------------------------------------------------------
# adaptive objective: throughput drain for deep backlogs, lanes for the tail
# --------------------------------------------------------------------------

def test_adaptive_matches_individual_deep_queue():
    """A backlog deeper than the lanes drains through the fused path, the
    last <= num_lanes requests go through lanes — every output must still
    match a standalone generate."""
    eng = tiny_engine()
    rng = np.random.RandomState(11)
    prompts = [list(rng.randint(0, 128, size=n))
               for n in (10, 13, 9, 11, 8, 12)]    # 6 requests, 2 lanes
    singles = [eng.generate(p, 18, seed=i) for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, num_lanes=2, objective="adaptive")
    results = server.run([
        Request(prompt=p, max_new_tokens=18, seed=i, request_id=i)
        for i, p in enumerate(prompts)])
    assert len(results) == 6
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
    # the overflow (first 4) drained fused: TTFT == end-to-end latency;
    # the laned tail streams, so TTFT < latency
    fused = [by_id[i] for i in range(4)]
    laned = [by_id[i] for i in (4, 5)]
    assert all(r.ttft_s == r.latency_s for r in fused)
    assert all(r.ttft_s < r.latency_s for r in laned)


def test_adaptive_light_load_uses_lanes():
    """With the backlog inside lane capacity, adaptive == fairness: every
    request is laned (streaming TTFT) and outputs match."""
    eng = tiny_engine()
    rng = np.random.RandomState(12)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 9)]
    singles = [eng.generate(p, 16, seed=i) for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, num_lanes=2, objective="adaptive")
    results = server.run([
        Request(prompt=p, max_new_tokens=16, seed=i, request_id=i)
        for i, p in enumerate(prompts)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
    assert all(r.ttft_s < r.latency_s for r in results)


def test_adaptive_burst_after_lanes_active():
    """Requests arriving while lanes are active: the lanes finish on the
    lane path, then the deep remainder drains fused. Incremental submit /
    step driving (the online pattern)."""
    eng = tiny_engine()
    rng = np.random.RandomState(13)
    prompts = [list(rng.randint(0, 128, size=10)) for _ in range(7)]
    singles = [eng.generate(p, 14, seed=i) for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, num_lanes=2, objective="adaptive")
    # two requests admitted and started
    for i in range(2):
        server.submit(Request(prompt=prompts[i], max_new_tokens=14,
                              seed=i, request_id=i))
    server.step()
    # burst of five lands mid-decode
    for i in range(2, 7):
        server.submit(Request(prompt=prompts[i], max_new_tokens=14,
                              seed=i, request_id=i))
    while server.step():
        pass
    results, server._results = server._results, []
    assert len(results) == 7
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_adaptive_with_batch_group_and_sampling_modes():
    """adaptive composes with batch_group (greedy drain via generate_batch)
    and with sampling lanes."""
    eng = tiny_engine()
    rng = np.random.RandomState(14)
    prompts = [list(rng.randint(0, 128, size=10)) for _ in range(5)]
    singles = [eng.generate(p, 12, seed=i) for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, num_lanes=2, objective="adaptive",
                                      batch_group=2)
    results = server.run([
        Request(prompt=p, max_new_tokens=12, seed=i, request_id=i)
        for i, p in enumerate(prompts)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)

    scfg = lt.SamplingConfig(temperature=0.8)
    s_singles = [eng.generate_sample(p, 10, scfg, seed=i)
                 for i, p in enumerate(prompts)]
    server = ContinuousBatchingEngine(eng, num_lanes=2, objective="adaptive",
                                      sampling=scfg)
    results = server.run([
        Request(prompt=p, max_new_tokens=10, seed=i, request_id=i)
        for i, p in enumerate(prompts)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(s_singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_streaming_requests_deliver_incremental_tokens():
    """Request.on_tokens streams each request's newly confirmed tokens as
    the lane scheduler observes them; the concatenation equals the final
    result and matches an individual generate. Non-streaming requests in
    the same batch are unaffected."""
    eng = tiny_engine()
    rng = np.random.RandomState(11)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 13, 9)]
    singles = [eng.generate(p, 24, seed=i)
               for i, p in enumerate(prompts)]

    chunks = {0: [], 2: []}
    server = ContinuousBatchingEngine(eng, num_lanes=2, steps_per_sync=2)
    reqs = [Request(prompt=p, max_new_tokens=24, seed=i, request_id=i,
                    on_tokens=(chunks[i].append if i in chunks else None))
            for i, p in enumerate(prompts)]
    results = server.run(reqs)
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
    for i in chunks:
        assert len(chunks[i]) >= 2      # incremental, not one lump
        np.testing.assert_array_equal(np.concatenate(chunks[i]),
                                      by_id[i].new_tokens)


def test_streaming_in_throughput_and_adaptive_modes():
    """Fused-drain paths (throughput objective; adaptive deep-backlog
    overflow) deliver each streaming request's whole output in one call."""
    eng = tiny_engine()
    rng = np.random.RandomState(12)
    prompts = [list(rng.randint(0, 128, size=10)) for _ in range(4)]
    for objective in ("throughput", "adaptive"):
        got = {}
        server = ContinuousBatchingEngine(eng, num_lanes=1,
                                          objective=objective)
        results = server.run([
            Request(prompt=p, max_new_tokens=12, seed=i, request_id=i,
                    on_tokens=lambda c, i=i: got.setdefault(i, []).append(c))
            for i, p in enumerate(prompts)])
        by_id = {r.request_id: r for r in results}
        for i in range(4):
            np.testing.assert_array_equal(
                np.concatenate(got[i]), by_id[i].new_tokens,
                err_msg=f"{objective} req {i}")


def test_adaptive_head_of_line_guard():
    """ADVICE r4: one slow active request + deep backlog must not idle the
    rest of the fleet — once at least half the lanes are free, queued
    requests are admitted to them; outputs still match standalone runs."""
    eng = tiny_engine()
    rng = np.random.RandomState(15)
    long_p = list(rng.randint(0, 128, size=10))
    shorts = [list(rng.randint(0, 128, size=8)) for _ in range(6)]
    single_long = eng.generate(long_p, 48, seed=99)
    single_shorts = [eng.generate(p, 4, seed=i)
                     for i, p in enumerate(shorts)]
    server = ContinuousBatchingEngine(eng, num_lanes=4, objective="adaptive",
                                      steps_per_sync=1)
    server.submit(Request(prompt=long_p, max_new_tokens=48, seed=99,
                          request_id="long"))
    server.step()                      # queue not deep -> long admitted
    assert len(server._active) == 1
    for i, p in enumerate(shorts):     # deep backlog lands mid-decode
        server.submit(Request(prompt=p, max_new_tokens=4, seed=i,
                              request_id=i))
    server.step()
    # 3 free lanes >= num_lanes//2 -> backlog admitted instead of idling
    assert len(server._active) == 4
    while server.step():
        pass
    results, server._results = server._results, []
    assert len(results) == 7
    by_id = {r.request_id: r for r in results}
    np.testing.assert_array_equal(by_id["long"].tokens, single_long.tokens)
    for i, s in enumerate(single_shorts):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_interactive_class_jumps_queue_and_keeps_lane_mode():
    """Request(interactive=True) (round 5, VERDICT r4 Weak #4): admitted
    before earlier-queued batch requests, streams from a lane even while a
    deep batch backlog would otherwise fused-drain, and outputs stay
    exact."""
    eng = tiny_engine()
    rng = np.random.RandomState(31)
    batch_ps = [list(rng.randint(0, 128, size=10)) for _ in range(6)]
    chat_p = list(rng.randint(0, 128, size=12))
    singles = [eng.generate(p, 10, seed=i) for i, p in enumerate(batch_ps)]
    chat_single = eng.generate(chat_p, 20, seed=99)

    server = ContinuousBatchingEngine(eng, num_lanes=2, objective="adaptive",
                                      steps_per_sync=1)
    for i, p in enumerate(batch_ps):       # deep backlog (6 > 2 lanes)
        server.submit(Request(prompt=p, max_new_tokens=10, seed=i,
                              request_id=i))
    chunks = []
    server.submit(Request(prompt=chat_p, max_new_tokens=20, seed=99,
                          request_id="chat", interactive=True,
                          on_tokens=lambda c: chunks.append(c)))
    server.step()
    # the interactive request is ON A LANE (not fused-drained, not queued
    # behind the 6 batch requests)
    assert any(r.request_id == "chat" for r in server._active.values())
    while server.step():
        pass
    results, server._results = server._results, []
    by_id = {r.request_id: r for r in results}
    np.testing.assert_array_equal(by_id["chat"].tokens, chat_single.tokens)
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
    # it actually streamed (laned + on_tokens), incrementally
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(chat_p)] + chunks), chat_single.tokens)
    assert len(chunks) > 1
    assert by_id["chat"].ttft_s < by_id["chat"].latency_s


def test_interactive_under_throughput_objective_still_served():
    """Under the lane-less throughput objective the flag degrades to FIFO
    (documented) — the request must still complete."""
    eng = tiny_engine()
    p = list(np.random.RandomState(33).randint(0, 128, size=10))
    server = ContinuousBatchingEngine(eng, objective="throughput")
    res = server.run([
        Request(prompt=p, max_new_tokens=8, request_id="a"),
        Request(prompt=p, max_new_tokens=8, request_id="b",
                interactive=True)])
    assert {r.request_id for r in res} == {"a", "b"}
    assert all(r.error is None for r in res)
