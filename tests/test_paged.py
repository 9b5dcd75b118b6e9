"""Paged (block-table) KV cache: token-exactness vs the flat engine in
every mode, allocator lifecycle, prefix sharing/COW, conversation carry and
admission backpressure. North-star component (BASELINE.json: "quantized
paged KV-cache supporting speculative rollback/append on accept/reject");
the reference has no paging, sharing or batching (batch==1 asserted,
reference modeling_llama.py:1448; host KV slice-copies decoding.py:1145-1163)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.paged import (
    BlockAllocator, OutOfPages, pages_needed)
from lookaheaddecoding_tpu.core.serving import Request


def model():
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    return mcfg, params


LCFG = dict(level=4, window_size=5, guess_set_size=4, pool_from_prompt=True,
            attention_impl="xla")


def engines(kv_quant=None, page_size=64, num_lanes=2, n_pages=None,
            sampling=None, lcfg=None, steps_per_sync=1):
    mcfg, params = model()
    lc = lt.LookaheadConfig(**(lcfg or LCFG))
    ec = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32",
                         kv_quant=kv_quant)
    flat = lt.LookaheadEngine(mcfg, params, lc, ec)
    paged = lt.PagedServingEngine(
        mcfg, params, lc, ec, num_lanes=num_lanes, page_size=page_size,
        n_pages=n_pages, sampling=sampling, steps_per_sync=steps_per_sync)
    return flat, paged


def prompts(n, sizes=(10, 23, 17, 9)):
    rng = np.random.RandomState(3)
    return [list(rng.randint(0, 128, size=sizes[i % len(sizes)]))
            for i in range(n)]


# --------------------------------------------------------------------------
# allocator
# --------------------------------------------------------------------------

def test_allocator_lifecycle():
    a = BlockAllocator(10, reserved=2)
    assert a.free_pages == 8
    p1 = a.alloc(3)
    p2 = a.alloc(4)
    assert a.free_pages == 1 and a.used_pages == 7
    assert not (set(p1) & set(p2)) and min(p1 + p2) >= 2
    with pytest.raises(OutOfPages):
        a.alloc(2)
    a.share(p1)                    # prefix sharing: refcount 2
    a.release(p1)
    assert a.free_pages == 1       # still held by the share
    a.release(p1)
    assert a.free_pages == 4
    a.release(p2)
    assert a.free_pages == 8


def test_pages_needed_caps_at_logical_bound():
    # prompt 10, max_new huge: extent clamps to max_seq_len
    n, first = pages_needed(10, 10_000, 14, 64, 256)
    assert (n, first) == (4, 0)
    # prefix mid-page: private pages start at the COW page
    n, first = pages_needed(100, 8, 14, 64, 256, prefix_len=70)
    assert first == 70 // 64 == 1
    assert n == -(-(100 - 1 + 8 + 14 - 64) // 64)


# --------------------------------------------------------------------------
# token-exactness vs the flat engine
# --------------------------------------------------------------------------

def test_paged_greedy_matches_flat():
    flat, paged = engines()
    for i, p in enumerate(prompts(3)):
        rf = flat.generate(p, 40, seed=i)
        rp = paged.generate(p, 40, seed=i)
        np.testing.assert_array_equal(rf.tokens, rp.tokens)
        assert rf.steps == rp.steps
    assert paged.pages_free == paged.memory_stats()["pages_total"]


def test_paged_multilane_matches_flat():
    """Concurrent lanes sharing one pool must each match a standalone
    flat-engine run (disjoint page writes, shared-pool commit)."""
    flat, paged = engines(num_lanes=4, page_size=64)
    ps = prompts(6)
    singles = [flat.generate(p, 24, seed=i) for i, p in enumerate(ps)]
    results = paged.run([
        Request(prompt=p, max_new_tokens=24, seed=i, request_id=i)
        for i, p in enumerate(ps)])
    assert len(results) == 6
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
        assert by_id[i].steps == s.steps
    assert paged.pages_free == paged.memory_stats()["pages_total"]


def test_paged_int8_kv_matches_flat():
    flat, paged = engines(kv_quant="int8")
    p = prompts(1)[0]
    rf = flat.generate(p, 32, seed=0)
    rp = paged.generate(p, 32, seed=0)
    np.testing.assert_array_equal(rf.tokens, rp.tokens)


def test_paged_sampling_matches_flat():
    """SpecInfer sampling lanes over the paged pool: same seed, same
    tokens as the flat generate_sample."""
    scfg = lt.SamplingConfig(temperature=0.8, top_k=16)
    flat, paged = engines(sampling=scfg, num_lanes=2)
    for i, p in enumerate(prompts(2)):
        rf = flat.generate_sample(p, 24, scfg, seed=i)
        rp = paged.generate(p, 24, seed=i)
        np.testing.assert_array_equal(rf.tokens, rp.tokens)


def test_paged_eos_and_capacity_stop():
    flat, paged = engines()
    p = prompts(1)[0]
    rf = flat.generate(p, 40, seed=0)
    eos = int(rf.tokens[len(p) + 5])       # force an early stop
    rf2 = flat.generate(p, 40, eos_token_id=eos, seed=0)
    rp2 = paged.generate(p, 40, eos_token_id=eos, seed=0)
    np.testing.assert_array_equal(rf2.tokens, rp2.tokens)
    # generate-to-capacity: max_new beyond the logical bound is legal and
    # both engines stop at the same KV budget
    big_f = flat.generate(p, 10_000, seed=1)
    big_p = paged.generate(p, 10_000, seed=1)
    np.testing.assert_array_equal(big_f.tokens, big_p.tokens)


def test_paged_uneven_page_size_and_long_prompt():
    """Prompts crossing many page boundaries (prefill chunking + padded
    tail chunk writing to trash)."""
    flat, paged = engines(page_size=32)
    p = list(np.random.RandomState(9).randint(0, 128, size=130))
    rf = flat.generate(p, 48, seed=0)
    rp = paged.generate(p, 48, seed=0)
    np.testing.assert_array_equal(rf.tokens, rp.tokens)


# --------------------------------------------------------------------------
# prefix sharing + conversation carry
# --------------------------------------------------------------------------

def test_paged_prefix_sharing_and_cow():
    flat, paged = engines(num_lanes=2, page_size=64)
    system = list(np.random.RandomState(7).randint(0, 128, size=70))  # mid-page
    px = paged.precompute_prefix(system)
    assert len(px.pages) == 2              # ceil(70/64)
    used0 = paged.alloc.used_pages
    ps = [system + list(np.random.RandomState(s).randint(0, 128, size=8))
          for s in (1, 2)]
    singles = [flat.generate(p, 20, seed=i) for i, p in enumerate(ps)]
    results = paged.run([
        Request(prompt=p, max_new_tokens=20, seed=i, request_id=i, prefix=px)
        for i, p in enumerate(ps)])
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
    # all lane pages returned; the prefix still owns its own
    assert paged.alloc.used_pages == used0
    paged.release_prefix(px)
    assert paged.alloc.used_pages == 0


def test_paged_conversation_carry():
    """return_prefix: the completed request's pages become the next turn's
    prefix at O(pages) cost; the next turn is token-exact vs full
    re-prefill, and the carried warm pool rides along."""
    flat, paged = engines(num_lanes=2, page_size=64)
    p = prompts(1)[0]
    r1 = paged.generate(p, 24, seed=0, return_prefix=True)
    assert r1.prefix is not None and r1.prefix.pool is not None
    assert len(r1.prefix.pages) == -(-r1.prefix.length // 64)
    turn2 = list(r1.prefix.tokens) + list(
        np.random.RandomState(4).randint(0, 128, size=6))
    rf = flat.generate(turn2, 24, seed=1)
    rp = paged.generate(turn2, 24, seed=1, prefix=r1.prefix)
    np.testing.assert_array_equal(rf.tokens, rp.tokens)
    paged.release_prefix(r1.prefix)
    assert paged.alloc.used_pages == 0


# --------------------------------------------------------------------------
# backpressure + failure isolation + streaming
# --------------------------------------------------------------------------

def test_paged_admission_backpressure():
    """A pool too small for all requests at once serves them anyway —
    waiting in the queue, never failing, never over-allocating."""
    flat, paged = engines(num_lanes=2, page_size=64, n_pages=3)
    ps = prompts(4)
    singles = [flat.generate(p, 20, seed=i) for i, p in enumerate(ps)]
    results = paged.run([
        Request(prompt=p, max_new_tokens=20, seed=i, request_id=i)
        for i, p in enumerate(ps)])
    assert len(results) == 4 and all(r.error is None for r in results)
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)


def test_paged_oversized_request_fails_alone():
    _, paged = engines(num_lanes=2, page_size=64, n_pages=2)
    ps = prompts(2)
    results = paged.run([
        Request(prompt=ps[0], max_new_tokens=200, request_id="big"),
        Request(prompt=ps[1], max_new_tokens=8, request_id="ok"),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["big"].error is not None and "pages" in by_id["big"].error
    assert by_id["ok"].error is None and by_id["ok"].num_generated > 0


def test_paged_bad_request_fails_alone():
    _, paged = engines(num_lanes=2)
    results = paged.run([
        Request(prompt=[], max_new_tokens=4, request_id="empty"),
        Request(prompt=prompts(1)[0], max_new_tokens=4, request_id="ok"),
    ])
    by_id = {r.request_id: r for r in results}
    assert by_id["empty"].error is not None
    assert by_id["ok"].error is None


def test_paged_streaming_delivers_all_tokens():
    flat, paged = engines(num_lanes=2, steps_per_sync=2)
    p = prompts(1)[0]
    single = flat.generate(p, 24, seed=0)
    got = []
    res = paged.run([Request(prompt=p, max_new_tokens=24, seed=0,
                             on_tokens=lambda c: got.append(c))])[0]
    streamed = np.concatenate(got)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(p), streamed]), single.tokens)
    assert len(got) > 1                    # actually incremental
    np.testing.assert_array_equal(res.tokens, single.tokens)


def test_paged_rejects_unsupported_modes():
    mcfg, params = model()
    lc = lt.LookaheadConfig(**LCFG)
    with pytest.raises(ValueError, match="dynamic"):
        lt.PagedServingEngine(
            lt.LlamaConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           rope_scaling=("dynamic", 2.0),
                           dtype=jnp.float32),
            params, lc, lt.EngineConfig(max_seq_len=256, dtype="float32"))
    with pytest.raises(ValueError, match="page_size"):
        lt.PagedServingEngine(
            mcfg, params,
            lt.LookaheadConfig(**{**LCFG, "attention_impl": "pallas"}),
            lt.EngineConfig(max_seq_len=256, dtype="float32"), page_size=64)
    with pytest.raises(ValueError, match="single-chip"):
        lt.PagedServingEngine(
            mcfg, params, lc,
            lt.EngineConfig(max_seq_len=256, dtype="float32", tp=2))


# --------------------------------------------------------------------------
# paged Pallas kernel (interpret mode on CPU; compiled path exercised by
# the TPU campaign)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_paged_kernel_matches_flat_kernel(quant, causal):
    """paged_lookahead_attention over a shuffled page layout must equal
    lookahead_attention over the contiguous logical layout."""
    from lookaheaddecoding_tpu.ops.lookahead_attention import (
        lookahead_attention, paged_lookahead_attention)
    level, window, gss = 4, 5, 4
    S = (level - 1) * window + gss * (level - 1)
    B, hkv, rep, dd = 2, 2, 2, 64
    BS, NB = 128, 2
    M = NB * BS
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, hkv * rep, dd).astype(np.float32))
    k_log = rng.randn(B, hkv, M, dd).astype(np.float32)
    v_log = rng.randn(B, hkv, M, dd).astype(np.float32)
    kv_lens = jnp.asarray([37, 101], jnp.int32)

    # physical pool with per-lane shuffled pages (+1 spare garbage page)
    perm = [[2, 0], [3, 1]]
    P = 5
    k_pool = np.zeros((hkv, P * BS, dd), np.float32)
    v_pool = np.zeros((hkv, P * BS, dd), np.float32)
    for b in range(B):
        for j in range(NB):
            pg = perm[b][j]
            k_pool[:, pg * BS:(pg + 1) * BS] = k_log[b, :, j * BS:(j + 1) * BS]
            v_pool[:, pg * BS:(pg + 1) * BS] = v_log[b, :, j * BS:(j + 1) * BS]
    tables = jnp.asarray(perm, jnp.int32)

    kk, vv = jnp.asarray(k_pool), jnp.asarray(v_pool)
    k_ref_in, v_ref_in = jnp.asarray(k_log), jnp.asarray(v_log)
    if quant:
        def q8(x):
            s = np.maximum(np.abs(x).max(axis=-1, keepdims=True) / 127.0, 1e-8)
            return {"q": jnp.asarray(np.clip(np.round(x / s), -127, 127)
                                     .astype(np.int8)),
                    "s": jnp.asarray(s.astype(np.float32))}
        kk, vv = q8(k_pool), q8(v_pool)
        k_ref_in = [q8(k_log[b]) for b in range(B)]
        v_ref_in = [q8(v_log[b]) for b in range(B)]

    got = paged_lookahead_attention(
        q, kk, vv, kv_lens, tables, level=level, window=window,
        guess_size=level - 1, page_size=BS, causal=causal, interpret=True)
    for b in range(B):
        want = lookahead_attention(
            q[b],
            k_ref_in[b] if quant else k_ref_in[b],
            v_ref_in[b] if quant else v_ref_in[b],
            kv_lens[b], level=level, window=window, guess_size=level - 1,
            block_k=BS, causal=causal, interpret=True)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_paged_engine_pallas_interpret_matches_xla():
    """End-to-end paged decode with the fused kernel (interpret mode) ==
    the XLA dense path, multi-lane."""
    mcfg, params = model()
    ec = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32")
    ps = prompts(3)
    outs = {}
    for impl in ("xla", "pallas"):
        eng = lt.PagedServingEngine(
            mcfg, params, lt.LookaheadConfig(**{**LCFG,
                                               "attention_impl": impl}),
            ec, num_lanes=2, page_size=128)
        outs[impl] = eng.run([
            Request(prompt=p, max_new_tokens=20, seed=i, request_id=i)
            for i, p in enumerate(ps)])
    for a, b in zip(sorted(outs["xla"], key=lambda r: r.request_id),
                    sorted(outs["pallas"], key=lambda r: r.request_id)):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_paged_interactive_class_jumps_queue():
    flat, paged = engines(num_lanes=2, n_pages=3)
    ps = prompts(5)
    chat_p = prompts(1, sizes=(12,))[0]
    chat_single = flat.generate(chat_p, 16, seed=99)
    for i, p in enumerate(ps):
        paged.submit(Request(prompt=p, max_new_tokens=16, seed=i,
                             request_id=i))
    paged.submit(Request(prompt=chat_p, max_new_tokens=16, seed=99,
                         request_id="chat", interactive=True))
    paged.step()
    active_ids = {m["req"].request_id for m in paged._meta.values()}
    assert "chat" in active_ids           # jumped ahead of 3 queued batch
    while paged.step():
        pass
    results, paged._results = paged._results, []
    by_id = {r.request_id: r for r in results}
    assert len(results) == 6
    np.testing.assert_array_equal(by_id["chat"].tokens, chat_single.tokens)


def test_paged_prefix_release_while_lanes_active():
    """Releasing a PagedPrefix while requests that use it are mid-flight
    must not free shared pages under them (lane refcounts hold); pages
    return to the pool only when the lanes finish."""
    flat, paged = engines(num_lanes=2, page_size=64)
    system = list(np.random.RandomState(7).randint(0, 128, size=70))
    px = paged.precompute_prefix(system)
    ps = [system + list(np.random.RandomState(s).randint(0, 128, size=8))
          for s in (1, 2)]
    singles = [flat.generate(p, 20, seed=i) for i, p in enumerate(ps)]
    for i, p in enumerate(ps):
        paged.submit(Request(prompt=p, max_new_tokens=20, seed=i,
                             request_id=i, prefix=px))
    paged.step()                       # both admitted, sharing px pages
    paged.release_prefix(px)           # user drops the prefix mid-flight
    while paged.step():
        pass
    results, paged._results = paged._results, []
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(by_id[i].tokens, s.tokens)
    assert paged.alloc.used_pages == 0


def test_paged_sampling_with_prefix_matches_flat():
    scfg = lt.SamplingConfig(temperature=0.8, top_k=16)
    flat, paged = engines(sampling=scfg, num_lanes=2, page_size=64)
    system = list(np.random.RandomState(5).randint(0, 128, size=40))
    px = paged.precompute_prefix(system)
    p = system + list(np.random.RandomState(6).randint(0, 128, size=8))
    rf = flat.generate_sample(p, 20, scfg, seed=3)
    rp = paged.generate(p, 20, seed=3, prefix=px)
    np.testing.assert_array_equal(rf.tokens, rp.tokens)
    paged.release_prefix(px)
    assert paged.alloc.used_pages == 0


# --------------------------------------------------------------------------
# differential fuzz vs the flat engine
# --------------------------------------------------------------------------

@pytest.mark.parametrize("trial", range(6))
def test_paged_config_fuzz_matches_flat(trial):
    """Random (layout, page size, lanes, kv_quant, prompts, eos) — the
    paged scheduler must reproduce the flat engine token-for-token,
    including staggered EOS/capacity finishes, and return every page."""
    rng = np.random.RandomState(100 + trial)
    level = int(rng.choice([3, 4, 5]))
    window = int(rng.randint(2, 6))
    guess = int(rng.randint(0, 5))
    page = int(rng.choice([32, 64, 128]))
    lanes = int(rng.choice([1, 2, 3]))
    kv_quant = rng.choice([None, "int8"])
    mcfg, params = model()
    lc = lt.LookaheadConfig(level=level, window_size=window,
                            guess_set_size=guess,
                            pool_from_prompt=bool(rng.randint(2)),
                            attention_impl="xla")
    ec = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32",
                         kv_quant=None if kv_quant is None else str(kv_quant))
    flat = lt.LookaheadEngine(mcfg, params, lc, ec)
    paged = lt.PagedServingEngine(mcfg, params, lc, ec, num_lanes=lanes,
                                  page_size=page, steps_per_sync=1)
    n_req = int(rng.randint(1, 5))
    reqs, singles = [], []
    for i in range(n_req):
        p = list(rng.randint(0, 128, size=int(rng.randint(3, 40))))
        n_new = int(rng.randint(1, 40))
        eos = int(rng.randint(0, 128)) if rng.randint(2) else None
        singles.append(flat.generate(p, n_new, eos_token_id=eos, seed=i))
        reqs.append(Request(prompt=p, max_new_tokens=n_new,
                            eos_token_id=eos, seed=i, request_id=i))
    results = paged.run(reqs)
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(
            by_id[i].tokens, s.tokens,
            err_msg=f"trial={trial} L{level}W{window}G{guess} page={page} "
                    f"lanes={lanes} kv={kv_quant} req={i}")
        assert by_id[i].steps == s.steps
    assert paged.alloc.used_pages == 0


@pytest.mark.parametrize("trial", range(3))
def test_paged_sampling_fuzz_matches_flat(trial):
    """Sampling-mode differential fuzz: random warper configs and per-lane
    seeds through the paged scheduler vs sequential generate_sample."""
    rng = np.random.RandomState(200 + trial)
    scfg = lt.SamplingConfig(
        temperature=float(rng.uniform(0.5, 1.3)),
        top_k=int(rng.choice([0, 8, 32])),
        top_p=float(rng.choice([1.0, 0.9])))
    page = int(rng.choice([32, 64]))
    mcfg, params = model()
    lc = lt.LookaheadConfig(level=4, window_size=4,
                            guess_set_size=int(rng.randint(0, 5)),
                            pool_from_prompt=True, attention_impl="xla")
    ec = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32")
    flat = lt.LookaheadEngine(mcfg, params, lc, ec)
    paged = lt.PagedServingEngine(mcfg, params, lc, ec, num_lanes=2,
                                  page_size=page, sampling=scfg,
                                  steps_per_sync=1)
    reqs, singles = [], []
    for i in range(3):
        p = list(rng.randint(0, 128, size=int(rng.randint(4, 30))))
        n_new = int(rng.randint(4, 30))
        singles.append(flat.generate_sample(p, n_new, scfg, seed=10 + i))
        reqs.append(Request(prompt=p, max_new_tokens=n_new, seed=10 + i,
                            request_id=i))
    results = paged.run(reqs)
    by_id = {r.request_id: r for r in results}
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(
            by_id[i].tokens, s.tokens,
            err_msg=f"trial={trial} {scfg} page={page} req={i}")
    assert paged.alloc.used_pages == 0
