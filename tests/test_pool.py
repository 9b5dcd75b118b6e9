"""N-gram pool property tests: LRU cap / move-to-back / evict-oldest
semantics of the reference's token_map (lade/decoding.py:37-127)."""

import numpy as np
import jax.numpy as jnp

from lookaheaddecoding_tpu.core.pool import (
    PoolState, fill_pool_with_prompt, pool_init, pool_lookup, pool_update,
)


def upd(pool, pairs):
    keys = jnp.asarray([k for k, _ in pairs], jnp.int32)
    tups = jnp.asarray([t for _, t in pairs], jnp.int32)
    return pool_update(pool, keys, tups, jnp.ones((len(pairs),), bool))


def entries(pool, key):
    vals, valid = pool_lookup(pool, jnp.int32(key))
    vals, valid = np.asarray(vals), np.asarray(valid)
    out = {tuple(vals[i]) for i in range(len(valid)) if valid[i]}
    return out


def test_insert_and_lookup():
    pool = pool_init(32, guess_set_size=3, guess_size=2)
    pool = upd(pool, [(5, (1, 2)), (5, (3, 4)), (7, (9, 9))])
    assert entries(pool, 5) == {(1, 2), (3, 4)}
    assert entries(pool, 7) == {(9, 9)}
    assert entries(pool, 6) == set()


def test_duplicate_refreshes_not_duplicates():
    pool = pool_init(32, 3, 2)
    pool = upd(pool, [(5, (1, 2)), (5, (1, 2)), (5, (1, 2))])
    assert entries(pool, 5) == {(1, 2)}


def test_lru_eviction_order():
    pool = pool_init(32, 2, 2)
    pool = upd(pool, [(5, (1, 1)), (5, (2, 2))])
    # full; inserting a third evicts the oldest (1,1)
    pool = upd(pool, [(5, (3, 3))])
    assert entries(pool, 5) == {(2, 2), (3, 3)}


def test_lru_move_to_back_on_hit():
    pool = pool_init(32, 2, 2)
    pool = upd(pool, [(5, (1, 1)), (5, (2, 2))])
    # touching (1,1) makes (2,2) the eviction victim
    pool = upd(pool, [(5, (1, 1)), (5, (3, 3))])
    assert entries(pool, 5) == {(1, 1), (3, 3)}


def test_invalid_lanes_are_noops():
    pool = pool_init(32, 2, 2)
    keys = jnp.asarray([5, 5], jnp.int32)
    tups = jnp.asarray([(1, 1), (2, 2)], jnp.int32)
    pool = pool_update(pool, keys, tups, jnp.asarray([True, False]))
    assert entries(pool, 5) == {(1, 1)}


def test_host_fill_matches_device_fill():
    """The host-computed prompt fill (engine fast path) must agree with the
    traced fill_pool_with_prompt on keys, tuples and LRU ages."""
    from lookaheaddecoding_tpu.core.pool import apply_host_fill, host_prompt_fill
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, 10, size=40)          # small vocab -> collisions
    level, g = 4, 3
    buf = np.zeros(64, np.int32)
    buf[:len(prompt)] = prompt

    dev = pool_init(10, g, level - 1)
    dev = fill_pool_with_prompt(dev, jnp.asarray(buf),
                                jnp.int32(len(prompt)), level)
    host = pool_init(10, g, level - 1)
    host = apply_host_fill(
        host, *host_prompt_fill(prompt, level, g, pad_to=64))
    # clocks differ (the device loop advances time for invalid lanes too);
    # what matters is content + relative LRU order per key
    assert int(host.clock) <= int(dev.clock)
    for key in range(10):
        assert entries(dev, key) == entries(host, key), f"key {key}"
        # ages must induce the same LRU order
        da, ha = np.asarray(dev.age[key]), np.asarray(host.age[key])
        dv, hv = np.asarray(dev.values[key]), np.asarray(host.values[key])
        dorder = [tuple(dv[i]) for i in np.argsort(da) if da[i] > 0]
        horder = [tuple(hv[i]) for i in np.argsort(ha) if ha[i] > 0]
        assert dorder == horder, f"LRU order differs for key {key}"


def test_fill_pool_with_prompt_matches_reference_ngrams():
    # reference fill_pool_with_prompt (decoding.py:104-127): every start idx
    # contributes key=prompt[i], tup=prompt[i+1:i+LEVEL]
    level = 3
    prompt = np.array([4, 7, 4, 7, 9, 2], np.int32)
    buf = np.zeros(16, np.int32)
    buf[: len(prompt)] = prompt
    pool = pool_init(16, 4, level - 1)
    pool = fill_pool_with_prompt(
        pool, jnp.asarray(buf), jnp.int32(len(prompt)), level)
    assert entries(pool, 4) == {(7, 4), (7, 9)}
    assert entries(pool, 7) == {(4, 7), (9, 2)}
    assert entries(pool, 9) == set()      # 9 starts no complete n-gram
    assert entries(pool, 0) == set()      # padding contributes nothing


def test_host_fill_on_warm_pool_never_rewinds_lru_time():
    """apply_host_fill onto a pool that already carries entries (the
    conversation pool-carry path): the clock must ADVANCE by the fill's
    span (a rewound clock makes every later insert the argmin-age eviction
    victim — LRU inversion), filled entries must rank newest, untouched
    keys must keep their entries, and empty slots must stay age-0."""
    from lookaheaddecoding_tpu.core.pool import apply_host_fill, host_prompt_fill

    pool = pool_init(32, guess_set_size=3, guess_size=2)
    # warm entries on keys 5 and 9, clock advances to 2
    pool = upd(pool, [(5, (6, 7)), (9, (10, 11))])
    warm_clock = int(pool.clock)
    assert warm_clock > 0

    prompt = [1, 2, 3, 4]           # fills key 1 -> (2,3), key 2 -> (3,4)
    fill = host_prompt_fill(prompt, level=3, guess_set_size=3, pad_to=16)
    merged = apply_host_fill(pool, *fill)

    assert int(merged.clock) == warm_clock + int(fill[3])
    # untouched warm keys keep their entries and ages
    np.testing.assert_array_equal(np.asarray(merged.values[5]),
                                  np.asarray(pool.values[5]))
    np.testing.assert_array_equal(np.asarray(merged.age[5]),
                                  np.asarray(pool.age[5]))
    # filled keys: live entries rank NEWER than every warm entry,
    # empty slots stay 0 (so they stay the preferred eviction victims)
    for key in (1, 2):
        ages = np.asarray(merged.age[key])
        live = ages[ages > 0]
        assert live.size > 0 and (live > warm_clock).all(), (key, ages)
        assert (ages >= 0).all()
    vals, valid = pool_lookup(merged, jnp.int32(1))
    got = {tuple(v) for v, ok in zip(np.asarray(vals), np.asarray(valid))
           if ok}
    assert (2, 3) in got


def test_host_fill_merge_keeps_undisplaced_warm_entries():
    """merge=True (the prefix-cache suffix-fill path, ADVICE r4): fill
    entries LRU-insert into the key's existing row, so warm entries the
    fill doesn't displace survive; merge == set on cold rows."""
    from lookaheaddecoding_tpu.core.pool import apply_host_fill, host_prompt_fill

    pool = pool_init(32, guess_set_size=3, guess_size=2)
    # warm key 1 holds (20, 21); key 9 is untouched warm context
    pool = upd(pool, [(1, (20, 21)), (9, (10, 11))])
    warm_clock = int(pool.clock)

    prompt = [1, 2, 3, 4]           # fills key 1 -> (2,3), key 2 -> (3,4)
    fill = host_prompt_fill(prompt, level=3, guess_set_size=3, pad_to=16)

    # whole-row set (old behavior) clobbers the warm entry
    vals, valid = pool_lookup(apply_host_fill(pool, *fill), jnp.int32(1))
    wiped = {tuple(v) for v, ok in zip(np.asarray(vals), np.asarray(valid))
             if ok}
    assert (20, 21) not in wiped

    merged = apply_host_fill(pool, *fill, merge=True)
    vals, valid = pool_lookup(merged, jnp.int32(1))
    got = {tuple(v) for v, ok in zip(np.asarray(vals), np.asarray(valid))
           if ok}
    assert (2, 3) in got and (20, 21) in got       # warm entry survives
    # fill entries still rank newer than the warm clock; untouched key kept
    ages = np.asarray(merged.age[1])
    assert (ages[ages > 0] > 0).all() and ages.max() > warm_clock
    np.testing.assert_array_equal(np.asarray(merged.values[9]),
                                  np.asarray(pool.values[9]))

    # cold-row equivalence: merge and set produce identical CONTENT
    cold = pool_init(32, guess_set_size=3, guess_size=2)
    a, _ = pool_lookup(apply_host_fill(cold, *fill), jnp.int32(2))
    b, _ = pool_lookup(apply_host_fill(cold, *fill, merge=True), jnp.int32(2))
    assert ({tuple(v) for v in np.asarray(a)}
            == {tuple(v) for v in np.asarray(b)})


def test_host_fill_merge_refreshes_matching_entry():
    """A fill entry equal to a warm entry must REFRESH it (move-to-back),
    not duplicate it — the reference's dedupe rule (decoding.py:42-49)."""
    from lookaheaddecoding_tpu.core.pool import apply_host_fill, host_prompt_fill

    pool = pool_init(32, guess_set_size=3, guess_size=2)
    pool = upd(pool, [(1, (2, 3)), (1, (5, 6))])
    prompt = [1, 2, 3]              # fills key 1 -> (2,3): a duplicate
    fill = host_prompt_fill(prompt, level=3, guess_set_size=3, pad_to=16)
    merged = apply_host_fill(pool, *fill, merge=True)
    vals, valid = pool_lookup(merged, jnp.int32(1))
    rows = [tuple(v) for v, ok in zip(np.asarray(vals), np.asarray(valid))
            if ok]
    assert sorted(rows) == [(2, 3), (5, 6)]        # no duplicate slot
    ages = np.asarray(merged.age[1])
    live = [(tuple(v), a) for v, a in zip(np.asarray(merged.values[1]), ages)
            if a > 0]
    # the refreshed (2,3) is now the NEWEST entry
    assert max(live, key=lambda t: t[1])[0] == (2, 3)
