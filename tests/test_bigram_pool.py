"""Bigram pool key tests (pool_key_len=2 — beyond-reference extension)."""

import numpy as np
import jax
import jax.numpy as jnp

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.pool import (
    _BIGRAM_PRIME, bigram_key, pool_table_rows)


def tiny_engine(pool_key_len=2):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                              pool_from_prompt=True,
                              pool_key_len=pool_key_len)
    ecfg = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32")
    return lt.LookaheadEngine(mcfg, params, lcfg, ecfg)


def test_bigram_engine_token_exact_and_compresses():
    eng2 = tiny_engine(pool_key_len=2)
    eng1 = tiny_engine(pool_key_len=1)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=20))
    base = eng1.generate_baseline(prompt, 64)
    for eng in (eng1, eng2):
        r = eng.generate(prompt, 64)
        np.testing.assert_array_equal(r.tokens, base.tokens)
    # random tiny models loop; both key schemes should find acceptance
    assert eng2.generate(prompt, 100).compression_ratio > 1.0


def test_host_and_device_bigram_hash_agree():
    rows = pool_table_rows(128, 2)
    rng = np.random.RandomState(1)
    a = rng.randint(0, 128, size=50)
    b = rng.randint(0, 128, size=50)
    dev = np.asarray(bigram_key(jnp.asarray(a), jnp.asarray(b), rows))
    host = ((a.astype(np.uint64) * _BIGRAM_PRIME + b) % (1 << 32)) % rows
    np.testing.assert_array_equal(dev, host.astype(np.int32))


def test_bigram_disambiguates_order2_continuations():
    """On text where the continuation depends on the previous TWO tokens,
    bigram keys must produce strictly better acceptance than unigram keys
    once the pool is seeded. Construct prompts where token b continues
    differently depending on its predecessor."""
    # sequence alternates contexts: (1,5)->6,7,8... and (2,5)->9,10,11...
    seq = []
    for _ in range(6):
        seq += [1, 5, 6, 7, 8]
        seq += [2, 5, 9, 10, 11]
    # pool-from-prompt seeding; then ask each engine to continue after (1,5)
    from lookaheaddecoding_tpu.core.pool import pool_lookup
    e2 = tiny_engine(pool_key_len=2)
    e1 = tiny_engine(pool_key_len=1)
    s2 = e2._prepare(seq + [1, 5], 0)
    s1 = e1._prepare(seq + [1, 5], 0)
    rows = pool_table_rows(128, 2)
    k2 = bigram_key(jnp.int32(1), jnp.int32(5), rows)
    g2, v2 = pool_lookup(s2.pool, k2)
    g1, v1 = pool_lookup(s1.pool, jnp.int32(5))
    cands2 = {tuple(np.asarray(g2)[i]) for i in range(len(v2))
              if np.asarray(v2)[i]}
    cands1 = {tuple(np.asarray(g1)[i]) for i in range(len(v1))
              if np.asarray(v1)[i]}
    # unigram key 5 mixes both continuations; bigram key (1,5) holds only
    # the correct one
    assert (6, 7, 8) in cands2
    assert (9, 10, 11) not in cands2
    assert (6, 7, 8) in cands1 and (9, 10, 11) in cands1
