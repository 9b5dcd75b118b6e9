"""Randomized differential tests.

1. Pool fuzz: random (key, tuple) operation sequences applied to both the
   device pool and a direct Python reimplementation of the reference's dict
   semantics (lade/decoding.py:37-78) must agree on contents and LRU order.
2. Config-space exactness fuzz: random lookahead configurations, prompt
   lengths and seeds — greedy lookahead must equal AR exactly (CPU fp32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.pool import pool_init, pool_update


class RefPool:
    """Reference token_map semantics (decoding.py:38-63), verbatim logic."""

    def __init__(self, cap):
        self.cap = cap
        self.map = {}

    def add(self, key, tup):
        ent = self.map.setdefault(key, [])
        if tup in ent:
            ent.remove(tup)
            ent.append(tup)
        elif len(ent) < self.cap:
            ent.append(tup)
        else:
            self.map[key] = ent[1:] + [tup]


@pytest.mark.parametrize("seed", range(5))
def test_pool_matches_reference_dict_semantics(seed):
    rng = np.random.RandomState(seed)
    vocab, g, gs = 12, 3, 2
    pool = pool_init(vocab, g, gs)
    ref = RefPool(g)
    for _ in range(30):   # batches with heavy key collisions
        k = rng.randint(1, 9)
        keys = rng.randint(0, vocab, size=k)
        tups = rng.randint(0, 6, size=(k, gs))
        valid = rng.rand(k) > 0.2
        pool = pool_update(pool, jnp.asarray(keys, jnp.int32),
                           jnp.asarray(tups, jnp.int32), jnp.asarray(valid))
        for i in range(k):
            if valid[i]:
                ref.add(int(keys[i]), tuple(int(x) for x in tups[i]))

    vals = np.asarray(pool.values)
    ages = np.asarray(pool.age)
    for key in range(vocab):
        have = [(tuple(vals[key, s]), int(ages[key, s]))
                for s in range(g) if ages[key, s] > 0]
        have.sort(key=lambda t: t[1])              # LRU order by age
        got = [t for t, _ in have]
        want = ref.map.get(key, [])
        assert got == want, f"key {key}: {got} != {want}"


@pytest.mark.parametrize("seed", range(6))
def test_random_config_greedy_exactness(seed):
    rng = np.random.RandomState(seed + 100)
    level = int(rng.randint(3, 7))
    window = int(rng.randint(2, 9))
    guess = int(rng.choice([0, 1, 3, 6]))
    plen = int(rng.randint(1, 30))
    key_len = int(rng.choice([1, 2]))
    mcfg = lt.LlamaConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(seed), scale=0.5)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=level, window_size=window,
                           guess_set_size=guess,
                           pool_from_prompt=bool(rng.randint(2)),
                           pool_key_len=key_len),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"))
    prompt = list(rng.randint(0, 96, size=plen))
    max_new = int(rng.randint(5, 60))
    base = eng.generate_baseline(prompt, max_new, seed=seed)
    lade = eng.generate(prompt, max_new, seed=seed)
    np.testing.assert_array_equal(
        base.tokens, lade.tokens,
        err_msg=f"cfg N={level} W={window} G={guess} P={plen} "
                f"key_len={key_len} max_new={max_new}")
