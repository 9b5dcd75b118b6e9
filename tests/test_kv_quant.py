"""Quantized KV-cache tests: the int8 cache with speculative commit must
keep the lookahead/baseline exactness contract at fixed quantization
(BASELINE.json: quantized paged KV-cache with speculative rollback/append)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.models import llama


def tiny(kv_quant=None, dtype=jnp.float32):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=dtype)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32",
                        kv_quant=kv_quant))
    return eng, mcfg, params


def test_int8_kv_lookahead_token_exact_vs_int8_kv_baseline():
    eng, _, _ = tiny(kv_quant="int8")
    prompt = list(np.random.RandomState(0).randint(0, 128, size=16))
    base = eng.generate_baseline(prompt, 48)
    lade = eng.generate(prompt, 48)
    np.testing.assert_array_equal(base.tokens, lade.tokens)
    assert lade.steps <= base.steps


def test_int8_kv_output_tracks_fp_kv():
    eng_q, _, _ = tiny(kv_quant="int8")
    eng_f, _, _ = tiny(kv_quant=None)
    prompt = list(np.random.RandomState(1).randint(0, 128, size=16))
    a = eng_q.generate_baseline(prompt, 24)
    b = eng_f.generate_baseline(prompt, 24)
    # int8 KV is lossy; on a random tiny model outputs drift but early
    # tokens should agree
    assert np.array_equal(a.tokens[:18], b.tokens[:18])


def test_quantized_write_roundtrip_error_bounded():
    # KV-head-major per-layer cache [Hkv=2, M=8, D=4]; new values [T=3, Hkv, D]
    cache = {"q": jnp.zeros((2, 8, 4), jnp.int8),
             "s": jnp.full((2, 8, 1), 1e-8, jnp.float32)}
    new = jnp.asarray(np.random.RandomState(2).randn(3, 2, 4), jnp.float32)
    out = llama.kv_cache_write(cache, new, jnp.int32(2))
    deq = np.asarray(out["q"][:, 2:5], np.float32) * np.asarray(out["s"][:, 2:5])
    scale = np.asarray(out["s"][:, 2:5])
    new_hm = np.asarray(new).transpose(1, 0, 2)
    assert np.all(np.abs(deq - new_hm) <= scale / 2 + 1e-6)
    assert np.all(np.asarray(out["q"][:, :2]) == 0)   # untouched slots


def test_batched_generation_with_int8_kv():
    """Quantized cache dicts must stack/vmap cleanly through
    generate_batch and match individual outputs."""
    eng, _, _ = tiny(kv_quant="int8")
    rng = np.random.RandomState(9)
    prompts = [list(rng.randint(0, 128, size=n)) for n in (10, 13)]
    singles = [eng.generate(p, 20, seed=i) for i, p in enumerate(prompts)]
    batch = eng.generate_batch(prompts, 20)
    for s, b in zip(singles, batch):
        np.testing.assert_array_equal(s.tokens, b.tokens)


def test_pallas_with_int8_kv_matches_xla_with_int8_kv():
    """The fused kernel's in-kernel scale application must reproduce the
    XLA int8-KV path's outputs (scales factor out of the dots exactly)."""
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=14))
    outs = []
    for impl in ("xla", "pallas"):
        eng = lt.LookaheadEngine(
            mcfg, params,
            lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                               pool_from_prompt=True, attention_impl=impl),
            lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                            dtype="float32", kv_quant="int8"))
        outs.append(eng.generate(prompt, 40).tokens)
    np.testing.assert_array_equal(outs[0], outs[1])
