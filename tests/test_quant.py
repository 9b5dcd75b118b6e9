"""Weight-only quantization tests: round-trip fidelity, engine integration,
and the exactness contract at fixed bit width (BASELINE.json: outputs must
be token-exact vs. the greedy autoregressive baseline at the same
bit-width)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.ops.quant import (
    dequantize_weight, qmatmul, quantize_params, quantize_weight,
    quantized_bits)


def test_int8_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 96).astype(np.float32) * 0.3
    wq = quantize_weight(w, bits=8)
    deq = np.asarray(dequantize_weight(wq, dtype=jnp.float32))
    scale = np.asarray(wq["scale"])
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-6)


def test_int4_pack_unpack_roundtrip():
    rng = np.random.RandomState(1)
    w = rng.randn(64, 32).astype(np.float32)
    wq = quantize_weight(w, bits=4)
    assert wq["q4"].shape == (32, 32)           # two nibbles per byte
    deq = np.asarray(dequantize_weight(wq, dtype=jnp.float32))
    scale = np.asarray(wq["scale"])
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-6)
    # exact integer grid round-trip
    grid = (np.round(w / scale)).clip(-7, 7) * scale
    np.testing.assert_allclose(deq, grid, atol=1e-6)


def test_qmatmul_matches_dequantized_matmul():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    w = rng.randn(64, 48).astype(np.float32)
    for bits in (8, 4):
        wq = quantize_weight(w, bits=bits)
        ref = x @ dequantize_weight(wq, dtype=jnp.float32)
        out = qmatmul(x, wq)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def _engine(params, mcfg):
    return lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"))


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_engine_token_exact_vs_quantized_baseline(bits):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    qparams = quantize_params(params, bits=bits)
    assert quantized_bits(qparams["layers"]["wq"]) == bits
    eng = _engine(qparams, mcfg)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=16))
    base = eng.generate_baseline(prompt, 48)
    lade = eng.generate(prompt, 48)
    np.testing.assert_array_equal(base.tokens, lade.tokens)
    assert lade.steps <= base.steps


@pytest.mark.parametrize("bits", [8, 4])
def test_fused_quantized_projections_match_unfused(bits):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    qparams = quantize_params(params, bits=bits)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=14))
    outs = []
    for fuse in (False, True):
        eng = lt.LookaheadEngine(
            mcfg, qparams, lcfg,
            lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                            dtype="float32", fuse_projections=fuse))
        assert ("wqkv" in eng.params["layers"]) == fuse
        outs.append(eng.generate(prompt, 40).tokens)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_int8_logits_close_to_fp():
    """INT8 weight-only should track the fp model closely (the 'perplexity
    within stated delta' regime)."""
    from lookaheaddecoding_tpu.models import llama
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(1), scale=0.3)
    qparams = quantize_params(params, bits=8)
    toks = jnp.asarray(np.random.RandomState(3).randint(0, 128, 12))
    kc, vc = llama.make_kv_cache(mcfg, 64)
    cos, sin = llama.rope_tables(mcfg, 64)
    col = jnp.arange(64)
    pos = jnp.arange(12)
    mask = jnp.where(col[None, :] <= pos[:, None], 0.0, float("-inf"))
    ref, _, _ = llama.forward(params, mcfg, toks, pos, kc, vc, jnp.int32(0),
                              mask, cos, sin)
    kc, vc = llama.make_kv_cache(mcfg, 64)
    q, _, _ = llama.forward(qparams, mcfg, toks, pos, kc, vc, jnp.int32(0),
                            mask, cos, sin)
    ref_p = jax.nn.log_softmax(ref)
    q_p = jax.nn.log_softmax(q)
    kl = float(jnp.mean(jnp.sum(jnp.exp(ref_p) * (ref_p - q_p), axis=-1)))
    assert kl < 0.05, f"int8 KL divergence too high: {kl}"
