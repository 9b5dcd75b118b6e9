"""Numerical parity of the JAX LLaMA stack against HuggingFace transformers
(torch CPU, fp32) on a tiny random checkpoint — covering RMSNorm, RoPE, GQA
attention, SwiGLU and the KV-cache path (reference forks exactly this stack,
lade/models/modeling_llama.py:213-1255)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.models import llama

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

NEG = float("-inf")


def make_hf(vocab=96, hidden=64, layers=2, heads=4, kv_heads=2, inter=112,
            rope_scaling=None, tie=False, max_pos=256):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=max_pos,
        rope_scaling=rope_scaling, tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def jax_logits(mcfg, params, tokens, max_seq=128):
    T = len(tokens)
    k_cache, v_cache = llama.make_kv_cache(mcfg, max_seq)
    cos, sin = llama.rope_tables(mcfg, max_seq)
    col = jnp.arange(max_seq)
    pos = jnp.arange(T, dtype=jnp.int32)
    mask = jnp.where(col[None, :] <= pos[:, None], 0.0, NEG)
    logits, k_cache, v_cache = llama.forward(
        params, mcfg, jnp.asarray(tokens, jnp.int32), pos, k_cache, v_cache,
        jnp.int32(0), mask, cos, sin)
    return np.asarray(logits), k_cache, v_cache, (cos, sin), col


@pytest.mark.parametrize("kv_heads,tie", [(4, False), (2, False), (2, True)])
def test_full_sequence_logits_match_hf(kv_heads, tie):
    hf = make_hf(kv_heads=kv_heads, tie=tie)
    mcfg, params = lt.convert_hf_model(hf, dtype=jnp.float32)
    tokens = np.random.RandomState(0).randint(0, 96, size=17)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)[None]).logits[0].numpy()
    mine, *_ = jax_logits(mcfg, params, tokens)
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=2e-3)


def test_linear_rope_scaling_matches_hf():
    hf = make_hf(rope_scaling={"rope_type": "linear", "factor": 2.0})
    mcfg, params = lt.convert_hf_model(hf, dtype=jnp.float32)
    assert mcfg.rope_scaling == ("linear", 2.0)
    tokens = np.random.RandomState(1).randint(0, 96, size=11)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)[None]).logits[0].numpy()
    mine, *_ = jax_logits(mcfg, params, tokens)
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=2e-3)


def test_incremental_kv_decode_matches_full_forward():
    """Tokens fed one-at-a-time through the KV cache must reproduce the
    full-sequence logits (validates cache write offsets + masking)."""
    hf = make_hf()
    mcfg, params = lt.convert_hf_model(hf, dtype=jnp.float32)
    tokens = np.random.RandomState(2).randint(0, 96, size=9)
    full, *_ = jax_logits(mcfg, params, tokens)

    max_seq = 64
    k_cache, v_cache = llama.make_kv_cache(mcfg, max_seq)
    cos, sin = llama.rope_tables(mcfg, max_seq)
    col = jnp.arange(max_seq)
    last = []
    for i, t in enumerate(tokens):
        mask = jnp.where(col[None, :] <= i, 0.0, NEG)
        logits, k_cache, v_cache = llama.forward(
            params, mcfg, jnp.asarray([t], jnp.int32),
            jnp.asarray([i], jnp.int32), k_cache, v_cache, jnp.int32(i),
            mask, cos, sin)
        last.append(np.asarray(logits[0]))
    np.testing.assert_allclose(np.stack(last), full, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("n_tokens", [11, 48])
def test_dynamic_rope_scaling_matches_hf(n_tokens):
    """Dynamic-NTK runtime semantics (reference modeling_llama.py:288-311):
    the base rescales only once the live context outgrows
    max_position_embeddings. With max_pos=32 and engine capacity 128, a
    short prompt (11) must use the UNSCALED base even though capacity
    exceeds max_pos (the round-2 bug baked the scaled base into the whole
    table); a long prompt (48) must use the base recomputed at seq_len=48,
    matching HF's grown-cache behavior."""
    hf = make_hf(rope_scaling={"rope_type": "dynamic", "factor": 4.0},
                 max_pos=32)
    mcfg, params = lt.convert_hf_model(hf, dtype=jnp.float32)
    assert mcfg.rope_scaling == ("dynamic", 4.0)
    tokens = np.random.RandomState(3).randint(0, 96, size=n_tokens)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)[None]).logits[0].numpy()
    mine, *_ = jax_logits(mcfg, params, tokens)
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=2e-3)


def test_dynamic_rope_unscaled_below_threshold():
    """Below max_position_embeddings the dynamic rows must equal the plain
    unscaled rows bit-for-bit in structure (base untouched)."""
    mcfg = lt.LlamaConfig(vocab_size=96, hidden_size=64,
                          intermediate_size=112, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          max_position_embeddings=32,
                          rope_scaling=("dynamic", 4.0), dtype=jnp.float32)
    plain = lt.LlamaConfig(vocab_size=96, hidden_size=64,
                           intermediate_size=112, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=32, dtype=jnp.float32)
    pos = jnp.arange(16, dtype=jnp.int32)
    cos_d, sin_d = llama.rope_rows_dynamic(mcfg, pos)
    cos_p, sin_p = llama.rope_tables(plain, 16)
    np.testing.assert_allclose(np.asarray(cos_d), np.asarray(cos_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_d), np.asarray(sin_p),
                               atol=1e-6)


# --------------------------------------------------------------------------
# llama3 / yarn rope scaling (beyond the reference: its pinned transformers
# 4.36 has neither; parity target is current transformers' rope init)
# --------------------------------------------------------------------------

LLAMA3_RS = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
             "high_freq_factor": 4.0, "original_max_position_embeddings": 64}
YARN_RS = {"rope_type": "yarn", "factor": 4.0,
           "original_max_position_embeddings": 64}


@pytest.mark.parametrize("rs", [LLAMA3_RS, YARN_RS,
                                {**YARN_RS, "beta_fast": 16.0,
                                 "beta_slow": 2.0, "attention_factor": 1.3},
                                {**YARN_RS, "mscale": 0.8,
                                 "mscale_all_dim": 0.4}],
                         ids=["llama3", "yarn", "yarn-explicit", "yarn-mscale"])
def test_static_rope_transforms_match_hf_init(rs):
    """inv_freq and the cos/sin post-factor vs transformers' own rope init
    functions for the same config."""
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_scaling=dict(rs))
    ref_inv, ref_att = ROPE_INIT_FUNCTIONS[rs["rope_type"]](hf_cfg, None)
    mcfg = llama.LlamaConfig.from_hf(hf_cfg)
    mine = llama.rope_inv_freq(mcfg)
    np.testing.assert_allclose(mine, ref_inv.numpy(), rtol=1e-6)
    assert llama.rope_attention_factor(mcfg) == pytest.approx(ref_att)


@pytest.mark.parametrize("rs", [LLAMA3_RS, YARN_RS], ids=["llama3", "yarn"])
def test_static_rope_full_model_logits_match_hf(rs):
    """End-to-end logits parity with context PAST the original pretraining
    window (the regime these scalings exist for)."""
    hf = make_hf(rope_scaling=dict(rs), max_pos=256)
    mcfg, params = lt.convert_hf_model(hf, dtype=jnp.float32)
    assert mcfg.rope_scaling[0] == rs["rope_type"]
    tokens = np.random.RandomState(4).randint(0, 96, size=96)
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)[None]).logits[0].numpy()
    mine, *_ = jax_logits(mcfg, params, tokens)
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=2e-3)


def test_longrope_still_fails_loud():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=4,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "longrope",
                      "short_factor": [1.0] * 8, "long_factor": [2.0] * 8,
                      "original_max_position_embeddings": 64})
    with pytest.raises(NotImplementedError, match="longrope"):
        llama.LlamaConfig.from_hf(hf_cfg)


def test_llama3_rope_engine_lookahead_exact():
    """Lookahead == AR token-exactness is preserved under llama3 scaling
    (the tables feed both decode paths identically)."""
    hf = make_hf(rope_scaling=dict(LLAMA3_RS), max_pos=256)
    mcfg, params = lt.convert_hf_model(hf, dtype=jnp.float32)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=4, guess_set_size=4),
        lt.EngineConfig(max_seq_len=256))
    prompt = list(np.random.RandomState(5).randint(0, 96, size=70))
    la = eng.generate(prompt, max_new_tokens=48)
    ar = eng.generate_baseline(prompt, max_new_tokens=48)
    np.testing.assert_array_equal(la.tokens, ar.tokens)
