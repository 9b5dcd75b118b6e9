"""Compat-shim and window-init tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
import lookaheaddecoding_tpu.compat as lade


def test_config_lade_mapping():
    lade.CONFIG_MAP.clear()
    lade.augment_all()
    lade.config_lade(LEVEL=5, WINDOW_SIZE=7, GUESS_SET_SIZE=-1,
                     POOL_FROM_PROMPT=1, USE_FLASH=1, DEBUG=1,
                     MAX_SEQ_LEN=512)
    lcfg, ecfg = lade._configs()
    assert lcfg.level == 5 and lcfg.window_size == 7
    # -1 (unbounded) maps to the measured-lossless bigram pool config
    # (tests/test_unbounded_pool.py), not a lossy unigram cap
    assert lcfg.guess_set_size == lade.UNLIMITED_POOL_CAP
    assert lcfg.pool_key_len == lade.UNLIMITED_POOL_KEY_LEN == 2
    assert lcfg.pool_from_prompt and lcfg.attention_impl == "pallas"
    assert ecfg.max_seq_len == 512
    assert lade.CONFIG_MAP["log"] is not None


def test_config_lade_validates_knob_surface():
    """Unknown keys and dead reference keys warn instead of being silently
    absorbed (the reference's CONFIG_MAP accepts anything, turning typos
    into silently-different behavior)."""
    lade.CONFIG_MAP.clear()
    with pytest.warns(UserWarning, match="unrecognized keys.*WINDOWSIZE"):
        lade.config_lade(WINDOWSIZE=7)          # typo
    with pytest.warns(UserWarning, match="SPLIT_FLAG is a dead key"):
        lade.config_lade(SPLIT_FLAG=1)
    # ALWAYS_FWD_ONE is a real, supported knob in both settings
    lade.CONFIG_MAP.clear()
    lade.config_lade(ALWAYS_FWD_ONE=0, LEVEL=4, WINDOW_SIZE=5,
                     GUESS_SET_SIZE=4)
    lcfg, _ = lade._configs()
    assert lcfg.always_fwd_one is False
    lade.CONFIG_MAP.clear()
    lade.config_lade(ALWAYS_FWD_ONE=1)
    lcfg, _ = lade._configs()
    assert lcfg.always_fwd_one is True


def test_always_fwd_one_zero_token_exact_and_productive():
    """AFO=0 (reference decoding.py:556-573: slide the window by the full
    accepted span, random-refill the tail) must stay token-exact vs the AR
    baseline — window content only proposes — and still compress on a
    repetitive prompt (the pool path is unaffected)."""
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           always_fwd_one=False, pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"))
    prompt = list(np.random.RandomState(3).randint(0, 128, size=12)) * 2
    base = eng.generate_baseline(prompt, 48)
    lade_r = eng.generate(prompt, 48)
    np.testing.assert_array_equal(base.tokens, lade_r.tokens)
    # sampling mode exercises the post-slide EOS filter path as well
    rs = eng.generate_sample(prompt, 24)
    assert rs.num_generated > 0


@pytest.mark.parametrize("init", [
    "copy_from", "random_set", "order_copy_from", "copy_from_last"])
def test_window_init_variants_stay_token_exact(init):
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                           window_init=init),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"))
    prompt = list(np.random.RandomState(0).randint(0, 128, size=14))
    base = eng.generate_baseline(prompt, 40)
    lade_r = eng.generate(prompt, 40)
    np.testing.assert_array_equal(base.tokens, lade_r.tokens)
