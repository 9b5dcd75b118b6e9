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
    assert lcfg.guess_set_size == lade.UNLIMITED_POOL_CAP  # -1 mapped
    assert lcfg.pool_from_prompt and lcfg.attention_impl == "pallas"
    assert ecfg.max_seq_len == 512
    assert lade.CONFIG_MAP["log"] is not None


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
