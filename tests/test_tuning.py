import json

import numpy as np
import jax
import jax.numpy as jnp

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.utils.tuning import (
    REALISTIC_GRID, autotune, measure_ar_baseline, save_tune_artifact)


def test_autotune_returns_best_feasible_config():
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=16))
    best, report = autotune(
        mcfg, params, prompt, max_new_tokens=32,
        candidates=[(4, 5, 5), (5, 7, 7), (20, 40, 40)],  # last is infeasible
        engine_cfg=lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                                   dtype="float32"))
    assert len(report) == 2           # infeasible candidate skipped
    assert best == report[0].config
    assert report[0].tokens_per_sec >= report[1].tokens_per_sec
    assert all(r.compression_ratio >= 1.0 for r in report)


def test_autotune_skips_candidate_whose_step_exceeds_capacity_with_prompt():
    """A candidate can pass engine construction but fail at generate time
    (prompt + composite step > max_seq_len); it must be skipped, not crash."""
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    prompt = list(np.random.RandomState(1).randint(0, 128, size=100))
    # (7,20,20): S=240 fits max_seq_len=256 alone but not with the prompt
    best, report = autotune(
        mcfg, params, prompt, max_new_tokens=16,
        candidates=[(4, 5, 5), (7, 20, 20)],
        engine_cfg=lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                                   dtype="float32"))
    assert len(report) == 1
    assert report[0].config.window_size == 5


def test_autotune_dict_candidates_and_artifact_roundtrip(tmp_path):
    """Dict candidates sweep beyond W/N/G (pool_key_len, attention_impl);
    save_tune_artifact persists the exact schema bench.py consumes."""
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    prompt = list(np.random.RandomState(0).randint(0, 128, size=16))
    ecfg = lt.EngineConfig(max_seq_len=256, prefill_chunk=16,
                           dtype="float32")
    best, report = autotune(
        mcfg, params, prompt, max_new_tokens=24,
        candidates=[(4, 5, 5),
                    {"level": 4, "window_size": 5, "guess_set_size": 5,
                     "pool_key_len": 2}],
        engine_cfg=ecfg)
    assert len(report) == 2
    assert {r.config.pool_key_len for r in report} == {1, 2}

    ar = measure_ar_baseline(mcfg, params, prompt, 24, ecfg)
    assert ar > 0
    path = tmp_path / "tune.json"
    out = save_tune_artifact(str(path), report, ar_tokens_per_sec=ar,
                             noisy_scale=0.036)
    w = json.loads(path.read_text())["results"][0]
    # bench.py reads exactly these keys from results[0]
    assert {"level", "window_size", "guess_set_size",
            "pool_key_len", "speedup_vs_ar"} <= set(w)
    assert w["tok_per_sec"] >= out["results"][-1]["tok_per_sec"]
    # the widened library grid covers the measured mid-band winners
    for pt in ((5, 4, 10), (5, 5, 10), (5, 7, 7), (7, 20, 20)):
        assert pt in REALISTIC_GRID
