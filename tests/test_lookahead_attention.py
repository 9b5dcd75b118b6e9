"""Pallas fused lookahead-attention kernel tests (interpret mode on CPU).

Ground truth is the XLA dense-mask attention path with the mask built from
the golden layout (itself tested against the reference semantics in
test_layout_masks.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.config import LookaheadConfig
from lookaheaddecoding_tpu.core.layout import build_layout
from lookaheaddecoding_tpu.models.llama import attention_xla
from lookaheaddecoding_tpu.ops.lookahead_attention import (
    _spec_visible, lookahead_attention)

NEG = float("-inf")

# On CPU the kernel runs in interpret mode (no Mosaic compiler); on TPU
# (LADE_TEST_TPU=1) run the REAL compiled kernel — that's the evidence the
# hardware pass exists to record. Tolerances: interpret mode is plain XLA
# f32 (tight); the compiled Mosaic kernel's in-kernel dot rounding differs
# slightly from the XLA dense path even at HIGHEST precision (conftest sets
# it), so allow 2e-3 — still 3 orders below the O(1) signal of a mask error.
INTERP = jax.default_backend() == "cpu"
TOL = (dict(atol=2e-5, rtol=2e-4) if INTERP
       else dict(atol=2e-3, rtol=2e-3))


@pytest.mark.parametrize("level,window,guess", [
    (3, 2, 1), (4, 5, 4), (5, 7, 7), (7, 20, 20), (4, 6, 0),
])
def test_in_kernel_mask_arithmetic_matches_layout(level, window, guess):
    lay = build_layout(LookaheadConfig(
        level=level, window_size=window, guess_set_size=guess))
    s = lay.seq_len
    qi = jnp.broadcast_to(jnp.arange(s)[:, None], (s, s))
    rj = jnp.broadcast_to(jnp.arange(s)[None, :], (s, s))
    got = np.asarray(_spec_visible(
        qi, rj, level=level, window=window, guess_size=level - 1))
    np.testing.assert_array_equal(got, lay.spec_mask)


@pytest.mark.parametrize("kv_len", [0, 1, 37, 64, 200])
@pytest.mark.parametrize("rep", [1, 4])
def test_kernel_matches_dense_xla(kv_len, rep):
    lcfg = LookaheadConfig(level=4, window_size=5, guess_set_size=4)
    lay = build_layout(lcfg)
    s = lay.seq_len
    hkv, d, m = 2, 64, 256
    hq = hkv * rep
    rng = jax.random.PRNGKey(kv_len * 10 + rep)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (s, hq, d), jnp.float32)
    k = jax.random.normal(kk, (hkv, m, d), jnp.float32)
    v = jax.random.normal(kv, (hkv, m, d), jnp.float32)

    col = jnp.arange(m)
    spec_add = jnp.asarray(np.where(lay.spec_mask, 0.0, NEG), jnp.float32)
    base = jnp.where(col[None, :] < kv_len, 0.0, NEG) * jnp.ones((s, 1))
    mask = jax.lax.dynamic_update_slice(base, spec_add, (0, kv_len))
    ref = attention_xla(q, k, v, mask)

    out = lookahead_attention(
        q, k, v, jnp.int32(kv_len), level=4, window=5, guess_size=3,
        block_k=64, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **TOL)


@pytest.mark.parametrize("kv_len", [0, 37, 200])
@pytest.mark.parametrize("sw", [16, 100])
def test_kernel_sliding_window_matches_dense(kv_len, sw):
    """Composite mode with a Mistral-style window: committed keys bounded
    below by (q_pos - sw); block skipping must not drop visible keys."""
    from lookaheaddecoding_tpu.core.layout import build_layout as bl
    lcfg = LookaheadConfig(level=4, window_size=5, guess_set_size=4)
    lay = bl(lcfg)
    s = lay.seq_len
    hkv, d, m = 2, 64, 256
    rng = jax.random.PRNGKey(kv_len + sw)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (s, 4 * hkv, d), jnp.float32)
    k = jax.random.normal(kk, (hkv, m, d), jnp.float32)
    v = jax.random.normal(kv, (hkv, m, d), jnp.float32)

    col = np.arange(m)
    q_pos = kv_len + lay.rel_pos
    vis = (col[None, :] < kv_len) & (col[None, :] > q_pos[:, None] - sw)
    mask = np.where(vis, 0.0, NEG).astype(np.float32)
    # speculative block: static within-composite visibility
    mask[:, kv_len:kv_len + s] = np.where(lay.spec_mask, 0.0, NEG)
    ref = attention_xla(q, k, v, jnp.asarray(mask))

    out = lookahead_attention(
        q, k, v, jnp.int32(kv_len), level=4, window=5, guess_size=3,
        block_k=64, sliding_window=sw, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **TOL)


def test_kernel_causal_sliding_window_matches_dense():
    c, hkv, d, m, start, sw = 24, 2, 64, 256, 100, 16
    rng = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (c, 4 * hkv, d), jnp.float32)
    k = jax.random.normal(kk, (hkv, m, d), jnp.float32)
    v = jax.random.normal(kv, (hkv, m, d), jnp.float32)
    col = jnp.arange(m)
    pos = start + jnp.arange(c)
    vis = (col[None, :] <= pos[:, None]) & (col[None, :] > pos[:, None] - sw)
    ref = attention_xla(q, k, v, jnp.where(vis, 0.0, NEG).astype(jnp.float32))
    out = lookahead_attention(
        q, k, v, jnp.int32(start), level=4, window=5, guess_size=3,
        block_k=64, causal=True, sliding_window=sw, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **TOL)


@pytest.mark.parametrize("start", [0, 1, 40, 150])
def test_kernel_causal_prefill_matches_dense(start):
    """Prefill mode: plain causal mask over the live context (query qi at
    absolute slot start+qi sees keys <= its own slot)."""
    c, hkv, rep, d, m = 24, 2, 4, 64, 256
    hq = hkv * rep
    rng = jax.random.PRNGKey(start)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (c, hq, d), jnp.float32)
    k = jax.random.normal(kk, (hkv, m, d), jnp.float32)
    v = jax.random.normal(kv, (hkv, m, d), jnp.float32)

    col = jnp.arange(m)
    pos = start + jnp.arange(c)
    mask = jnp.where(col[None, :] <= pos[:, None], 0.0, NEG).astype(jnp.float32)
    ref = attention_xla(q, k, v, mask)

    out = lookahead_attention(
        q, k, v, jnp.int32(start), level=4, window=5, guess_size=3,
        block_k=64, causal=True, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               **TOL)


def test_e2e_pallas_prefill_matches_xla_prefill():
    """Engine-level: long prompt through the Pallas prefill path must give
    the same generation as the XLA dense prefill path."""
    eng_p, nxt = _predictable_engine("pallas")
    eng_x, _ = _predictable_engine("xla")
    t = int(nxt[3])
    prompt = [t]
    for _ in range(49):   # longer than prefill_chunk=16: multiple chunks
        t = int(nxt[t])
        prompt.append(t)
    out_p = eng_p.generate(prompt, 24)
    out_x = eng_x.generate(prompt, 24)
    np.testing.assert_array_equal(out_p.tokens, out_x.tokens)


def _predictable_engine(attention_impl):
    """Tiny model with decisive argmax margins whose greedy decode follows a
    short deterministic token cycle, so outputs are numerically stable
    across attention implementations and the verification branch gets
    exercised (lookahead thrives on repetitive continuations)."""
    v, h = 64, 64
    mcfg = lt.LlamaConfig(
        vocab_size=v, hidden_size=h, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.02)
    rng = np.random.RandomState(0)
    embed = rng.randn(v, h).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    cycle = rng.choice(v, size=16, replace=False)
    nxt = np.full(v, cycle[0], np.int64)
    nxt[cycle] = np.roll(cycle, -1)
    head = rng.randn(h, v).astype(np.float32) * 0.05
    head[:, nxt[cycle]] = embed[cycle].T * 10.0
    params["embed"] = jnp.asarray(embed)
    params["lm_head"] = jnp.asarray(head)
    lcfg = lt.LookaheadConfig(level=4, window_size=5, guess_set_size=4,
                              pool_from_prompt=True,
                              attention_impl=attention_impl)
    ecfg = lt.EngineConfig(max_seq_len=256, prefill_chunk=16, dtype="float32")
    return lt.LookaheadEngine(mcfg, params, lcfg, ecfg), nxt


def test_e2e_pallas_engine_token_exact_and_compressing():
    eng_p, nxt = _predictable_engine("pallas")
    eng_x, _ = _predictable_engine("xla")
    t = int(nxt[0])
    prompt = [t]
    for _ in range(15):
        t = int(nxt[t])
        prompt.append(t)
    base = eng_x.generate_baseline(prompt, 60)
    lade_p = eng_p.generate(prompt, 60)
    lade_x = eng_x.generate(prompt, 60)
    np.testing.assert_array_equal(lade_p.tokens, base.tokens)
    np.testing.assert_array_equal(lade_x.tokens, base.tokens)
    # deterministic-transition model: near-max compression once warmed up
    assert lade_p.compression_ratio > 1.5


@pytest.mark.parametrize("kv_len", [0, 1, 37, 200])
def test_rolled_spec_mask_matches_iota_path(kv_len):
    """The spec-mask-operand fast path (single KV block, dynamic lane roll)
    must equal the iota-derived mask path bit-for-bit. On CPU the roll runs
    through the jnp.roll interpret emulation, so the mask-placement
    arithmetic is CI-covered; on TPU it exercises the real Mosaic roll."""
    interp = INTERP
    lcfg = LookaheadConfig(level=4, window_size=5, guess_set_size=4)
    lay = build_layout(lcfg)
    s = lay.seq_len
    hkv, d, m = 2, 64, 256
    rng = jax.random.PRNGKey(kv_len)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (s, hkv * 4, d), jnp.float32)
    k = jax.random.normal(kk, (hkv, m, d), jnp.float32)
    v = jax.random.normal(kv, (hkv, m, d), jnp.float32)
    base = lookahead_attention(
        q, k, v, jnp.int32(kv_len), level=4, window=5, guess_size=3,
        interpret=interp)
    rolled = lookahead_attention(
        q, k, v, jnp.int32(kv_len), level=4, window=5, guess_size=3,
        spec_mask=jnp.asarray(lay.spec_mask), interpret=interp)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(rolled))
