"""Headline benchmark: greedy lookahead decoding speedup over autoregressive
decoding on a TinyLlama-1.1B-architecture model, one TPU chip.

Mirrors the reference's TinyLlama demo configuration (reference:
minimal.py:8-9 LEVEL=7 WINDOW_SIZE=20 GUESS_SET_SIZE=20 POOL_FROM_PROMPT,
256 new tokens; baseline 44 tok/s -> LADE 74 tok/s = 1.68x on 1 GPU fp16,
minimal.py:54-55 / README.md:131-133).

This environment has zero egress, so pretrained TinyLlama weights are not
reachable. The model is the exact TinyLlama architecture (1.1B params,
hidden 2048, 22 layers, GQA 32/4, bf16) with *structured synthetic weights*:
token embeddings are random unit vectors and the LM head is a permuted
embedding transpose, making greedy decoding follow a deterministic
token-transition cycle. The network still executes every real dense/attention
FLOP; the construction only guarantees (a) decisive argmax margins (no
numerical tie-flips) and (b) n-gram-predictable continuations so the
verification branch exercises its accept path — the regime lookahead
decoding targets. Step compression is capped by GUESS_SIZE (= LEVEL-1 = 6),
the same cap the reference has (decoding.py:1077-1084).

Output: ONE JSON line on stdout:
  {"metric": ..., "value": tok/s speedup (lade vs AR), "unit": "x",
   "vs_baseline": value / 1.68 (the reference's headline TinyLlama speedup)}
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_predictable_tinyllama(seed=0):
    import jax
    import jax.numpy as jnp
    import lookaheaddecoding_tpu as lt

    mcfg = lt.LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
        max_position_embeddings=2048, dtype=jnp.bfloat16)
    # Layer weights small enough that the residual stream stays dominated by
    # the token embedding (RMSNorm rescales block inputs to norm ~sqrt(h),
    # so layer contributions must be << embedding scale for the transition
    # structure to survive 22 layers).
    params = lt.init_params(mcfg, jax.random.PRNGKey(seed), scale=0.002)

    rng = np.random.RandomState(seed)
    h = mcfg.hidden_size
    embed = rng.randn(mcfg.vocab_size, h).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    # Deterministic transition map whose orbit is a short cycle: greedy
    # decoding revisits recent context, the repetitive regime lookahead
    # decoding exploits (and where the reference reports its wins).
    cycle = rng.choice(mcfg.vocab_size, size=64, replace=False)
    nxt = np.full(mcfg.vocab_size, cycle[0], np.int64)
    nxt[cycle] = np.roll(cycle, -1)
    head = np.zeros((h, mcfg.vocab_size), np.float32)
    head[:, nxt[cycle]] = embed[cycle].T          # logits peak at nxt(token)
    params["embed"] = jnp.asarray(embed * np.sqrt(h), jnp.bfloat16)
    params["lm_head"] = jnp.asarray(head, jnp.bfloat16)
    return mcfg, params, nxt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt

    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_tinyllama()

    lcfg = lt.LookaheadConfig(level=7, window_size=20, guess_set_size=20,
                              pool_from_prompt=True)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)
    eng = lt.LookaheadEngine(mcfg, params, lcfg, ecfg)

    # prompt follows the model's transition map (a plausible context)
    t = int(nxt[0])
    prompt = [t]
    for _ in range(63):
        t = int(nxt[t])
        prompt.append(t)

    N_NEW = 256
    log("compiling lookahead loop...")
    t0 = time.time()
    eng.generate(prompt, 8)
    eng.generate(prompt, N_NEW)     # full-length warm pass
    log(f"  lookahead compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    r = eng.generate(prompt, N_NEW)
    lade_s = time.time() - t0
    log(f"  LADE: {r.num_generated} tok / {r.steps} steps "
        f"(ratio {r.compression_ratio:.2f}) in {lade_s:.2f}s "
        f"= {r.num_generated/lade_s:.1f} tok/s")

    log("compiling baseline loop...")
    t0 = time.time()
    eng.generate_baseline(prompt, 8)
    eng.generate_baseline(prompt, N_NEW)
    log(f"  baseline compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    rb = eng.generate_baseline(prompt, N_NEW)
    base_s = time.time() - t0
    log(f"  BASE: {rb.num_generated} tok in {base_s:.2f}s "
        f"= {rb.num_generated/base_s:.1f} tok/s")

    exact = bool(np.array_equal(r.tokens, rb.tokens))
    log(f"  token-exact vs baseline: {exact}")

    # bench integrity: generation must actually follow the transition map
    # (guards against residual-stream collapse trivializing compression)
    toks = rb.tokens
    follows = np.mean([toks[i + 1] == nxt[toks[i]]
                       for i in range(len(prompt) - 1, len(toks) - 1)])
    log(f"  transition fidelity: {follows:.3f}")
    assert follows > 0.95, f"synthetic model degenerated (fidelity {follows})"

    lade_tps = r.num_generated / lade_s
    base_tps = rb.num_generated / base_s
    speedup = lade_tps / base_tps
    log(f"  speedup: {speedup:.2f}x (reference headline: 1.68x)")

    print(json.dumps({
        "metric": "tinyllama_1p1b_greedy_lookahead_speedup_vs_ar",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 1.68, 3),
        "detail": {
            "lade_tokens_per_sec": round(lade_tps, 1),
            "ar_tokens_per_sec": round(base_tps, 1),
            "compression_ratio": round(r.compression_ratio, 2),
            "token_exact": exact,
            "config": "LEVEL=7 W=20 G=20 POOL_FROM_PROMPT=1, 256 new tokens",
        },
    }))


if __name__ == "__main__":
    main()
