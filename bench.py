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
verification branch exercises its accept path. Step compression is capped by
GUESS_SIZE (= LEVEL-1 = 6), the same cap the reference has
(decoding.py:1077-1084).

Beyond the headline, the run reports driver-visible variants in ``detail``:

  realistic_compression — same 1.1B architecture with the layer-weight scale
      raised (on-chip-calibrated 0.036) so greedy decoding *deviates* from
      the transition cycle at realistic rates: n-gram guesses miss, partial
      prefixes are accepted, and the compression ratio lands in the
      reference's claimed 1.5-2.3 band (reference README.md:90) instead of
      at the cap. Measured at the demo config AND the reference's
      recommended realistic config L5/W7/G7 (README.md:151).
  int8_kv / int8_weights / int4_weights — quantized decode variants
      (BASELINE.json north star), each at its best measured kernel/fusion
      config with its own AR baseline from the same quantized model.
  quant_ordering_3b — int8 vs int4 at a 3B-class arch, where weight bytes
      dominate the fixed kernel overheads (evidence toward the 70B INT4
      north star).

Variants are time-budgeted (env LADE_BENCH_BUDGET_S, default 2100s): when
the budget is exhausted remaining variants are recorded as "skipped" so the
headline number always lands.

Output: ONE JSON line on stdout:
  {"metric": ..., "value": tok/s speedup (lade vs AR), "unit": "x",
   "vs_baseline": value / 1.68 (the reference's headline TinyLlama speedup)}
"""

import json
import os
import sys
import time

import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("LADE_BENCH_BUDGET_S", "2100"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_predictable_model(seed=0, layer_scale=0.002, hidden=2048,
                            inter=5632, layers=22, heads=32, kv_heads=4):
    """Synthetic-weight model (TinyLlama-1.1B arch by default) whose greedy
    continuations follow a token transition cycle. ``layer_scale`` controls
    how strongly the (random) transformer layers perturb the
    embedding-dominated residual stream: 0.002 keeps the transition
    deterministic (fidelity ~1.0, compression at the GUESS_SIZE cap);
    larger values make decoding context-dependent so n-gram guesses miss
    at realistic rates."""
    import jax
    import jax.numpy as jnp
    import lookaheaddecoding_tpu as lt

    mcfg = lt.LlamaConfig(
        vocab_size=32000, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=2048, dtype=jnp.bfloat16)
    # Layer weights small enough that the residual stream stays dominated by
    # the token embedding (RMSNorm rescales block inputs to norm ~sqrt(h),
    # so layer contributions must be << embedding scale for the transition
    # structure to survive 22 layers).
    params = lt.init_params(mcfg, jax.random.PRNGKey(seed), scale=layer_scale)

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


# scripts/apps call the builder under its original name
build_predictable_tinyllama = build_predictable_model


def make_prompt(nxt, start=0, n=64):
    t = int(nxt[start])
    prompt = [t]
    for _ in range(n - 1):
        t = int(nxt[t])
        prompt.append(t)
    return prompt


def time_generate(eng, prompt, n_new, baseline=False, reps=2):
    """Compile+warm, then best-of-reps throughput."""
    gen = eng.generate_baseline if baseline else eng.generate
    gen(prompt, 8)
    gen(prompt, n_new)          # full-length warm pass
    best_tps, r = 0.0, None
    for _ in range(reps):
        t0 = time.time()
        r = gen(prompt, n_new)
        best_tps = max(best_tps, r.num_generated / (time.time() - t0))
    return best_tps, r


def run_pair(eng, prompt, n_new, label):
    """LADE + AR on one engine; returns the detail dict."""
    t0 = time.time()
    lade_tps, r = time_generate(eng, prompt, n_new)
    log(f"  [{label}] LADE: {r.num_generated} tok / {r.steps} steps "
        f"(ratio {r.compression_ratio:.2f}) best {lade_tps:.1f} tok/s "
        f"(compile+run {time.time()-t0:.0f}s)")
    t0 = time.time()
    ar_tps, rb = time_generate(eng, prompt, n_new, baseline=True)
    log(f"  [{label}] AR: best {ar_tps:.1f} tok/s "
        f"(compile+run {time.time()-t0:.0f}s)")
    exact = bool(np.array_equal(r.tokens, rb.tokens))
    return {
        "lade_tokens_per_sec": round(lade_tps, 1),
        "ar_tokens_per_sec": round(ar_tps, 1),
        "speedup": round(lade_tps / ar_tps, 3),
        "compression_ratio": round(r.compression_ratio, 2),
        "token_exact": exact,
    }, r, rb


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
    log(f"attention_impl resolved: {eng.lcfg.attention_impl}")

    prompt = make_prompt(nxt)
    N_NEW = 256

    # ---------------- headline -----------------------------------------
    headline, r, rb = run_pair(eng, prompt, N_NEW, "headline bf16")

    # bench integrity: generation must actually follow the transition map
    # (guards against residual-stream collapse trivializing compression)
    toks = rb.tokens
    follows = np.mean([toks[i + 1] == nxt[toks[i]]
                       for i in range(len(prompt) - 1, len(toks) - 1)])
    log(f"  transition fidelity: {follows:.3f}")
    assert follows > 0.95, f"synthetic model degenerated (fidelity {follows})"
    assert headline["token_exact"], "lookahead output != AR output"

    detail = {
        "config": "LEVEL=7 W=20 G=20 POOL_FROM_PROMPT=1, 256 new tokens",
        "attention_impl": eng.lcfg.attention_impl,
        **headline,
    }
    variants = {}

    def budget_left():
        return BUDGET_S - (time.time() - T_START)

    # ---------------- realistic-compression variant ---------------------
    # layer_scale 0.036 calibrated on-chip (scripts/calibrate_noisy.py) to
    # land step compression in the reference's claimed 1.5-2.3 band
    # (reference README.md:90) instead of at the GUESS_SIZE cap. Measured
    # at TWO lookahead configs: the demo config (L7/W20/G20 — reuses the
    # headline engine's compiled loops) and the reference's recommended
    # realistic config for 7B-class models, L5/W7/G7 (reference
    # README.md:151): at mid-band compression a small composite wins —
    # the big window's extra per-step rows no longer pay for themselves.
    if budget_left() > 240:
        try:
            _, noisy_params, nxt2 = build_predictable_model(
                seed=1, layer_scale=float(
                    os.environ.get("LADE_BENCH_NOISY_SCALE", "0.036")))
            p2 = make_prompt(nxt2)
            rc = {"noisy_scale": float(
                os.environ.get("LADE_BENCH_NOISY_SCALE", "0.036"))}
            eng.params = noisy_params
            res, rr, _ = run_pair(eng, p2, N_NEW, "realistic L7W20G20")
            toks = rr.tokens
            fid = np.mean([toks[i + 1] == nxt2[toks[i]]
                           for i in range(63, len(toks) - 1)])
            res["transition_fidelity"] = round(float(fid), 3)
            rc["demo_config_L7W20G20"] = res
            eng.params = params
            if budget_left() > 240:
                eng7 = lt.LookaheadEngine(
                    mcfg, noisy_params,
                    lt.LookaheadConfig(level=5, window_size=7,
                                       guess_set_size=7,
                                       pool_from_prompt=True),
                    lt.EngineConfig(max_seq_len=1024, prefill_chunk=128))
                res7, _, _ = run_pair(eng7, p2, N_NEW, "realistic L5W7G7")
                rc["ref_config_L5W7G7"] = res7
                del eng7
            variants["realistic_compression"] = rc
        except Exception as e:  # pragma: no cover - bench resilience
            variants["realistic_compression"] = {"error": str(e)[:200]}
        finally:
            eng.params = params
    else:
        variants["realistic_compression"] = "skipped (budget)"

    # ---------------- quantized variants --------------------------------
    # Each runs its best measured configuration (scripts/int4_sweep*.py):
    # int8 = unfused + int8 lm_head; int4 = gate_up-fused + huge-N-block
    # Pallas kernel + int8 lm_head.
    def quant_engine(mc, p, quant_bits=None, kv_quant=None, lc=None):
        from lookaheaddecoding_tpu.models.llama import fuse_params
        from lookaheaddecoding_tpu.ops.quant import quantize_params
        if quant_bits:
            p = quantize_params(p, bits=quant_bits, quantize_lm_head=True,
                                lm_head_bits=8)
        if quant_bits == 4:
            # fused qkv+gate_up: best measured (sweep3). Fusing AFTER
            # quantization is exactly equivalent (output-channel concat
            # commutes with per-output-channel scales) and concatenates
            # int4 bytes instead of duplicating the bf16 stacks — the
            # bf16 copy OOM'd the chip on the 3B variant.
            p = fuse_params(p)
        return lt.LookaheadEngine(
            mc, p, lc or lcfg,
            lt.EngineConfig(max_seq_len=1024, prefill_chunk=128,
                            kv_quant=kv_quant))

    def quant_variant(name, quant_bits=None, kv_quant=None):
        if budget_left() < 240:
            variants[name] = "skipped (budget)"
            return
        try:
            e = quant_engine(mcfg, params, quant_bits, kv_quant)
            res, _, _ = run_pair(e, prompt, N_NEW, name)
            variants[name] = res
        except Exception as e:  # pragma: no cover - bench resilience
            variants[name] = {"error": str(e)[:200]}

    quant_variant("int8_kv", kv_quant="int8")
    quant_variant("int8_weights", quant_bits=8)
    quant_variant("int4_weights", quant_bits=4)

    # ---------------- 3B-arch int4-vs-int8 ordering ---------------------
    # The 1.1B arch is int4's worst case (per-program kernel overhead vs
    # small dots); at 3B-class shapes weight bytes dominate and int4 must
    # lead. Evidence for the BASELINE north star (70B INT4) within this
    # chip's reach.
    if budget_left() > 700:
        try:
            import gc
            # L5/W7/G7 (the reference's recommended config for 7B-class
            # models): the L7/W20/G20 composite's decode-loop graph at 3B
            # shapes exceeds the remote compile helper's memory cap
            # (subprocess SIGKILL) — and the quant ORDERING story doesn't
            # depend on the lookahead config.
            lcfg3 = lt.LookaheadConfig(level=5, window_size=7,
                                       guess_set_size=7,
                                       pool_from_prompt=True)
            r3 = {}
            for nm, bits in (("int8", 8), ("int4", 4)):
                if budget_left() < 300:   # each engine re-checks: a cold
                    r3[nm] = "skipped (budget)"   # 3B compile is minutes
                    continue
                # rebuild the bf16 model per engine and free it right
                # after quantizing: bf16 (6.6 GB) + both quant trees
                # co-resident exhausted the 16 GB chip
                mcfg3, params3, nxt3 = build_predictable_model(
                    seed=2, hidden=3072, inter=11264, layers=24, heads=24,
                    kv_heads=8)
                p3 = make_prompt(nxt3)
                e = quant_engine(mcfg3, params3, quant_bits=bits, lc=lcfg3)
                del params3
                gc.collect()
                res, _, _ = run_pair(e, p3, N_NEW, f"3b_{nm}")
                r3[nm] = res
                del e
                gc.collect()
            variants["quant_ordering_3b"] = r3
        except Exception as e:  # pragma: no cover - bench resilience
            variants["quant_ordering_3b"] = {"error": str(e)[:200]}
    else:
        variants["quant_ordering_3b"] = "skipped (budget)"

    detail["variants"] = variants
    speedup = headline["speedup"]
    log(f"  headline speedup: {speedup:.2f}x (reference headline: 1.68x); "
        f"total bench time {time.time()-T_START:.0f}s")

    print(json.dumps({
        "metric": "tinyllama_1p1b_greedy_lookahead_speedup_vs_ar",
        "value": speedup,
        "unit": "x",
        "vs_baseline": round(speedup / 1.68, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
