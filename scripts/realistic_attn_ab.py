"""A/B the attention impl at the tuned realistic config, e2e on-chip.

Motivation: at mid-band compression the composite step premium over AR
(~0.8 ms at S~65 on the 1.1B arch) cannot be matmul physics — weight
streaming dominates the projection time until S~250 — so the suspects are
composite assembly and the per-pallas-call overhead of the fused
attention kernel (22 layers x per-call cost). The XLA path materializes a
[S, M] mask (65 KB here — trivial) but is plain fused HLO. Whichever wins
becomes the tuned-config default.

    env PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/realistic_attn_ab.py [--level 5 --window 4 --guess 12]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--guess", type=int, default=12)
    ap.add_argument("--new", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from bench import build_predictable_model, make_prompt

    mcfg, params, nxt = build_predictable_model(seed=1, layer_scale=0.036)
    prompt = make_prompt(nxt)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)

    for attn in ("pallas", "xla"):
        lcfg = lt.LookaheadConfig(
            level=args.level, window_size=args.window,
            guess_set_size=args.guess, pool_from_prompt=True,
            attention_impl=attn)
        eng = lt.LookaheadEngine(mcfg, params, lcfg, ecfg)
        eng.generate(prompt, 8)
        eng.generate(prompt, args.new)
        best, ratio = 0.0, 0.0
        for _ in range(3):
            t0 = time.time()
            r = eng.generate(prompt, args.new)
            best = max(best, r.num_generated / (time.time() - t0))
            ratio = r.compression_ratio
        print(f"attn={attn}: {best:.1f} tok/s (ratio {ratio:.2f})",
              flush=True)
        del eng


if __name__ == "__main__":
    main()
