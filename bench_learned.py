"""Learned-model lookahead benchmark.

Unlike bench.py's deterministic-transition model (which saturates the
GUESS_SIZE compression cap), this benchmark uses a model TRAINED on
partially-predictable synthetic text (applications/train_synthetic.py), so
window trajectories and pool n-grams succeed at realistic rates — the
regime behind the reference's 1.5-2.3x end-to-end claims (reference
README.md:90). Trains on first use (~2-4 min on a v5e chip), then benches
AR vs lookahead over a grid of W/N/G configs.

    python bench_learned.py [--ckpt PATH] [--retrain]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default=os.path.expanduser("~/.cache/lade_synth_ckpt"))
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--order", type=int, default=1, choices=(1, 2))
    ap.add_argument("--pool-key-len", type=int, default=1, choices=(1, 2))
    ap.add_argument("--active-vocab", type=int, default=128,
                    help="order-2 corpus token range (must match training)")
    args = ap.parse_args()
    if args.order == 2 and args.ckpt.endswith("lade_synth_ckpt"):
        args.ckpt += "_o2"

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from applications.train_synthetic import make_markov_sampler

    if args.retrain or not os.path.exists(args.ckpt + ".npz"):
        print("training synthetic model...", file=sys.stderr, flush=True)
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "applications", "train_synthetic.py"),
             "--out", args.ckpt, "--order", str(args.order),
             "--active-vocab", str(args.active_vocab)]
            + (["--steps", "2500"] if args.order == 2 else []), check=True)

    mcfg, params = lt.load_params(args.ckpt)
    sampler = make_markov_sampler(
        mcfg.vocab_size, order=args.order,
        active_vocab=args.active_vocab if args.order == 2 else 0)
    prompt = sampler(1, 128, np.random.RandomState(7))[0].tolist()

    results = {}
    base_tps = None
    for (level, window, guess) in ((5, 7, 7), (5, 15, 15), (7, 20, 20)):
        eng = lt.LookaheadEngine(
            mcfg, params,
            lt.LookaheadConfig(level=level, window_size=window,
                               guess_set_size=guess, pool_from_prompt=True,
                               pool_key_len=args.pool_key_len),
            lt.EngineConfig(max_seq_len=1024, prefill_chunk=128))
        if base_tps is None:
            eng.generate_baseline(prompt, 8)
            eng.generate_baseline(prompt, args.max_new)
            t0 = time.time()
            rb = eng.generate_baseline(prompt, args.max_new)
            base_tps = rb.num_generated / (time.time() - t0)
            print(f"AR baseline: {base_tps:.1f} tok/s", file=sys.stderr)
        eng.generate(prompt, 8)
        eng.generate(prompt, args.max_new)
        t0 = time.time()
        r = eng.generate(prompt, args.max_new)
        tps = r.num_generated / (time.time() - t0)
        exact = bool(np.array_equal(
            r.tokens, eng.generate_baseline(prompt, args.max_new).tokens))
        key = f"N{level}_W{window}_G{guess}"
        results[key] = {
            "tokens_per_sec": round(tps, 1),
            "speedup": round(tps / base_tps, 3),
            "compression_ratio": round(r.compression_ratio, 2),
            "token_exact": exact,
        }
        print(f"  {key}: {tps:.1f} tok/s, speedup {tps/base_tps:.2f}x, "
              f"ratio {r.compression_ratio:.2f}, exact {exact}",
              file=sys.stderr)

    best = max(results.values(), key=lambda r: r["speedup"])
    print(json.dumps({
        "metric": f"learned_model_order{args.order}_k{args.pool_key_len}_greedy_lookahead_speedup_vs_ar",
        "value": best["speedup"],
        "unit": "x",
        "vs_baseline": round(best["speedup"] / 1.68, 3),
        "detail": {"ar_tokens_per_sec": round(base_tps, 1), **results},
    }))


if __name__ == "__main__":
    main()
