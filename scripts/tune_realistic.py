"""Autotune W/N/G at MID-BAND compression (the reference's realistic regime).

Round-2 finding: at calibrated-noise compression (layer_scale 0.036,
ratio ~1.6-1.9) the demo config L7/W20/G20 is breakeven and the reference's
recommended L5/W7/G7 gives 1.37x — below the reference's claimed 1.5-2.3x
band (reference README.md:90). Nobody had swept the grid AT mid-band
compression; this script points ``utils/tuning.autotune`` at the
calibrated-noise 1.1B model and sweeps around the reference-recommended
point, then reports the winning config + its speedup vs the same engine's
AR baseline (the honest denominator).

    python scripts/tune_realistic.py [--grid small|wide] [--new 256]
        [--noisy-scale 0.036] [--out data/tune_realistic.json]

Run on the real chip with the persistent compile cache enabled (each
candidate compiles its own decode loop: ~20 s warm, minutes cold).
The winner feeds bench.py via LADE_BENCH_REALISTIC_CFG.
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# W/N/G sweep per VERDICT r2 #4: W in 5..10, N in 4..6, G in 4..10
GRIDS = {
    # 3x3x3 core: brackets the reference point L5/W7/G7 (README.md:151)
    "small": list(itertools.product((4, 5, 6), (5, 7, 10), (5, 7, 10))),
    # full cross product (long: ~126 engine compiles)
    "wide": list(itertools.product((4, 5, 6), range(5, 11), range(4, 11))),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", choices=("small", "wide"), default="small")
    ap.add_argument("--new", type=int, default=256)
    ap.add_argument("--noisy-scale", type=float, default=0.036)
    ap.add_argument("--out", default="data/tune_realistic.json")
    ap.add_argument("--budget-s", type=float, default=3000)
    ap.add_argument("--pool-key-len", type=int, default=1, choices=(1, 2),
                    help="2 = bigram pool keys (sharper guess sets on "
                         "noisy/realistic models)")
    ap.add_argument("--candidates", default="",
                    help="comma list of L/W/G triples, e.g. '5/5/10,4/5/7' "
                         "(overrides --grid)")
    args = ap.parse_args()
    t_start = time.time()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.utils.tuning import autotune
    from bench import build_predictable_model, make_prompt, time_generate

    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_model(
        seed=1, layer_scale=args.noisy_scale)
    prompt = make_prompt(nxt)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)

    # AR baseline from the SAME noisy model (the honest denominator)
    eng0 = lt.LookaheadEngine(
        mcfg, params, lt.LookaheadConfig(level=5, window_size=7,
                                         guess_set_size=7,
                                         pool_from_prompt=True), ecfg)
    ar_tps, ar_reps, _ = time_generate(eng0, prompt, args.new, baseline=True)
    log(f"AR baseline: {ar_tps:.1f} tok/s (reps {ar_reps})")
    del eng0

    if args.candidates:
        grid = [tuple(int(v) for v in c.split("/"))
                for c in args.candidates.split(",")]
    else:
        grid = GRIDS[args.grid]
    rows = []
    for i, cand in enumerate(grid):
        if time.time() - t_start > args.budget_s:
            log(f"budget exhausted after {i}/{len(grid)} candidates")
            break
        try:
            _, rep = autotune(mcfg, params, prompt, max_new_tokens=args.new,
                              candidates=[cand], engine_cfg=ecfg,
                              pool_key_len=args.pool_key_len)
        except ValueError as e:
            log(f"  {cand}: infeasible ({e})")
            continue
        r = rep[0]
        speedup = r.tokens_per_sec / ar_tps
        rows.append({
            "level": cand[0], "window_size": cand[1],
            "guess_set_size": cand[2],
            "pool_key_len": args.pool_key_len,
            "tok_per_sec": round(r.tokens_per_sec, 1),
            "speedup_vs_ar": round(speedup, 3),
            "compression_ratio": round(r.compression_ratio, 2),
        })
        log(f"  L{cand[0]}/W{cand[1]}/G{cand[2]}: "
            f"{r.tokens_per_sec:.1f} tok/s ({speedup:.2f}x, "
            f"ratio {r.compression_ratio:.2f})")

    rows.sort(key=lambda x: -x["tok_per_sec"])
    out = {
        "noisy_scale": args.noisy_scale,
        "pool_key_len": args.pool_key_len,
        "ar_tok_per_sec": round(ar_tps, 1),
        "n_candidates_measured": len(rows),
        "grid": args.grid,
        "results": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    if rows:
        w = rows[0]
        log(f"WINNER: L{w['level']}/W{w['window_size']}/G{w['guess_set_size']}"
            f" = {w['tok_per_sec']} tok/s ({w['speedup_vs_ar']}x)")
        log('bench.py env: LADE_BENCH_REALISTIC_CFG='
            f'\'{{"level": {w["level"]}, "window_size": {w["window_size"]},'
            f' "guess_set_size": {w["guess_set_size"]}}}\'')
    print(json.dumps(out))


if __name__ == "__main__":
    main()
