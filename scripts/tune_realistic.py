"""Autotune W/N/G at MID-BAND compression (the reference's realistic regime).

Thin CLI over the library API (utils/tuning.py: autotune +
measure_ar_baseline + save_tune_artifact): points the tuner at the
calibrated-noise 1.1B model, sweeps the L4-L7 x W x G neighborhood (plus
optional bigram pool keys / quantized weights), and persists the artifact
bench.py reads (data/tune_realistic.json) — the tuned realistic config is
reproducible with this one command:

    python scripts/tune_realistic.py [--grid small|realistic|wide]
        [--new 256] [--noisy-scale 0.036] [--quant-bits 0|8|4]
        [--pool-key-len 1|2] [--out data/tune_realistic.json]

Run on the real chip; the persistent compile cache (enabled by autotune)
makes each candidate ~20 s warm / minutes cold.
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


GRIDS = {
    # 3x3x3 core: brackets the reference point L5/W7/G7 (README.md:151)
    "small": list(itertools.product((4, 5, 6), (5, 7, 10), (5, 7, 10))),
    # the library's L4-L7 neighborhood (utils/tuning.REALISTIC_GRID)
    "realistic": None,
    # full cross product (long: ~126 engine compiles)
    "wide": list(itertools.product((4, 5, 6), range(5, 11), range(4, 11))),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", choices=tuple(GRIDS), default="small")
    ap.add_argument("--new", type=int, default=256)
    ap.add_argument("--noisy-scale", type=float, default=0.036)
    ap.add_argument("--out", default="data/tune_realistic.json")
    ap.add_argument("--budget-s", type=float, default=3000)
    ap.add_argument("--quant-bits", type=int, default=0, choices=(0, 8, 4),
                    help="tune on int8/int4-quantized weights (the "
                         "deployment-shaped realistic x quant cell)")
    ap.add_argument("--pool-key-len", type=int, default=1, choices=(1, 2),
                    help="2 = bigram pool keys (sharper guess sets on "
                         "noisy/realistic models)")
    ap.add_argument("--candidates", default="",
                    help="comma list of L/W/G triples, e.g. '5/5/10,4/5/7' "
                         "(overrides --grid)")
    args = ap.parse_args()

    import jax
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.utils.tuning import (
        REALISTIC_GRID, autotune, enable_compile_cache, measure_ar_baseline,
        save_tune_artifact)
    from bench import build_predictable_model, make_prompt

    enable_compile_cache()
    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_model(
        seed=1, layer_scale=args.noisy_scale)
    if args.quant_bits:
        from lookaheaddecoding_tpu.models.llama import fuse_params
        from lookaheaddecoding_tpu.ops.quant import quantize_params
        params = quantize_params(params, bits=args.quant_bits,
                                 quantize_lm_head=True, lm_head_bits=8)
        if args.quant_bits == 4:
            params = fuse_params(params)
    prompt = make_prompt(nxt)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)

    # AR baseline from the SAME (possibly quantized) model: the honest
    # denominator for speedup_vs_ar
    ar_tps = measure_ar_baseline(mcfg, params, prompt, args.new, ecfg)
    log(f"AR baseline: {ar_tps:.1f} tok/s")

    if args.candidates:
        grid = [tuple(int(v) for v in c.split("/"))
                for c in args.candidates.split(",")]
    else:
        grid = GRIDS[args.grid] if GRIDS[args.grid] else REALISTIC_GRID

    def progress(cand, res):
        if res is None:
            log(f"  {cand}: infeasible")
        else:
            c = res.config
            log(f"  L{c.level}/W{c.window_size}/G{c.guess_set_size}: "
                f"{res.tokens_per_sec:.1f} tok/s "
                f"({res.tokens_per_sec / ar_tps:.2f}x, "
                f"ratio {res.compression_ratio:.2f})")

    best, report = autotune(
        mcfg, params, prompt, max_new_tokens=args.new, candidates=grid,
        engine_cfg=ecfg, pool_key_len=args.pool_key_len,
        budget_s=args.budget_s, progress=progress)

    out = save_tune_artifact(
        args.out, report, ar_tokens_per_sec=ar_tps,
        noisy_scale=args.noisy_scale, pool_key_len=args.pool_key_len,
        quant_bits=args.quant_bits, grid=args.grid)
    w = out["results"][0]
    log(f"WINNER: L{w['level']}/W{w['window_size']}/G{w['guess_set_size']}"
        f" = {w['tok_per_sec']} tok/s ({w.get('speedup_vs_ar')}x)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
