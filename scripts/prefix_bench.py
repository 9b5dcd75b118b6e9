"""Prefix-cache benefit on the real chip: wall time and TTFT of a generate
whose prompt shares a long system prefix, with vs without a precomputed
PrefixCache (and the one-off precompute cost for amortization math).

    python scripts/prefix_bench.py [--prefix-len 768] [--suffix-len 24]
        [--new 128] [--reps 5]

Prints one JSON line (detail to data/prefix_bench.json).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix-len", type=int, default=768)
    ap.add_argument("--suffix-len", type=int, default=24)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    args = ap.parse_args()

    import jax
    from lookaheaddecoding_tpu.utils.tuning import enable_compile_cache
    enable_compile_cache()
    import lookaheaddecoding_tpu as lt
    from bench import build_predictable_tinyllama

    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_tinyllama()
    lcfg = lt.LookaheadConfig(level=7, window_size=20, guess_set_size=20,
                              pool_from_prompt=True)
    eng = lt.LookaheadEngine(mcfg, params, lcfg,
                             lt.EngineConfig(max_seq_len=args.max_seq_len,
                                             prefill_chunk=256))

    # prefix/suffix walk the transition cycle so decode behaves like the
    # headline bench
    t = 17
    prefix = [t]
    for _ in range(args.prefix_len - 1):
        t = int(nxt[t])
        prefix.append(t)
    suffix = []
    for _ in range(args.suffix_len):
        t = int(nxt[t])
        suffix.append(t)
    prompt = prefix + suffix

    log("compiling full-prefill generate...")
    eng.generate(prompt, 8)
    t0 = time.time()
    pc = eng.precompute_prefix(prefix)
    jax.block_until_ready(pc.k_cache)
    precompute_s = time.time() - t0        # includes its compile on rep 0
    log(f"precompute_prefix (with compile): {precompute_s:.2f}s")
    t0 = time.time()
    pc = eng.precompute_prefix(prefix)
    jax.block_until_ready(pc.k_cache)
    precompute_s = time.time() - t0
    log(f"precompute_prefix (warm): {precompute_s*1e3:.1f}ms")
    log("compiling prefix generate...")
    eng.generate(prompt, 8, prefix=pc)

    def med(xs):
        return float(np.median(xs))

    full_w, px_w = [], []
    toks = None
    for _ in range(args.reps):
        t0 = time.time()
        r_full = eng.generate(prompt, args.new)
        full_w.append(time.time() - t0)
        t0 = time.time()
        r_px = eng.generate(prompt, args.new, prefix=pc)
        px_w.append(time.time() - t0)
        assert np.array_equal(r_full.tokens, r_px.tokens), "prefix mismatch"
        toks = r_px.num_generated
    full_s, px_s = med(full_w), med(px_w)
    # TTFT proxy for a fused generate = its wall time; the prefill share
    # saved is the difference
    out = {
        "metric": "prefix_cache_wall_time_saved_frac",
        "value": round(1.0 - px_s / full_s, 3),
        "unit": "frac",
        "vs_baseline": round(full_s / px_s, 3),
        "detail": {
            "prefix_len": args.prefix_len,
            "suffix_len": args.suffix_len,
            "new_tokens": args.new,
            "generated": toks,
            "full_prefill_s": round(full_s, 4),
            "with_prefix_s": round(px_s, 4),
            "precompute_warm_s": round(precompute_s, 4),
            "full_reps_s": [round(x, 4) for x in full_w],
            "prefix_reps_s": [round(x, 4) for x in px_w],
            "token_exact": True,
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    with open(os.path.join(root, "data", "prefix_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
