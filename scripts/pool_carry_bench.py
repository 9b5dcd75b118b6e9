"""Conversation KV+pool reuse on the real chip: a multi-turn chat where
each turn continues from the previous result, comparing three strategies:

- full:    re-prefill the whole conversation every turn (reference
           behavior — it also rebuilds token_map per call, decoding.py:911)
- kv:      PrefixCache KV reuse only (prefill just the new message),
           cold pool each turn
- kv+pool: PrefixCache KV reuse + the carried warm n-gram pool

    env PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/pool_carry_bench.py [--turns 4] [--new 48] [--reps 3]

Prints one JSON line (detail to data/pool_carry_bench.json).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_conversation(eng, nxt, turns, new, mode):
    """One full conversation; returns per-turn (steps, wall_s, tokens)."""
    t = 0
    prompt = []
    for _ in range(24):
        t = int(nxt[t])
        prompt.append(t)
    conv = list(prompt)
    px = None
    out = []
    for _ in range(turns):
        t0 = time.perf_counter()
        if mode == "full":
            r = eng.generate(conv, new)
        else:
            use = px
            if use is not None and mode == "kv":
                use = dataclasses.replace(use, pool=None)
            r = eng.generate(conv, new, prefix=use, return_prefix=True)
            px = r.prefix
        wall = time.perf_counter() - t0
        out.append((r.steps, wall, r.num_generated))
        conv = list(r.tokens)
        t = int(conv[-1])
        for _ in range(8):                    # the next user message
            t = int(nxt[t])
            conv.append(t)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4)
    ap.add_argument("--new", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--window", type=int, default=7)
    ap.add_argument("--guess", type=int, default=7)
    ap.add_argument("--pool-from-prompt", action="store_true",
                    help="chatbot regime: every turn also host-fills the "
                    "pool from the prompt (suffix-restricted when a warm "
                    "pool is carried)")
    args = ap.parse_args()

    import jax
    from lookaheaddecoding_tpu.utils.tuning import enable_compile_cache
    enable_compile_cache()
    import lookaheaddecoding_tpu as lt
    from bench import build_predictable_model

    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_model()
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=args.level, window_size=args.window,
                           guess_set_size=args.guess,
                           pool_from_prompt=args.pool_from_prompt),
        lt.EngineConfig(max_seq_len=2048, prefill_chunk=128))

    detail = {}
    for mode in ("full", "kv", "kv+pool"):
        run_conversation(eng, nxt, args.turns, args.new, mode)  # warm compile
        reps = [run_conversation(eng, nxt, args.turns, args.new, mode)
                for _ in range(args.reps)]
        # median wall per rep-conversation; steps are deterministic per rep
        walls = [sum(w for _, w, _ in rep) for rep in reps]
        toks = sum(n for _, _, n in reps[0])
        steps = [s for s, _, _ in reps[0]]
        detail[mode] = {
            "per_turn_steps": steps,
            "total_steps": int(sum(steps)),
            "total_tokens": int(toks),
            "wall_s_median": round(float(np.median(walls)), 4),
            "tok_per_s": round(toks / float(np.median(walls)), 1),
        }
        log(f"[{mode}] steps/turn {steps} wall {detail[mode]['wall_s_median']}s "
            f"{detail[mode]['tok_per_s']} tok/s")

    out = {
        "config": {"turns": args.turns, "new": args.new,
                   "level": args.level, "window": args.window,
                   "guess": args.guess,
                   "pool_from_prompt": args.pool_from_prompt,
                   "backend": jax.devices()[0].platform},
        "modes": detail,
        "kv_speedup_vs_full": round(
            detail["kv"]["tok_per_s"] / detail["full"]["tok_per_s"], 3),
        "pool_speedup_vs_kv": round(
            detail["kv+pool"]["tok_per_s"] / detail["kv"]["tok_per_s"], 3),
        "steps_saved_by_pool": int(detail["kv"]["total_steps"]
                                   - detail["kv+pool"]["total_steps"]),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    with open(os.path.join(root, "data", "pool_carry_bench_fill.json" if args.pool_from_prompt else "pool_carry_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
