"""Continuous-batching throughput AND latency benchmark on the real chip.

Measures, for N requests submitted at once, under THREE schedulers:

  1. raw sequential loop over ``LookaheadEngine.generate`` (no scheduler)
  2. ContinuousBatchingEngine(objective="throughput") — queue + fused
     sequential generates (optionally --batch-group)
  3. ContinuousBatchingEngine(objective="adaptive") — fused drain while
     the backlog is deeper than the lanes, lane scheduler for the tail
  4. ContinuousBatchingEngine(objective="fairness") — the lane scheduler

per scheduler: aggregate tok/s, and the per-request TTFT and end-to-end
latency distributions (mean / p50 / p99, measured from submit). On one
chip each lookahead lane is a full composite of MXU work, so (2) should
match (1) within noise and beat (3) on aggregate tok/s; what (3) buys for
that cost is exactly the TTFT/tail-latency numbers this script reports —
sequential draining gives queue-position TTFT (mean ~= half the batch
makespan) while lanes start every admitted request within steps_per_sync
decode steps.

    python scripts/serving_bench.py [--lanes 4] [--requests 16] [--new 128]
        [--steps-per-sync 8] [--sampling] [--batch-group 1]

Prints one JSON line to stdout (full detail to data/serving_latency.json).
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
    ap.add_argument("--lanes", type=int, default=4)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--steps-per-sync", type=int, default=8)
    ap.add_argument("--sampling", action="store_true")
    ap.add_argument("--batch-group", type=int, default=1)
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--window", type=int, default=20)
    ap.add_argument("--guess", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.core.serving import (
        ContinuousBatchingEngine, Request)
    from bench import build_predictable_tinyllama

    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_tinyllama()

    lcfg = lt.LookaheadConfig(
        level=args.level, window_size=args.window, guess_set_size=args.guess,
        pool_from_prompt=True)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)
    eng = lt.LookaheadEngine(mcfg, params, lcfg, ecfg)

    # distinct prompts: different offsets into the transition cycle
    rng = np.random.RandomState(0)
    prompts = []
    for i in range(args.requests):
        t = int(rng.randint(mcfg.vocab_size))
        p = [t]
        for _ in range(63):
            t = int(nxt[t])
            p.append(t)
        prompts.append(p)

    sampling = lt.SamplingConfig(temperature=0.8) if args.sampling else None

    def lat_stats(ttfts, lats):
        return {
            "ttft_mean_s": round(float(np.mean(ttfts)), 3),
            "ttft_p50_s": round(float(np.percentile(ttfts, 50)), 3),
            "ttft_p99_s": round(float(np.percentile(ttfts, 99)), 3),
            "latency_mean_s": round(float(np.mean(lats)), 3),
            "latency_p50_s": round(float(np.percentile(lats, 50)), 3),
            "latency_p99_s": round(float(np.percentile(lats, 99)), 3),
        }

    def sched_stats(results):
        ok = [r for r in results if r.latency_s is not None]
        return lat_stats([r.ttft_s for r in ok], [r.latency_s for r in ok])

    # --- sequential reference
    gen = (lambda p: eng.generate_sample(p, args.new, sampling)) \
        if args.sampling else (lambda p: eng.generate(p, args.new))
    log("compiling sequential path...")
    t0 = time.time()
    gen(prompts[0])
    log(f"  compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    seq_tokens = 0
    seq_lats = []
    for p in prompts:
        seq_tokens += gen(p).num_generated
        # all requests "submitted" at t0: request i waits for 0..i-1
        seq_lats.append(time.time() - t0)
    seq_s = time.time() - t0
    seq_tps = seq_tokens / seq_s
    seq_stats = lat_stats(seq_lats, seq_lats)   # fused: TTFT == latency
    log(f"  sequential: {seq_tokens} tok in {seq_s:.2f}s = {seq_tps:.1f} "
        f"tok/s  {seq_stats}")

    # --- throughput objective (queue + fused sequential generates)
    thr = ContinuousBatchingEngine(
        eng, objective="throughput", sampling=sampling,
        batch_group=args.batch_group)
    reqs_t = [Request(p, args.new, request_id=i, seed=i)
              for i, p in enumerate(prompts)]
    if args.batch_group > 1:
        # warm with a FULL batch_group so the vmapped loop at the real
        # group width compiles outside the timed region
        log("compiling batch-group path...")
        t0 = time.time()
        thr.run([Request(prompts[i % len(prompts)], 8, request_id=f"w{i}")
                 for i in range(args.batch_group)])
        log(f"  compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    results_t = thr.run(reqs_t)
    thr_s = time.time() - t0
    thr_tokens = sum(r.num_generated for r in results_t)
    thr_tps = thr_tokens / thr_s
    thr_stats = sched_stats(results_t)
    log(f"  serving[throughput, group={args.batch_group}]: {thr_tokens} tok "
        f"in {thr_s:.2f}s = {thr_tps:.1f} tok/s  {thr_stats}")

    # --- adaptive objective (fused drain for the overflow, lanes for the
    # tail; compiles both paths, which the two warms above already cover)
    ada = ContinuousBatchingEngine(
        eng, num_lanes=args.lanes, steps_per_sync=args.steps_per_sync,
        sampling=sampling, objective="adaptive",
        batch_group=args.batch_group)
    reqs_a = [Request(p, args.new, request_id=i, seed=i)
              for i, p in enumerate(prompts)]
    log("compiling adaptive lane path...")
    t0 = time.time()
    ada.run([Request(prompts[0], 8, request_id="warm")])
    log(f"  compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    results_a = ada.run(reqs_a)
    ada_s = time.time() - t0
    ada_tokens = sum(r.num_generated for r in results_a)
    ada_tps = ada_tokens / ada_s
    ada_stats = sched_stats(results_a)
    log(f"  serving[adaptive, {args.lanes} lanes, group={args.batch_group}]: "
        f"{ada_tokens} tok in {ada_s:.2f}s = {ada_tps:.1f} tok/s  {ada_stats}")

    # --- fairness objective (lane scheduler)
    srv = ContinuousBatchingEngine(
        eng, num_lanes=args.lanes, steps_per_sync=args.steps_per_sync,
        sampling=sampling)
    reqs = [Request(p, args.new, request_id=i, seed=i)
            for i, p in enumerate(prompts)]
    log("compiling serving path...")
    t0 = time.time()
    srv.run([Request(prompts[0], 8, request_id="warm")])
    log(f"  compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    results = srv.run(reqs)
    srv_s = time.time() - t0
    srv_tokens = sum(r.num_generated for r in results)
    srv_tps = srv_tokens / srv_s
    srv_stats = sched_stats(results)
    log(f"  serving[fairness, {args.lanes} lanes]: {srv_tokens} tok "
        f"in {srv_s:.2f}s = {srv_tps:.1f} tok/s  {srv_stats}")

    best = max(thr_tps, srv_tps, ada_tps)
    out = {
        "metric": "serving_best_aggregate_tokens_per_sec",
        "value": round(best, 1),
        "unit": "tok/s",
        "vs_baseline": round(best / seq_tps, 3),
        "detail": {
            "sequential": {"tok_per_sec": round(seq_tps, 1), **seq_stats},
            "throughput_objective": {"tok_per_sec": round(thr_tps, 1),
                                     **thr_stats},
            "adaptive_objective": {"tok_per_sec": round(ada_tps, 1),
                                   **ada_stats},
            "fairness_objective": {"tok_per_sec": round(srv_tps, 1),
                                   **srv_stats},
            "batch_group": args.batch_group,
            "lanes": args.lanes,
            "requests": args.requests,
            "new_tokens": args.new,
            "steps_per_sync": args.steps_per_sync,
            "sampling": bool(args.sampling),
            "mean_compression": round(
                float(np.mean([r.compression_ratio for r in results])), 2),
        },
    }
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "serving_latency.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
