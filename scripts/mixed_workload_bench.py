"""Mixed interactive+batch serving measurement (VERDICT r4 Weak #4).

Scenario: 16 batch requests (128 tokens each) land at t=0; ONE interactive
chat request (streaming on_tokens) arrives ~0.7 s later, mid-drain.
Measures the chat request's TTFT and the run's aggregate tok/s under:

  - adaptive + Request(interactive=True)  (the round-5 latency class:
    jumps the queue, always lanes, suspends fused drain while live)
  - adaptive, chat as a plain FIFO request (the round-4 behavior)
  - fairness (everything laned, the latency-first baseline)
  - throughput (lane-less fused drain; interactive degrades to FIFO)

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/mixed_workload_bench.py
Writes data/mixed_workload.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_lade"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench  # noqa: E402
import lookaheaddecoding_tpu as lt  # noqa: E402
from lookaheaddecoding_tpu.core.serving import (  # noqa: E402
    ContinuousBatchingEngine, Request)

N_BATCH = 16
BATCH_TOK = 128
CHAT_TOK = 64
INJECT_S = 0.7


def scenario(eng, objective, interactive_flag):
    server = ContinuousBatchingEngine(eng, num_lanes=4, steps_per_sync=4,
                                      objective=objective)
    # warm BOTH dispatch paths before the clock starts: the lane vstep
    # (via a laned request) AND the fused generate the drain uses —
    # otherwise the first scenario measures compile/cache loads
    server.run([Request(prompt=scenario.prompt, max_new_tokens=8, seed=0)])
    eng.generate(scenario.prompt, 8)
    eng.generate(scenario.chat_prompt, 8)
    for i in range(N_BATCH):
        server.submit(Request(prompt=scenario.prompt,
                              max_new_tokens=BATCH_TOK, seed=i,
                              request_id=i))
    first_chunk = []
    injected = [False]
    t0 = time.time()
    while True:
        alive = server.step()
        if not injected[0] and time.time() - t0 >= INJECT_S:
            server.submit(Request(
                prompt=scenario.chat_prompt, max_new_tokens=CHAT_TOK,
                seed=99, request_id="chat", interactive=interactive_flag,
                on_tokens=lambda c: first_chunk.append(time.time())))
            injected[0] = True
            alive = True
        if not alive and injected[0]:
            break
    dt = time.time() - t0
    results, server._results = server._results, []
    by_id = {r.request_id: r for r in results}
    chat = by_id["chat"]
    toks = sum(r.num_generated for r in results)
    laned = sum(1 for r in results if r.ttft_s < r.latency_s - 1e-9)
    return {
        "chat_ttft_s": round(chat.ttft_s, 3),
        "chat_latency_s": round(chat.latency_s, 3),
        "chat_streamed": bool(first_chunk) and chat.ttft_s < chat.latency_s,
        "aggregate_tok_s": round(toks / dt, 1),
        "wall_s": round(dt, 2),
        "laned_requests": int(laned),
        "fused_requests": len(results) - int(laned),
        "batch_latency_p99_s": round(float(np.percentile(
            [r.latency_s for r in results if r.request_id != "chat"], 99)),
            2),
    }


def main():
    mcfg, params, nxt = bench.build_predictable_model(seed=0)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=1024, prefill_chunk=128))
    scenario.prompt = bench.make_prompt(nxt)
    scenario.chat_prompt = bench.make_prompt(nxt, start=7)
    out = {"backend": jax.default_backend(),
           "workload": f"{N_BATCH} batch x {BATCH_TOK} tok at t=0; "
                       f"1 interactive x {CHAT_TOK} tok at t={INJECT_S}s"}
    for name, obj, flag in (
            ("adaptive_interactive", "adaptive", True),
            ("adaptive_fifo", "adaptive", False),
            ("fairness", "fairness", True),
            ("throughput_fifo", "throughput", True)):
        out[name] = scenario(eng, obj, flag)
        print(f"[mixed] {name}: {out[name]}", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "mixed_workload.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("[mixed] wrote", path, flush=True)


if __name__ == "__main__":
    main()
