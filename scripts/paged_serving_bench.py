"""On-chip 7B paged-serving artifact (VERDICT r4 item 1 "done" criterion).

Measures, on the real v5e chip, the Llama-2-7B-architecture synthetic model
(bench.py builders):

  1. int8 weights + int8-KV: flat fairness serving vs PAGED fairness
     serving at the same lane count — aggregate tok/s, TTFT, and HBM
     actually consumed (the paged pool is sized to the workload's token
     volume instead of lanes x max capacity).
  2. bf16 weights (13.5 GB): the flat engine cannot even hold 2 full-size
     2048-slot KV lanes next to the weights (2 x 1.07 GB -> ~15.7 GB);
     the paged pool runs 4 lanes inside the same chip by owning only the
     pages the workload touches.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/paged_serving_bench.py
Writes data/paged_serving_7b.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_lade"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench  # noqa: E402
import lookaheaddecoding_tpu as lt  # noqa: E402
from lookaheaddecoding_tpu.core.serving import (  # noqa: E402
    ContinuousBatchingEngine, Request)

ARCH_7B = dict(hidden=4096, inter=11008, layers=32, heads=32, kv_heads=32)
M = 2048
PAGE = 256
N_REQ = 8
PROMPT_LEN = 256
MAX_NEW = 128
LCFG = dict(level=5, window_size=7, guess_set_size=7, pool_from_prompt=True)

out = {"chip": str(jax.devices()[0]), "arch": ARCH_7B, "max_seq_len": M,
       "page_size": PAGE, "n_requests": N_REQ, "prompt_len": PROMPT_LEN,
       "max_new": MAX_NEW, "lookahead": LCFG}


def log(*a):
    print("[paged7b]", *a, flush=True)


def hbm_gb():
    s = jax.local_devices()[0].memory_stats() or {}
    return round(s.get("bytes_in_use", 0) / 2**30, 2)


def requests(nxt):
    prompt = bench.make_prompt(nxt, n=PROMPT_LEN)
    return [Request(prompt=prompt, max_new_tokens=MAX_NEW, seed=i,
                    request_id=i) for i in range(N_REQ)]


def run_server(server, reqs, warm=True):
    if warm:   # compile pass
        server.run([Request(prompt=reqs[0].prompt, max_new_tokens=8, seed=0)])
    t0 = time.time()
    results = server.run(list(reqs))
    dt = time.time() - t0
    toks = sum(r.num_generated for r in results)
    assert all(r.error is None for r in results)
    return {
        "aggregate_tok_s": round(toks / dt, 1),
        "total_tokens": int(toks),
        "wall_s": round(dt, 2),
        "ttft_mean_s": round(float(np.mean([r.ttft_s for r in results])), 3),
        "ttft_p99_s": round(float(np.percentile(
            [r.ttft_s for r in results], 99)), 3),
        "compression_mean": round(float(np.mean(
            [r.compression_ratio for r in results])), 2),
    }, results


def main():
    # ---------------- int8: flat vs paged at equal lanes ----------------
    log("building 7B int8 synthetic model (leaf-streamed)...")
    mcfg, params, nxt = bench.build_predictable_model_quantized(
        seed=3, bits=8, **ARCH_7B)
    base_hbm = hbm_gb()
    log(f"weights resident: {base_hbm} GB")
    out["weights_hbm_gb_int8"] = base_hbm
    reqs = requests(nxt)
    lc = lt.LookaheadConfig(**LCFG)
    ec = lt.EngineConfig(max_seq_len=M, prefill_chunk=256, kv_quant="int8")

    # paged: pool budget sized to the workload (pages_needed per request x
    # lanes, plus one page of slack per lane)
    from lookaheaddecoding_tpu.core.paged import pages_needed
    per_req, _ = pages_needed(PROMPT_LEN, MAX_NEW, 56, PAGE, M)
    budget = N_REQ * (per_req + 1)
    log(f"paged: {per_req} pages/request, budget {budget} pages "
        f"({budget * PAGE} tokens) vs flat-equivalent "
        f"{N_REQ * (M // PAGE)} pages")
    paged = lt.PagedServingEngine(mcfg, params, lc, ec, num_lanes=N_REQ,
                                  page_size=PAGE, n_pages=budget,
                                  steps_per_sync=4)
    stats = paged.memory_stats()
    out["paged_int8"] = {"pool_gb": round(stats["pool_bytes"] / 2**30, 2),
                         "flat_equiv_gb": round(
                             stats["flat_equiv_bytes"] / 2**30, 2),
                         "pages_budget": budget}
    m, results = run_server(paged, reqs)
    out["paged_int8"].update(m)
    out["paged_int8"]["hbm_peak_gb"] = hbm_gb()
    log("paged int8:", out["paged_int8"])
    paged_tokens = {r.request_id: np.asarray(r.tokens) for r in results}
    del paged
    import gc; gc.collect()

    flat_eng = lt.LookaheadEngine(mcfg, params, lc, ec)
    flat = ContinuousBatchingEngine(flat_eng, num_lanes=N_REQ,
                                    steps_per_sync=4, objective="fairness")
    m, results = run_server(flat, reqs)
    out["flat_int8"] = dict(m)
    out["flat_int8"]["hbm_peak_gb"] = hbm_gb()
    out["flat_int8"]["kv_gb_8_lanes"] = round(
        8 * (32 * 32 * M * 128 * 2 * 1 + 32 * 32 * M * 2 * 4) / 2**30, 2)
    log("flat int8:", out["flat_int8"])
    # token parity between the two serving stacks (same seeds)
    mismatch = sum(
        0 if np.array_equal(paged_tokens[r.request_id], np.asarray(r.tokens))
        else 1 for r in results)
    out["paged_vs_flat_token_mismatches"] = int(mismatch)
    del flat, flat_eng, params
    gc.collect()

    # ---------------- bf16: paged makes 7B serving fit at all ------------
    log("building 7B bf16 synthetic model...")
    mcfg, params, nxt = bench.build_predictable_model_quantized(
        seed=3, bits=None, **ARCH_7B)
    out["weights_hbm_gb_bf16"] = hbm_gb()
    ec16 = lt.EngineConfig(max_seq_len=M, prefill_chunk=256)
    lanes16 = 4
    reqs16 = requests(nxt)[:lanes16]
    budget16 = lanes16 * (per_req + 1)
    out["flat_bf16_kv_gb_4_lanes"] = round(
        lanes16 * (32 * 32 * M * 128 * 2 * 2) / 2**30, 2)
    try:
        paged16 = lt.PagedServingEngine(
            mcfg, params, lc, ec16, num_lanes=lanes16, page_size=PAGE,
            n_pages=budget16, steps_per_sync=4)
        stats = paged16.memory_stats()
        m, _ = run_server(paged16, reqs16)
        out["paged_bf16"] = dict(
            lanes=lanes16, pool_gb=round(stats["pool_bytes"] / 2**30, 2),
            flat_equiv_gb=round(stats["flat_equiv_bytes"] / 2**30, 2),
            hbm_peak_gb=hbm_gb(), **m)
        log("paged bf16:", out["paged_bf16"])
    except Exception as e:  # noqa: BLE001 — record OOM honestly
        out["paged_bf16"] = {"error": str(e)[:400]}
        log("paged bf16 failed:", str(e)[:200])

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "paged_serving_7b.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log("wrote", path)


if __name__ == "__main__":
    main()
