"""On-chip streaming-dispatch amortization measurement (VERDICT r4 item 4).

generate_stream pays one jit dispatch + scalar readback per yield; over the
remote-TPU tunnel each round trip is tens of ms, so per-step streaming can
dominate streamed tok/s. ``steps_per_yield=K`` fuses K decode steps per
dispatch (output-identical; chunkier yields). This measures streamed tok/s
for K in {1, 2, 4, 8} against the fused single-dispatch ``generate`` on the
1.1B-arch synthetic model — the chatbot path's actual economics.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/stream_bench.py
Writes data/stream_bench.json.
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

N_NEW = 256
REPS = 3


def main():
    mcfg, params, nxt = bench.build_predictable_model(seed=0)
    eng = lt.LookaheadEngine(
        mcfg, params,
        lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=1024, prefill_chunk=128))
    prompt = bench.make_prompt(nxt)
    out = {"backend": jax.default_backend(), "n_new": N_NEW,
           "config": "1.1B-arch synthetic, L5W7G7, pool_from_prompt"}

    def med(fn):
        fn()                       # compile
        fn()                       # warm
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            n = fn()
            ts.append(n / (time.time() - t0))
        return round(float(np.median(ts)), 1), [round(t, 1) for t in ts]

    def fused():
        return eng.generate(prompt, N_NEW).num_generated

    out["fused_generate_tok_s"], out["fused_reps"] = med(fused)
    print(f"[stream] fused generate: {out['fused_generate_tok_s']} tok/s",
          flush=True)

    base_tokens = None
    for k in (1, 2, 4, 8):
        def stream():
            n = 0
            chunks = []
            for c in eng.generate_stream(prompt, N_NEW, steps_per_yield=k):
                n += len(c)
                chunks.append(c)
            stream.tokens = np.concatenate(chunks)
            return n
        tps, reps = med(stream)
        if base_tokens is None:
            base_tokens = stream.tokens
        else:
            assert np.array_equal(stream.tokens, base_tokens), \
                f"steps_per_yield={k} changed the output"
        out[f"stream_k{k}_tok_s"] = tps
        out[f"stream_k{k}_reps"] = reps
        out[f"stream_k{k}_vs_fused"] = round(
            tps / out["fused_generate_tok_s"], 3)
        print(f"[stream] steps_per_yield={k}: {tps} tok/s "
              f"({out[f'stream_k{k}_vs_fused']:.0%} of fused)", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "stream_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("[stream] wrote", path, flush=True)


if __name__ == "__main__":
    main()
