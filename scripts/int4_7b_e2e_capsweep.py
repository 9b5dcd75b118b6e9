"""E2E block-cap sweep for the int4 kernel at the 7B architecture.

Builds the pre-quantized 7B int4 model ONCE, then for each (CAP_K, CAP_N)
pair rebuilds the engine (the caps feed the kernel's auto block picker)
and times AR decode — the config where the int4-vs-int8 ordering inverts.
Hypothesis: the 1.1B-tuned huge blocks (16384/2816) exceed Mosaic's VMEM
double-buffering budget at 7B shapes, serializing HBM DMA with the
unpack+dot.

    python scripts/int4_7b_e2e_capsweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import gc
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.ops import quant_matmul as qm
    from bench import build_predictable_model_quantized, make_prompt

    t0 = time.time()
    mc, qp, nx = build_predictable_model_quantized(
        seed=3, bits=4, hidden=4096, inter=11008, layers=32,
        heads=32, kv_heads=32)
    pr = make_prompt(nx)
    print(f"build: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    lcfg = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                              pool_from_prompt=True)
    for cap_k, cap_n in [(2816, 16384), (2816, 4096), (1408, 4096),
                         (1408, 2048), (704, 2048)]:
        qm.CAP_K, qm.CAP_N = cap_k, cap_n
        t0 = time.time()
        e = lt.LookaheadEngine(mc, qp, lcfg,
                               lt.EngineConfig(max_seq_len=1024,
                                               prefill_chunk=128))
        e.generate_baseline(pr, 8)
        e.generate_baseline(pr, 256)
        reps = []
        for _ in range(2):
            t1 = time.time()
            r = e.generate_baseline(pr, 256)
            reps.append(r.num_generated / (time.time() - t1))
        print(f"CAP_K={cap_k} CAP_N={cap_n}: AR {max(reps):.1f} tok/s "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
        del e
        gc.collect()


if __name__ == "__main__":
    main()
