"""Pre-seed the persistent XLA compile cache with bench.py's 7B-arch
quant-ordering graphs and smoke-test the leaf-streamed pre-quantized build
on the real chip (int4 ~3.5 GB, int8 ~6.8 GB weights; the bf16 7B tree
would not fit next to its quantized copy, hence the streamed builder —
bit-exactness vs the quantize-after-init route is locked by
tests/test_bench_builders.py). Mirrors bench.py's quant_ordering_7b
EXACTLY: Llama-2-7B arch (hidden 4096, 32 layers, MHA, inter 11008),
L5/W7/G7, int8 lm_head, fuse-after-quantize for int4.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/seed_7b_cache.py [int4|int8 ...]
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    which = sys.argv[1:] or ["int4", "int8"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt

    lcfg = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                              pool_from_prompt=True)
    out = {}
    for nm in which:
        t0 = time.time()
        mcfg, qp, nxt = bench.build_predictable_model_quantized(
            seed=3, bits=4 if nm == "int4" else 8, hidden=4096, inter=11008,
            layers=32, heads=32, kv_heads=32)
        print(f"[{nm}] weights built+quantized on device "
              f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
        p = bench.make_prompt(nxt)
        e = lt.LookaheadEngine(mcfg, qp, lcfg,
                               lt.EngineConfig(max_seq_len=1024,
                                               prefill_chunk=128))
        del qp
        gc.collect()
        res, _, _ = bench.run_pair(e, p, 256, f"7b_{nm}")
        out[nm] = res
        print(f"[{nm}] done ({time.time()-t0:.0f}s)", file=sys.stderr,
              flush=True)
        del e
        gc.collect()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
