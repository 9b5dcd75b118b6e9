"""Pre-seed the persistent XLA compile cache with bench.py's 3B-arch
quant-ordering graphs (cold 3B compiles over the axon tunnel run tens of
minutes; warm they are seconds, which keeps the driver-run bench inside
its time budget). Runs the exact same code path as the bench variant and
prints the measured numbers.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/seed_3b_cache.py [int8|int4 ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    which = sys.argv[1:] or ["int8", "int4"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.models.llama import fuse_params
    from lookaheaddecoding_tpu.ops.quant import quantize_params

    t0 = time.time()
    mcfg3, params3, nxt3 = bench.build_predictable_model(
        seed=2, hidden=3072, inter=11264, layers=24, heads=24, kv_heads=8)
    p3 = bench.make_prompt(nxt3)
    print(f"3B model built ({time.time()-t0:.0f}s)", flush=True)

    lcfg = lt.LookaheadConfig(level=7, window_size=20, guess_set_size=20,
                              pool_from_prompt=True)
    out = {}
    for nm in which:
        t0 = time.time()
        p = fuse_params(params3) if nm == "int4" else params3
        qp = quantize_params(p, bits=4 if nm == "int4" else 8,
                             quantize_lm_head=True, lm_head_bits=8)
        print(f"[{nm}] quantized ({time.time()-t0:.0f}s)", flush=True)
        e = lt.LookaheadEngine(mcfg3, qp, lcfg,
                               lt.EngineConfig(max_seq_len=1024,
                                               prefill_chunk=128))
        res, _, _ = bench.run_pair(e, p3, 256, f"3b_{nm}")
        out[nm] = res
        del e, qp, p
    print(json.dumps(out))


if __name__ == "__main__":
    main()
