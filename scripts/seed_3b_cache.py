"""Pre-seed the persistent XLA compile cache with bench.py's 3B-arch
quant-ordering graphs (cold 3B compiles over the axon tunnel run minutes;
warm they are seconds, which keeps the driver-run bench inside its time
budget). Mirrors the bench variant EXACTLY: L5/W7/G7, quantize THEN fuse
(fusing bf16 first duplicates the stacks and OOMs the chip), per-engine
model rebuild. Prints the measured numbers.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/seed_3b_cache.py [int8|int4 ...]
"""
import gc
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

    lcfg3 = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                               pool_from_prompt=True)
    out = {}
    for nm in which:
        t0 = time.time()
        mcfg3, params3, nxt3 = bench.build_predictable_model(
            seed=2, hidden=3072, inter=11264, layers=24, heads=24,
            kv_heads=8)
        p3 = bench.make_prompt(nxt3)
        qp = quantize_params(params3, bits=4 if nm == "int4" else 8,
                             quantize_lm_head=True, lm_head_bits=8)
        if nm == "int4":
            qp = fuse_params(qp)
        del params3
        gc.collect()
        e = lt.LookaheadEngine(mcfg3, qp, lcfg3,
                               lt.EngineConfig(max_seq_len=1024,
                                               prefill_chunk=128))
        res, _, _ = bench.run_pair(e, p3, 256, f"3b_{nm}")
        out[nm] = res
        print(f"[{nm}] done ({time.time()-t0:.0f}s)", flush=True)
        del e, qp
        gc.collect()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
