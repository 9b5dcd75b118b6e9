"""E2E A/B of int4 implementations at the 7B architecture.

The block-cap sweep (int4_7b_e2e_capsweep.py) proved the kernel's 7B AR
deficit (47.7 tok/s vs int8's 68.8) is NOT block geometry — identical
tok/s across an 8x cap range. Hypothesis: each pallas_call is a fusion /
async-copy barrier, so the 128 per-step kernel calls serialize weight DMA
with compute, while the int8 XLA-dot path overlaps the next projection's
weight stream with the current dot. Two candidate fixes, same build:

  kernel+pipeline  in-kernel double-buffered DMA/compute overlap (lost at
                   1.1B where the drain step dominated; 7B calls are 10x)
  bitcast          quant._int4_bitcast_matmul — pure XLA dots on s4
                   nibble planes, so XLA's scheduler overlaps across ops

    env PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/int4_7b_impl_ab.py
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.ops import quant
    from bench import build_predictable_model_quantized, make_prompt

    t0 = time.time()
    mc, qp, nx = build_predictable_model_quantized(
        seed=3, bits=4, hidden=4096, inter=11008, layers=32,
        heads=32, kv_heads=32)
    pr = make_prompt(nx)
    print(f"build: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    lcfg = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                              pool_from_prompt=True)

    def run(tag, new=256):
        t0 = time.time()
        e = lt.LookaheadEngine(mc, qp, lcfg,
                               lt.EngineConfig(max_seq_len=1024,
                                               prefill_chunk=128))
        e.generate_baseline(pr, 8)
        e.generate_baseline(pr, new)
        ar = []
        for _ in range(2):
            t1 = time.time()
            r = e.generate_baseline(pr, new)
            ar.append(r.num_generated / (time.time() - t1))
        e.generate(pr, new)
        la = []
        for _ in range(2):
            t1 = time.time()
            r = e.generate(pr, new)
            la.append(r.num_generated / (time.time() - t1))
        print(f"{tag}: AR {max(ar):.1f} tok/s, lade {max(la):.1f} tok/s "
              f"(ratio {r.compression_ratio:.2f}, "
              f"total {time.time()-t0:.0f}s)", flush=True)
        del e
        gc.collect()

    from lookaheaddecoding_tpu.ops import quant_matmul as qm

    quant.INT4_IMPL, quant.INT4_PIPELINE = "bitcast", False
    run("bitcast")
    # Pipeline needs VMEM-sized blocks at 7B: the double-buffered unpack
    # scratch is bf16[block_k, block_n] per buffer — default caps
    # (2816, 16384) ask for 180M of the 128M vmem. 1024x2048 = 4M/buffer.
    quant.INT4_IMPL, quant.INT4_PIPELINE = "kernel", True
    qm.CAP_K, qm.CAP_N = 1024, 2048
    run("kernel+pipeline capK=1024 capN=2048")


if __name__ == "__main__":
    main()
