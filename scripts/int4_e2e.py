"""End-to-end int4 decode A/B: AR + lookahead tok/s on the 1.1B bench
model with the current LADE_INT4_PIPELINE setting (per-op micros over the
remote tunnel are too noisy to rank kernel variants — e2e is the metric).

Run ON TPU, once per variant:
    LADE_INT4_PIPELINE=0 python scripts/int4_e2e.py
    LADE_INT4_PIPELINE=1 python scripts/int4_e2e.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.ops.quant import quantize_params, INT4_PIPELINE

    mcfg, params, nxt = bench.build_predictable_tinyllama()
    qp = quantize_params(params, bits=4)
    lcfg = lt.LookaheadConfig(level=7, window_size=20, guess_set_size=20,
                              pool_from_prompt=True)
    eng = lt.LookaheadEngine(mcfg, qp, lcfg,
                             lt.EngineConfig(max_seq_len=1024,
                                             prefill_chunk=128))
    prompt = bench.make_prompt(nxt)
    ar_tps, _, _ = bench.time_generate(eng, prompt, 256, baseline=True, reps=3)
    lade_tps, _, r = bench.time_generate(eng, prompt, 256, reps=3)
    print(json.dumps({"pipeline": INT4_PIPELINE,
                      "ar_tps": round(ar_tps, 1),
                      "lade_tps": round(lade_tps, 1),
                      "ratio": round(r.compression_ratio, 2)}))


if __name__ == "__main__":
    main()
