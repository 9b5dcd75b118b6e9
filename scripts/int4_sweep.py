"""int4 e2e sweep: AR + lookahead tok/s on the 1.1B bench model across
kernel configurations (block caps, unpack lane width, int8 lm_head).
Per-op micros over the remote tunnel are too noisy to rank variants — e2e
decode throughput is the metric.

Each config runs in a SUBPROCESS so the env knobs (module-level constants)
bind cleanly and an int4 failure can't poison later timings.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/int4_sweep.py
"""
import json
import os
import subprocess
import sys

CONFIGS = [
    # label, env overrides, quantize lm_head (int8)
    ("base", {}, False),
    ("bigblocks", {"LADE_INT4_CAP_N": "8192", "LADE_INT4_CAP_K": "2816"}, False),
    ("unpack16", {"LADE_INT4_UNPACK_BITS": "16"}, False),
    ("bigblocks+unpack16", {"LADE_INT4_CAP_N": "8192",
                            "LADE_INT4_CAP_K": "2816",
                            "LADE_INT4_UNPACK_BITS": "16"}, False),
    ("bigblocks+lmhead8", {"LADE_INT4_CAP_N": "8192",
                           "LADE_INT4_CAP_K": "2816"}, True),
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import bench
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_lade"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.ops.quant import quantize_params

lm8 = os.environ.get("SWEEP_LMHEAD8", "0") != "0"
mcfg, params, nxt = bench.build_predictable_tinyllama()
qp = quantize_params(params, bits=4, quantize_lm_head=lm8, lm_head_bits=8)
lcfg = lt.LookaheadConfig(level=7, window_size=20, guess_set_size=20,
                          pool_from_prompt=True)
eng = lt.LookaheadEngine(mcfg, qp, lcfg,
                         lt.EngineConfig(max_seq_len=1024, prefill_chunk=128))
prompt = bench.make_prompt(nxt)
ar_tps, _, _ = bench.time_generate(eng, prompt, 256, baseline=True, reps=3)
lade_tps, _, r = bench.time_generate(eng, prompt, 256, reps=3)
print("RESULT " + json.dumps({"ar_tps": round(ar_tps, 1),
                              "lade_tps": round(lade_tps, 1),
                              "ratio": round(r.compression_ratio, 2)}),
      flush=True)
"""


def main():
    results = {}
    for label, env, lm8 in CONFIGS:
        e = dict(os.environ)
        e.update(env)
        e["SWEEP_LMHEAD8"] = "1" if lm8 else "0"
        print(f"=== {label} ===", flush=True)
        p = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True, timeout=1200)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            results[label] = json.loads(line[-1][7:])
            print(label, results[label], flush=True)
        else:
            results[label] = {"error": (p.stderr or p.stdout)[-300:]}
            print(label, "FAILED", results[label], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
