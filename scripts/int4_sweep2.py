"""int4 e2e sweep, round 2: fused projections (4 Pallas calls/layer) x
block caps, vs int8 given the same lm_head treatment. Per-config
subprocesses; e2e decode tok/s is the metric.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/int4_sweep2.py
"""
import json
import os
import subprocess
import sys

CONFIGS = [
    # label, env, bits, fused, lm8
    ("int4_fused_cap8192", {"LADE_INT4_CAP_N": "8192",
                            "LADE_INT4_CAP_K": "2816"}, 4, True, True),
    ("int4_fused_cap16384", {"LADE_INT4_CAP_N": "16384",
                             "LADE_INT4_CAP_K": "2816"}, 4, True, True),
    ("int8_lm8", {}, 8, False, True),
    ("int8_fused_lm8", {}, 8, True, True),
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

bits = int(os.environ["SWEEP_BITS"])
fused = os.environ["SWEEP_FUSED"] == "1"
lm8 = os.environ["SWEEP_LMHEAD8"] == "1"
mcfg, params, nxt = bench.build_predictable_tinyllama()
if fused:
    from lookaheaddecoding_tpu.models.llama import fuse_params
    params = fuse_params(params)
qp = quantize_params(params, bits=bits, quantize_lm_head=lm8, lm_head_bits=8)
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
    for label, env, bits, fused, lm8 in CONFIGS:
        e = dict(os.environ)
        e.update(env)
        e["SWEEP_BITS"] = str(bits)
        e["SWEEP_FUSED"] = "1" if fused else "0"
        e["SWEEP_LMHEAD8"] = "1" if lm8 else "0"
        print(f"=== {label} ===", flush=True)
        p = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True, timeout=1500)
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
