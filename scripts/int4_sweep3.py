"""int4 e2e sweep, round 3: isolate which fusion wins. Sweep-2 data said
fused(cap16384)=385 AR vs unfused(cap8192)=362 vs fused(cap8192)=339 —
attribution: gate_up single-program fusion is the win, qkv fusion the loss.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/int4_sweep3.py
"""
import json
import os
import subprocess
import sys

CONFIGS = [
    # label, fuse mode, caps
    ("int4_gateup_only_cap16384", "gateup",
     {"LADE_INT4_CAP_N": "16384", "LADE_INT4_CAP_K": "2816"}),
    ("int4_unfused_cap16384", "none",
     {"LADE_INT4_CAP_N": "16384", "LADE_INT4_CAP_K": "2816"}),
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
from lookaheaddecoding_tpu.models.llama import fuse_params

mode = os.environ["SWEEP_FUSE"]
mcfg, params, nxt = bench.build_predictable_tinyllama()
if mode == "gateup":
    params = fuse_params(params, qkv=False)
elif mode == "qkv":
    params = fuse_params(params, gate_up=False)
elif mode == "both":
    params = fuse_params(params)
qp = quantize_params(params, bits=4, quantize_lm_head=True, lm_head_bits=8)
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
    for label, mode, env in CONFIGS:
        e = dict(os.environ)
        e.update(env)
        e["SWEEP_FUSE"] = mode
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
