"""Round-4 probe: realistic-band compression x quantization on-chip.

Maps the honest-regime design space before wiring bench variants:
  (a) noise-scale sweep at the tuned realistic config (L5/W4/G10) — where
      in the reference's 1.5-2.3 band (README.md:90) each scale lands;
  (b) the same model int8-quantized — the realistic x int8 matrix cell
      (VERDICT r3 #1), LADE and AR from the same quantized weights.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/probe_realistic_r4.py [scales...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def measure(eng, prompt, n_new, nxt, reps=3):
    eng.generate(prompt, 8)
    eng.generate(prompt, n_new)
    tps = []
    r = None
    for _ in range(reps):
        t0 = time.time()
        r = eng.generate(prompt, n_new)
        tps.append(r.num_generated / (time.time() - t0))
    toks = r.tokens
    fid = np.mean([toks[i + 1] == nxt[toks[i]]
                   for i in range(63, len(toks) - 1)])
    ar = []
    eng.generate_baseline(prompt, 8)
    eng.generate_baseline(prompt, n_new)
    for _ in range(reps):
        t0 = time.time()
        rb = eng.generate_baseline(prompt, n_new)
        ar.append(rb.num_generated / (time.time() - t0))
    return dict(lade=round(float(np.median(tps)), 1),
                ar=round(float(np.median(ar)), 1),
                speedup=round(float(np.median(tps) / np.median(ar)), 3),
                ratio=round(r.compression_ratio, 2),
                fidelity=round(float(fid), 3),
                exact=bool(np.array_equal(r.tokens, rb.tokens)))


def main():
    import jax
    from lookaheaddecoding_tpu.utils.tuning import enable_compile_cache
    enable_compile_cache()
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.models.llama import fuse_params
    from lookaheaddecoding_tpu.ops.quant import quantize_params

    print("devices:", jax.devices(), flush=True)
    scales = [float(s) for s in (sys.argv[1:]
                                 or ["0.026", "0.030", "0.033", "0.036"])]
    lcfg = lt.LookaheadConfig(level=5, window_size=4, guess_set_size=10,
                              pool_from_prompt=True)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)
    out = {"config": "L5/W4/G10", "bf16": {}, "int8": {}, "int4": {}}
    eng = eng8 = eng4 = None
    for s in scales:
        mcfg, params, nxt = bench.build_predictable_tinyllama(
            seed=1, layer_scale=s)
        prompt = bench.make_prompt(nxt, n=64)
        if eng is None:
            eng = lt.LookaheadEngine(mcfg, params, lcfg, ecfg)
        else:
            eng.params = params
        out["bf16"][s] = measure(eng, prompt, 256, nxt)
        print(f"bf16  scale {s}: {out['bf16'][s]}", flush=True)

        p8 = quantize_params(params, bits=8, quantize_lm_head=True,
                             lm_head_bits=8)
        if eng8 is None:
            eng8 = lt.LookaheadEngine(mcfg, p8, lcfg, ecfg)
        else:
            eng8.params = p8
        out["int8"][s] = measure(eng8, prompt, 256, nxt)
        print(f"int8  scale {s}: {out['int8'][s]}", flush=True)
        del p8

        p4 = fuse_params(quantize_params(params, bits=4,
                                         quantize_lm_head=True,
                                         lm_head_bits=8))
        if eng4 is None:
            eng4 = lt.LookaheadEngine(mcfg, p4, lcfg, ecfg)
        else:
            eng4.params = p4
        out["int4"][s] = measure(eng4, prompt, 256, nxt)
        print(f"int4  scale {s}: {out['int4'][s]}", flush=True)
        del p4, params

    with open("data/probe_realistic_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
