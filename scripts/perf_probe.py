"""Perf probe: time lookahead decode / AR baseline on the real chip under a
chosen attention impl, context size, weight/KV quantization.

    python scripts/perf_probe.py --attn pallas --max-seq 1024 [--quant int8]
        [--kv-quant int8] [--new 256] [--level 7 --window 20 --guess 20]

Prints per-config tok/s to stderr and one JSON line to stdout.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--prefill-chunk", type=int, default=128)
    ap.add_argument("--quant", default=None, choices=(None, "int8", "int4"))
    ap.add_argument("--kv-quant", default=None, choices=(None, "int8"))
    ap.add_argument("--new", type=int, default=256)
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--window", type=int, default=20)
    ap.add_argument("--guess", type=int, default=20)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--baseline", action="store_true",
                    help="also time the AR baseline loop")
    ap.add_argument("--prefill-only", action="store_true",
                    help="time the prefill call instead of decode")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_predictable_tinyllama

    log("devices:", jax.devices())
    mcfg, params, nxt = build_predictable_tinyllama()
    if args.quant:
        from lookaheaddecoding_tpu.ops.quant import quantize_params
        bits = 8 if args.quant == "int8" else 4
        params = quantize_params(params, bits=bits)

    lcfg = lt.LookaheadConfig(
        level=args.level, window_size=args.window, guess_set_size=args.guess,
        pool_from_prompt=True, attention_impl=args.attn)
    ecfg = lt.EngineConfig(max_seq_len=args.max_seq,
                           prefill_chunk=args.prefill_chunk,
                           kv_quant=args.kv_quant)
    eng = lt.LookaheadEngine(mcfg, params, lcfg, ecfg)

    t = int(nxt[0])
    prompt = [t]
    for _ in range(args.prompt_len - 1):
        t = int(nxt[t])
        prompt.append(t)

    out = {"attn": args.attn, "max_seq": args.max_seq, "quant": args.quant,
           "kv_quant": args.kv_quant}

    if args.prefill_only:
        # long-prompt prefill timing: prompt fills most of the context
        plen = args.max_seq - eng.layout.seq_len - args.new - 8
        t0 = int(nxt[0]); prompt = [t0]
        for _ in range(plen - 1):
            t0 = int(nxt[t0]); prompt.append(t0)
        eng.generate(prompt, 2)   # compile
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            st = eng._prepare(prompt, 0)
            jax.block_until_ready(st.k_cache)
        dt = (time.time() - t0) / reps
        log(f"  prefill ctx={plen}: {dt*1e3:.1f} ms")
        out.update(prefill_ms=round(dt * 1e3, 1), prompt_len=plen)
        print(json.dumps(out))
        return

    t0 = time.time()
    eng.generate(prompt, 8)
    eng.generate(prompt, args.new)
    log(f"  compile+warm: {time.time()-t0:.1f}s")
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        r = eng.generate(prompt, args.new)
        dt = time.time() - t0
        best = max(best, r.num_generated / dt)
    log(f"  LADE[{args.attn}]: {r.num_generated} tok / {r.steps} steps "
        f"(ratio {r.compression_ratio:.2f}) best {best:.1f} tok/s")
    out.update(lade_tps=round(best, 1),
               ratio=round(r.compression_ratio, 2), steps=r.steps)

    if args.baseline:
        eng.generate_baseline(prompt, 8)
        eng.generate_baseline(prompt, args.new)
        bbest = 0.0
        for _ in range(3):
            t0 = time.time()
            rb = eng.generate_baseline(prompt, args.new)
            dt = time.time() - t0
            bbest = max(bbest, rb.num_generated / dt)
        log(f"  AR: best {bbest:.1f} tok/s")
        out.update(ar_tps=round(bbest, 1),
                   speedup=round(best / bbest, 3),
                   token_exact=bool(np.array_equal(
                       r.tokens, eng.generate_baseline(prompt, args.new).tokens)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
