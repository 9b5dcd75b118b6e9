"""Minimal lookahead decoding demo — TPU-native analog of the reference's
``minimal.py`` (reference: minimal.py:1-56): generate 256 tokens greedily
with and without lookahead on a TinyLlama-class model and report throughput,
compression ratio, and output equality.

With network access / local weights:
    python applications/minimal.py --model TinyLlama/TinyLlama-1.1B-Chat-v1.0
Zero-egress fallback (synthetic TinyLlama-architecture weights):
    python applications/minimal.py --synthetic
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="TinyLlama/TinyLlama-1.1B-Chat-v1.0")
    ap.add_argument("--synthetic", action="store_true",
                    help="use synthetic predictable weights (no downloads)")
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--window", type=int, default=20)
    ap.add_argument("--guess", type=int, default=20)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--attention", choices=["xla", "pallas"], default="xla")
    args = ap.parse_args()

    import jax.numpy as jnp
    import lookaheaddecoding_tpu as lt

    lcfg = lt.LookaheadConfig(
        level=args.level, window_size=args.window, guess_set_size=args.guess,
        pool_from_prompt=True, attention_impl=args.attention)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)

    tok = None
    eos = None
    if args.synthetic:
        import bench as b
        mcfg, params, nxt = b.build_predictable_tinyllama()
        t = int(nxt[0])
        prompt = [t]
        for _ in range(63):
            t = int(nxt[t])
            prompt.append(t)
    else:
        mcfg, params, tok = lt.load_pretrained(args.model, dtype=jnp.bfloat16)
        text = ("Explain, step by step, why the sky appears blue during the "
                "day and red at sunset.")
        chat = f"<|user|>\n{text}</s>\n<|assistant|>\n"
        prompt = tok(chat).input_ids
        eos = tok.eos_token_id

    log = lt.DecodeLog()
    eng = lt.LookaheadEngine(mcfg, params, lcfg, ecfg, log=log)

    # warm both paths (compile)
    eng.generate(prompt, 8, eos_token_id=eos)
    eng.generate_baseline(prompt, 8, eos_token_id=eos)

    t0 = time.time()
    base = eng.generate_baseline(prompt, args.max_new_tokens, eos_token_id=eos)
    t_base = time.time() - t0

    t0 = time.time()
    if args.sample:
        lade = eng.generate_sample(
            prompt, args.max_new_tokens,
            lt.SamplingConfig(temperature=args.temperature),
            eos_token_id=eos)
    else:
        lade = eng.generate(prompt, args.max_new_tokens, eos_token_id=eos)
    t_lade = time.time() - t0

    if tok is not None:
        print("=== output ===")
        print(tok.decode(lade.new_tokens))

    print(f"\nbaseline : {base.num_generated} tok in {t_base:.2f}s "
          f"= {base.num_generated / t_base:.1f} tok/s")
    print(f"lookahead: {lade.num_generated} tok in {t_lade:.2f}s "
          f"= {lade.num_generated / t_lade:.1f} tok/s "
          f"({lade.steps} steps, compression {lade.compression_ratio:.2f})")
    print(f"speedup  : {t_base / t_lade:.2f}x")
    if not args.sample:
        same = np.array_equal(base.tokens, lade.tokens)
        print(f"greedy outputs identical: {same}")
    print(log.log_history())


if __name__ == "__main__":
    main()
