"""Decompose the lookahead decode-step time on the real chip by stubbing out
one subsystem at a time (pool update, verification, attention impl) and
timing the jitted step. Ablations change semantics — this is a profiling
tool, not a correctness path.

    python scripts/step_breakdown.py [--attn xla|pallas]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(eng, label, n=40):
    import jax
    import jax.numpy as jnp
    state = eng._prepare([1, 2, 3, 4, 5, 6, 7, 8] * 8, 0)
    eos = jnp.full((4,), -1, jnp.int32)
    st = eng._step(eng.params, state, jnp.int32(10_000), eos)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(n):
        st = eng._step(eng.params, st, jnp.int32(10_000), eos)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / n * 1e3
    log(f"  {label:34s} {dt:7.2f} ms/step")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attn", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--window", type=int, default=20)
    ap.add_argument("--guess", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.core import pool as pool_mod
    from lookaheaddecoding_tpu.core import step as step_mod
    from bench import build_predictable_tinyllama

    mcfg, params, _ = build_predictable_tinyllama()
    lcfg = lt.LookaheadConfig(level=args.level, window_size=args.window,
                              guess_set_size=args.guess,
                              pool_from_prompt=True, attention_impl=args.attn)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128)

    def build():
        return lt.LookaheadEngine(mcfg, params, lcfg, ecfg)

    log(f"attn={args.attn}")
    full = time_step(build(), "full step")

    # --- no pool update
    orig_pool_update = pool_mod.pool_update
    step_mod.pool_update = lambda pool, *a, **k: pool
    t = time_step(build(), "pool_update stubbed")
    step_mod.pool_update = orig_pool_update
    log(f"    -> pool_update cost ~{full - t:.2f} ms")

    # --- no pool lookup (constant guesses)
    import jax.numpy as jnp
    orig_lookup = pool_mod.pool_lookup

    def fake_lookup(pool, key):
        g, gs = pool.values.shape[1], pool.values.shape[2]
        return (jnp.zeros((g, gs), jnp.int32), jnp.zeros((g,), bool))
    step_mod.pool_lookup = fake_lookup
    t = time_step(build(), "pool_lookup stubbed")
    step_mod.pool_lookup = orig_lookup
    log(f"    -> pool_lookup cost ~{full - t:.2f} ms")

    # --- baseline AR step for scale
    eng = build()
    state = eng._prepare([1, 2, 3, 4, 5, 6, 7, 8] * 8, 0)
    eos = jnp.full((4,), -1, jnp.int32)
    st = eng._baseline_step(eng.params, state, jnp.int32(10_000), eos)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(40):
        st = eng._baseline_step(eng.params, st, jnp.int32(10_000), eos)
    jax.block_until_ready(st)
    log(f"  {'AR baseline step':34s} {(time.perf_counter()-t0)/40*1e3:7.2f} ms/step")


if __name__ == "__main__":
    main()
