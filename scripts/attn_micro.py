"""Microbench: lookahead attention Pallas kernel vs the XLA dense path at
exact decode shapes (TinyLlama heads, LEVEL=7 W=20 G=20 composite).

Chained-scan timing: both variants pay the same per-iteration floor, so the
DIFFERENCE between rows is the true per-call delta.

    python scripts/attn_micro.py [--m 1024] [--kv 300]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--kv", type=int, default=300)
    ap.add_argument("--n", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    from lookaheaddecoding_tpu.config import LookaheadConfig
    from lookaheaddecoding_tpu.core.layout import build_layout
    from lookaheaddecoding_tpu.models.llama import attention_xla
    from lookaheaddecoding_tpu.ops.lookahead_attention import lookahead_attention

    NEG = float("-inf")
    lay = build_layout(LookaheadConfig(level=7, window_size=20,
                                       guess_set_size=20))
    S = lay.seq_len
    hkv, rep, d = 4, 8, 64
    hq = hkv * rep
    M, KV = args.m, args.kv
    rng = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (S, hq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (hkv, M, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (hkv, M, d), jnp.bfloat16)
    kvl = jnp.int32(KV)

    col = jnp.arange(M)
    spec_add = jnp.asarray(np.where(lay.spec_mask, 0.0, NEG), jnp.float32)
    base = jnp.where(col[None, :] < KV, 0.0, NEG) * jnp.ones((S, 1))
    mask = jax.lax.dynamic_update_slice(base, spec_add, (0, KV))
    spec_bool = jnp.asarray(lay.spec_mask)

    def timeit(f, n=args.n):
        def body(qc, _):
            y = f(qc)
            bump = (y.astype(jnp.float32).sum() * 1e-30).astype(qc.dtype)
            return qc + bump.reshape(()), ()

        g = jax.jit(lambda q0: jax.lax.scan(body, q0, None, length=n)[0])
        r = g(q)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(g(q))
            best = min(best, (time.perf_counter() - t0) / n * 1e6)
        return best

    rows = {
        "xla_dense": lambda qc: attention_xla(qc, k, v, mask),
        "pallas_iota": lambda qc: lookahead_attention(
            qc, k, v, kvl, level=7, window=20, guess_size=6),
        "pallas_rolled": lambda qc: lookahead_attention(
            qc, k, v, kvl, level=7, window=20, guess_size=6,
            spec_mask=spec_bool),
        "pallas_bk256": lambda qc: lookahead_attention(
            qc, k, v, kvl, level=7, window=20, guess_size=6, block_k=256),
        "pallas_bk512": lambda qc: lookahead_attention(
            qc, k, v, kvl, level=7, window=20, guess_size=6, block_k=512),
    }
    out = {}
    for name, f in rows.items():
        try:
            out[name] = timeit(f)
            print(f"{name:16s} {out[name]:8.1f} us", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED {str(e)[:80]}", flush=True)
    if "xla_dense" in out and "pallas_rolled" in out:
        print(f"delta rolled-vs-xla: {out['pallas_rolled']-out['xla_dense']:+.1f} us/call")


if __name__ == "__main__":
    main()
