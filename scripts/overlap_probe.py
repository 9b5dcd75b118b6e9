"""Does an XLA scan-over-layers of [T,K]@[K,N] dots run at max(BW, MXU)
or at BW+MXU serialized, as T grows toward the v5e machine-balance point
(T ~= 240 rows for bf16)?

The composite lookahead step multiplies per-step MXU FLOPs by its row
count S while weight bytes stay constant; whether the extra arithmetic
hides under the weight streaming decides the headline ceiling
(bench campaign: S=240 step = 6.7 ms vs AR 3.8 ms where roofline says
overlap would make them near-equal).

    python scripts/overlap_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    L, K, N = 22, 2048, 5632          # 1.1B-ish MLP stack: 22 x 23 MB bf16
    wbytes = L * K * N * 2
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (L, K, N), jnp.bfloat16) * 0.02
    wd = jax.random.normal(key, (L, N, K), jnp.bfloat16) * 0.02

    @jax.jit
    def chain(x):
        def body(c, ws):
            wa, wb = ws
            y = c @ wa                      # [T, N]
            return (y @ wb).astype(c.dtype), 0.0
        out, _ = jax.lax.scan(body, x, (w, wd))
        return out

    bw_sol = 2 * wbytes / 819e9 * 1e3       # both stacks stream once
    print(f"stack: 2x{L} dots, {2*wbytes/1e6:.0f} MB bf16, "
          f"BW sol {bw_sol:.2f} ms", flush=True)
    for t in (1, 8, 60, 240, 512):
        x = jax.random.normal(key, (t, K), jnp.bfloat16)
        out = chain(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = chain(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        mxu_sol = 2 * (2 * L * K * N * t) / 197e12 * 1e3
        print(f"T={t:4d}: {dt:6.2f} ms  (BW sol {bw_sol:.2f}, MXU sol "
              f"{mxu_sol:.2f}, max {max(bw_sol, mxu_sol):.2f}, "
              f"sum {bw_sol + mxu_sol:.2f})", flush=True)


if __name__ == "__main__":
    main()
