"""Serial per-projection cost of the 7B int4 path vs int8.

The dispatch-pipelined microbench (int4_7b_probe.py) showed per-op times
bette than HBM sol — cross-call DMA overlap the real serial decode loop
never gets. This probe times each projection as a scan-over-layers with a
serial dependency (output feeds the next layer's input), which is exactly
the decode-loop access pattern, for the int4 kernel vs the XLA int8 path.

    python scripts/int4_7b_breakdown.py [--t 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8)
    # 8 layers keep the bf16 staging tree small (the per-layer serial cost
    # is layer-count independent; 32 layers OOM-churned the 16 GB chip)
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lookaheaddecoding_tpu.ops.quant import quantize_weight, qmatmul

    L, T = args.layers, args.t
    key = jax.random.PRNGKey(0)

    # fused-7B projection shapes
    shapes = [
        ("wqkv", 4096, 12288),
        ("wo", 4096, 4096),
        ("gate_up", 4096, 22016),
        ("down", 11008, 4096),
    ]

    for name, K, N in shapes:
        x = jax.random.normal(key, (T, K), jnp.bfloat16)
        results = {}
        for bits in (4, 8):
            w = jax.random.normal(key, (L, K, N), jnp.bfloat16) * 0.02
            wq = jax.tree.map(lambda a: a.block_until_ready(),
                              quantize_weight(w, bits))
            del w

            @jax.jit
            def chain(x, wq=wq):
                def body(c, p):
                    y = qmatmul(c, p)
                    # fold back to [T, K] to keep the serial dependency
                    return y[:, :K] if N >= K else jnp.pad(
                        y, ((0, 0), (0, K - N))), 0.0
                out, _ = jax.lax.scan(body, x, wq)
                return out

            out = chain(x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = chain(x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / reps / L * 1e6
            results[bits] = dt
            del wq
        packed = K // 2 * N
        sol4 = packed / 819e9 * 1e6
        sol8 = 2 * packed / 819e9 * 1e6
        print(f"{name:8s} K={K:5d} N={N:5d}: int4 {results[4]:7.1f}us/layer "
              f"(sol {sol4:5.1f}) int8 {results[8]:7.1f}us/layer "
              f"(sol {sol8:5.1f})", flush=True)


if __name__ == "__main__":
    main()
