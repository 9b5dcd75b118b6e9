"""Per-op A/B: XLA int8 matmul vs the Pallas int8 kernel at decode shapes.

The 7B int8 AR row sits at 56% of the HBM roofline while its bf16 twin
hits 82% — ~2.6 ms/step of epilogue/scheduling overhead somewhere in the
XLA int8 dequant path. This measures whether the in-kernel convert +
epilogue-scale formulation (ops/quant_matmul.py:int8_matmul) recovers it,
per projection shape, at AR (T=8) and composite (T=56) row counts.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/int8_micro.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(f, *args, reps=50):
    import jax
    jax.block_until_ready(f(*args))         # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from lookaheaddecoding_tpu.utils.tuning import enable_compile_cache
    enable_compile_cache()
    from lookaheaddecoding_tpu.ops import quant_matmul as qm
    from lookaheaddecoding_tpu.ops.quant import quantize_weight

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    # Llama-7B decode shapes (qkv/o: 4096x4096, gate/up: 4096x11008,
    # down: 11008x4096, lm_head: 4096x32000) + the 1.1B gate_up shape
    shapes = [(4096, 4096), (4096, 11008), (11008, 4096), (4096, 32000),
              (2048, 5632)]
    out = {}
    for t in (8, 56):
        for k, n in shapes:
            x = jnp.asarray(rng.randn(t, k).astype(np.float32)
                            ).astype(jnp.bfloat16)
            wq = quantize_weight(
                jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.02), 8)

            xla_fn = jax.jit(lambda x, q, s: (
                x @ (q.astype(x.dtype) * s.astype(x.dtype))))
            t_xla = timeit(xla_fn, x, wq["q"], wq["scale"])
            t_xla_f32s = timeit(
                jax.jit(lambda x, q, s:
                        ((x @ q.astype(x.dtype)).astype(jnp.float32) * s
                         ).astype(x.dtype)),
                x, wq["q"], wq["scale"])
            t_kern = timeit(qm.int8_matmul,
                            x, wq["q"], wq["scale"])
            floor_us = k * n / 819e9 * 1e6
            row = dict(xla_us=round(t_xla * 1e6, 1),
                       xla_scale_after_us=round(t_xla_f32s * 1e6, 1),
                       kernel_us=round(t_kern * 1e6, 1),
                       bw_floor_us=round(floor_us, 1))
            out[f"T{t}_{k}x{n}"] = row
            print(f"T={t} {k}x{n}: {row}", flush=True)
    with open("data/int8_micro.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
