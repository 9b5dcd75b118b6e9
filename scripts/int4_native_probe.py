"""Probe: can XLA's native int4 dtype replace the custom unpack kernel?

Host->device transfer of S4 arrays crashes the axon runtime, so the int4
buffer is produced ON DEVICE (jit int8 -> int4 convert) and then used as a
stored operand. If XLA fuses the int4->bf16 convert into the MXU operand
load (as it does for int8), weights stream at 0.5 B/weight with zero VPU
unpack cost and the custom kernel becomes a fallback.

Also probes an i16-lane unpack variant of the Pallas kernel path cheaply
(outside the kernel, to see if Mosaic legalizes i16 vector shifts at all).

Run ON TPU in its own process (int4 failures can poison later timings).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, reps=200):
    fn(*args).block_until_ready()
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e6  # us


def main():
    rng = np.random.RandomState(0)
    out = {}
    T, K, N = 8, 2048, 5632
    q8 = jnp.asarray(rng.randint(-7, 8, size=(K, N)), jnp.int8)
    s = jnp.asarray(np.abs(rng.randn(1, N)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.randn(T, K), jnp.bfloat16)

    # baseline int8 path
    out["int8"] = timeit(
        jax.jit(lambda x, q, s: x @ (q.astype(jnp.bfloat16)
                                     * s.astype(jnp.bfloat16))),
        x, q8, s)

    # native int4: convert on device, keep the buffer, matmul from it
    try:
        w4 = jax.jit(lambda q: q.astype(jnp.int4))(q8)
        w4.block_until_ready()
        print("int4 buffer created on device:", w4.dtype, w4.shape,
              file=sys.stderr)
        out["int4_native"] = timeit(
            jax.jit(lambda x, q, s: x @ (q.astype(jnp.bfloat16)
                                         * s.astype(jnp.bfloat16))),
            x, w4, s)
    except Exception as e:
        out["int4_native"] = f"error: {str(e)[:160]}"

    # for reference: the custom kernel path in the same process
    try:
        from lookaheaddecoding_tpu.ops.quant import quantize_weight
        from lookaheaddecoding_tpu.ops.quant_matmul import int4_matmul
        w = rng.randn(K, N).astype(np.float32) * 0.02
        q4 = quantize_weight(w, 4)
        out["int4_kernel_plain"] = timeit(
            lambda x, q, s: int4_matmul(x, q, s, pipeline=False),
            x, q4["q4"], q4["scale"])
    except Exception as e:
        out["int4_kernel_plain"] = f"error: {str(e)[:160]}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
