"""Micro-benchmark: int4 matmul strategies at the decode shapes.

Compares, per TinyLlama-arch projection shape at decode T:
  bf16        — plain MXU matmul (HBM floor = 2 bytes/weight)
  int8        — XLA convert-fused (1 byte/weight)
  int4_plain  — Pallas kernel, unpack->dot serialized per block
  int4_pipe   — Pallas kernel, double-buffered unpack (VPU/MXU overlap)
  pipe_k*/plain_k* — block-size sweep (lane-aligned divisors only)

NOTE: creating a jnp.int4 device array crashes the axon runtime
(RecursionError in the transfer path) AND poisons every timing taken
afterwards in the same process — the native-int4 probe lives in
scripts/int4_native_probe.py, to be run in its own process.

Run ON TPU: env PYTHONPATH=/root/repo python scripts/int4_pipe_micro.py [T]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lookaheaddecoding_tpu.ops.quant import quantize_weight
from lookaheaddecoding_tpu.ops.quant_matmul import int4_matmul


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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shapes = [("gate/up", 2048, 5632), ("down", 5632, 2048),
              ("qo", 2048, 2048), ("kv", 2048, 256)]
    out = {}
    for name, k, n in shapes:
        w = rng.randn(k, n).astype(np.float32) * 0.02
        x = jnp.asarray(rng.randn(T, k), jnp.bfloat16)
        w16 = jnp.asarray(w, jnp.bfloat16)
        q8 = quantize_weight(w, 8)
        q4 = quantize_weight(w, 4)
        s4 = q4["scale"]

        res = {}
        res["bf16"] = timeit(jax.jit(lambda x, w: x @ w), x, w16)
        res["int8"] = timeit(
            jax.jit(lambda x, q, s: x @ (q.astype(jnp.bfloat16)
                                         * s.astype(jnp.bfloat16))),
            x, q8["q"], q8["scale"])
        res["int4_plain"] = timeit(
            lambda x, q, s: int4_matmul(x, q, s, pipeline=False),
            x, q4["q4"], s4)
        res["int4_pipe"] = timeit(
            lambda x, q, s: int4_matmul(x, q, s, pipeline=True),
            x, q4["q4"], s4)
        # block sweep (lane-aligned divisors of k/2 and n only)
        for bk in (256, 512, 1024):
            for bn in (256, 512, 1024, 2048):
                if (k // 2) % bk == 0 and n % bn == 0 and bn <= n:
                    for pipe, tag in ((True, "pipe"), (False, "plain")):
                        res[f"{tag}_k{bk}_n{bn}"] = timeit(
                            lambda x, q, s, bk=bk, bn=bn, p=pipe: int4_matmul(
                                x, q, s, block_n=bn, block_k=bk, pipeline=p),
                            x, q4["q4"], s4)
        out[name] = {kk: (round(v, 1) if isinstance(v, float) else v)
                     for kk, v in res.items()}
        print(name, out[name], flush=True)
    print(json.dumps({"T": T, "shapes": out}))


if __name__ == "__main__":
    main()
