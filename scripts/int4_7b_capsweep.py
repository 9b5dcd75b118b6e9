"""Block-size sweep for the int4 kernel at 7B projection shapes, serial
chained timing (decode access pattern). Big auto blocks won at 1.1B decode
shapes (program overhead dominated); at 7B the blocks are ~10x larger and
may exceed what Mosaic can double-buffer in VMEM, serializing the DMA with
the unpack+dot — this sweep finds the knee.

    python scripts/int4_7b_capsweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from lookaheaddecoding_tpu.ops.quant import quantize_weight
    from lookaheaddecoding_tpu.ops.quant_matmul import int4_matmul

    L, T = 8, 8
    key = jax.random.PRNGKey(0)

    cases = [
        ("wqkv", 4096, 12288, [(2048, 4096), (2048, 2048), (1024, 4096),
                               (1024, 2048), (2048, 1024), (512, 2048)]),
        ("gate_up", 4096, 22016, [(2048, 5504), (2048, 2752), (1024, 5504),
                                  (1024, 2752), (2048, 1376), (512, 2752)]),
        ("down", 11008, 4096, [(2816, 4096), (2816, 2048), (1408, 4096),
                               (1408, 2048), (2816, 1024), (704, 2048)]),
    ]
    for name, K, N, blocks in cases:
        x = jax.random.normal(key, (T, K), jnp.bfloat16)
        w = jax.random.normal(key, (L, K, N), jnp.bfloat16) * 0.02
        wq = jax.tree.map(lambda a: a.block_until_ready(),
                          quantize_weight(w, 4))
        del w
        sol = K // 2 * N / 819e9 * 1e6
        line = [f"{name:8s} sol={sol:5.1f}us:"]
        for bk, bn in blocks:
            @jax.jit
            def chain(x, wq=wq, bk=bk, bn=bn):
                def body(c, p):
                    y = int4_matmul(c, p["q4"], p["scale"],
                                    block_k=bk, block_n=bn)
                    return y[:, :K] if N >= K else jnp.pad(
                        y, ((0, 0), (0, K - N))), 0.0
                out, _ = jax.lax.scan(body, x, wq)
                return out

            try:
                out = chain(x)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(20):
                    out = chain(x)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 20 / L * 1e6
                line.append(f"bk{bk}/bn{bn}={dt:.0f}us")
            except Exception as e:
                line.append(f"bk{bk}/bn{bn}=FAIL({str(e)[:30]})")
        print(" ".join(line), flush=True)
        del wq


if __name__ == "__main__":
    main()
