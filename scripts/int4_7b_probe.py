"""Per-projection int4-kernel timing at Llama-2-7B shapes (fused layout).

Hypothesis for the 7B int4 < int8 ordering in BENCH campaign data: the
down projection K=11008 packs to k2=5504 = 128*43 (43 prime), so
_pick_block can only tile it as 43 k-blocks of 128 rows — per-program
overhead ~43x a clean tiling. This probe times every fused 7B projection
shape with the current auto blocks and with a zero-row-padded packed
operand (k2 padded to a multiple of 2816 -> 2 big blocks).

    python scripts/int4_7b_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench(f, *a, n=50):
    import jax
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e6  # us


def main():
    import jax
    import jax.numpy as jnp
    from lookaheaddecoding_tpu.ops.quant_matmul import int4_matmul, _pick_block, CAP_K, CAP_N

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    T = 8  # decode row count (AR=1 padded to 8)

    shapes = [
        ("wqkv", 4096, 12288),
        ("wo", 4096, 4096),
        ("gate_up", 4096, 22016),
        ("down", 11008, 4096),
        ("lm_head", 4096, 32000),
    ]
    for name, K, N in shapes:
        k2 = K // 2
        x = jax.random.normal(key, (T, K), jnp.bfloat16)
        q4 = jax.random.randint(key, (k2, N), -128, 127, jnp.int8)
        s = jnp.ones((1, N), jnp.float32)
        bk, bn = _pick_block(k2, cap=CAP_K, floor=256), _pick_block(N, cap=CAP_N)
        sol = k2 * N / 819e9 * 1e6
        try:
            t = bench(lambda x, q, s: int4_matmul(x, q, s), x, q4, s)
            cur = f"{t:8.1f}us ({k2*N/t/1e3:6.1f} GB/s)"
        except Exception as e:
            cur = f"FAIL {str(e)[:60]}"
        # padded variant: pad k2 to multiple of 2816 when tiling is poor
        pad_note = ""
        if bk and k2 % 2816:
            k2p = -(-k2 // 2816) * 2816
            q4p = jnp.pad(q4, ((0, k2p - k2), (0, 0)))
            xlo = jnp.pad(x[:, :k2], ((0, 0), (0, k2p - k2)))
            xhi = jnp.pad(x[:, k2:], ((0, 0), (0, k2p - k2)))
            xp = jnp.concatenate([xlo, xhi], axis=1)
            try:
                tp = bench(lambda x, q, s: int4_matmul(x, q, s), xp, q4p, s)
                pad_note = f" padded(k2={k2p}): {tp:8.1f}us ({k2*N/tp/1e3:6.1f} GB/s)"
            except Exception as e:
                pad_note = f" padded FAIL {str(e)[:60]}"
        print(f"{name:8s} K={K:5d} N={N:5d} blocks=({bk},{bn}) "
              f"nkb={k2//bk if bk else -1} sol={sol:6.1f}us cur={cur}{pad_note}",
              flush=True)


if __name__ == "__main__":
    main()
