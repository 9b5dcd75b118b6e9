"""A/B the split-half int4 *bitcast* matmul (quant._int4_bitcast_matmul)
against the Pallas unpack kernel, int8, and bf16 on the real chip.

Methodology note (axon tunnel, 2026-08): the tunnel memoizes repeated
identical dispatches and `block_until_ready` does not actually wait, so
per-call host timing lies. We time N iterations of a `lax.fori_loop`
INSIDE one jit, with a value-feedback carry (x depends on the previous
output, normalized so bf16 never collapses to zeros), and synchronize by
fetching a scalar. Per-iter time = total / N.

Context: scripts/int4_bitcast_probe.py showed the *column-pair* packed
fused convert miscompiles on this toolchain. The impl under test here is
different — split-half packing, two dots on SLICED nibble planes, no
interleaving reshape — so it may sidestep the miscompile. Verify
correctness on-chip before trusting any timing.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/int4_bitcast_probe2.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lookaheaddecoding_tpu.ops import quant
from lookaheaddecoding_tpu.ops.quant_matmul import (
    int4_matmul, int4_matmul_supported)

N_ITERS = 200


def timed_loop(f, x0, w, n=N_ITERS):
    """Time n chained applications of x -> f(x, w) inside one jit.

    Weights are passed as jit ARGUMENTS, never closure constants: the
    axon client cannot fetch device arrays for constant embedding
    (FAILED_PRECONDITION), and XLA's CPU constant folder mis-orders
    int8->int4 bitcast nibbles on embedded constants anyway."""
    def run_impl(x, w):
        def body(i, x):
            out = f(x, w)
            s = jnp.tanh(out.astype(jnp.float32).mean())
            return (x0.astype(jnp.float32) * (1.0 + 1e-3 * s)).astype(
                x0.dtype)
        return lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()

    run = jax.jit(run_impl)
    float(run(x0, w))                    # compile + warm
    t = time.perf_counter()
    float(run(x0, w))                    # fetch = real sync
    return (time.perf_counter() - t) / n


def main():
    rng = np.random.RandomState(0)
    out = {"backend": jax.default_backend()}
    M = 32                                        # composite rows (S≈30)
    for K, N in [(4096, 4096), (4096, 11008), (11008, 4096)]:
        w = jnp.asarray(rng.randn(K, N) * 0.02, jnp.float32)
        q4 = jax.jit(lambda w: quant.quantize_weight(w, bits=4))(w)
        q8 = jax.jit(lambda w: quant.quantize_weight(w, bits=8))(w)
        wbf = w.astype(jnp.bfloat16)
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)

        # on-chip correctness: bitcast vs explicit dequant (weights as
        # jit args, see timed_loop docstring)
        deq = jax.jit(lambda x, q4: x @ quant.dequantize_weight(
            q4, dtype=jnp.bfloat16, k=K))(x, q4).astype(jnp.float32)
        bit = jax.jit(lambda x, q4: quant._int4_bitcast_matmul(
            x, q4, jnp.bfloat16))(x, q4).astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(deq - bit)) / jnp.max(jnp.abs(deq)))
        out[f"{K}x{N}_bitcast_relerr"] = rel

        rows = {}
        rows["bf16"] = timed_loop(lambda x, w: x @ w, x, wbf)
        rows["int8"] = timed_loop(
            lambda x, w: x @ quant.dequantize_weight(w, dtype=jnp.bfloat16),
            x, q8)
        rows["bitcast4"] = timed_loop(
            lambda x, w: quant._int4_bitcast_matmul(x, w, jnp.bfloat16),
            x, q4)
        if (jax.default_backend() != "cpu"
                and int4_matmul_supported(K, q4["q4"].shape)):
            rows["kernel4"] = timed_loop(
                lambda x, w: int4_matmul(x, w["q4"], w["scale"]), x, q4)
        for nm, dt in rows.items():
            bytes_w = {"bf16": 2.0, "int8": 1.0,
                       "bitcast4": 0.5, "kernel4": 0.5}[nm] * K * N
            out[f"{K}x{N}_{nm}_us"] = round(dt * 1e6, 1)
            out[f"{K}x{N}_{nm}_gbps"] = round(bytes_w / dt / 1e9, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
