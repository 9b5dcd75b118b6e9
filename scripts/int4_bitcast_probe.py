"""XLA-native int4 probe: would `bitcast packed int8 -> jnp.int4 ->
reshape -> convert -> dot` give zero-VPU fused int4 dequant (weights
streaming at 0.5 B/weight like the int8 convert does)?

MEASURED VERDICT on the 2026-08 toolchain (v5e via axon): the standalone
bitcast+reshape+convert round-trips BIT-EXACTLY, and a dot through
lax.optimization_barrier (forced materialization) is exact to 2.5e-8 —
but the FUSED convert-into-dot MISCOMPILES (relerr ~2.4 at every shape
from 128x128 to 2048x5632). Materializing per step defeats the purpose,
so the Pallas unpack kernel (ops/quant_matmul.py) stays the int4 path.
Keep this probe to re-test on toolchain updates.

Run ON TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/int4_bitcast_probe.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    rng = np.random.RandomState(0)
    out = {}
    for (K, N) in [(128, 128), (2048, 5632)]:
        q = rng.randint(-7, 8, size=(K, N)).astype(np.int8)
        # pack column pairs: byte(k, c) = nibble q[k,2c] (lo) | q[k,2c+1] (hi)
        # -> [K, N/2, 2] after bitcast, reshape [K, N] with NO transpose
        packed = jnp.asarray(
            ((q[:, 0::2] & 0xF) | ((q[:, 1::2] & 0xF) << 4)).astype(np.int8))
        x = jnp.asarray(rng.randn(8, K), jnp.bfloat16)
        ref = np.asarray(x, np.float32) @ q.astype(np.float32)

        rec = np.asarray(jax.jit(
            lambda w8: lax.bitcast_convert_type(w8, jnp.int4)
            .reshape(K, N).astype(jnp.float32))(packed))
        out[f"{K}x{N}_recovery_exact"] = bool(
            np.array_equal(rec, q.astype(np.float32)))

        def mm(x, w8, barrier):
            w = (lax.bitcast_convert_type(w8, jnp.int4)
                 .reshape(K, N).astype(jnp.bfloat16))
            if barrier:
                w = lax.optimization_barrier(w)
            return jnp.dot(x, w, preferred_element_type=jnp.float32)

        for nm, barrier in (("fused", False), ("barrier", True)):
            r = np.asarray(jax.jit(mm, static_argnums=2)(x, packed, barrier))
            out[f"{K}x{N}_{nm}_relerr"] = float(
                np.max(np.abs(r - ref)) / np.max(np.abs(ref)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
