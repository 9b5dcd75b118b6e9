"""Microbench the int4 unpack-matmul kernel variants on the real chip.

Times x[T,K] @ W[K,N] for the TinyLlama shapes at decode T, comparing:
  - current kernel (mask/xor/exact-divide unpack)
  - i32-shift unpack variant
  - grid order (kb-inner vs kb-outer)
  - int8 XLA path and bf16 for reference
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))

    from lookaheaddecoding_tpu.ops.quant import quantize_weight
    from lookaheaddecoding_tpu.ops import quant_matmul as qm

    shapes = [(2048, 5632), (2048, 2048), (5632, 2048), (2048, 32000)]
    T = 8
    rng = np.random.RandomState(0)

    def timeit(f, x, *ws, n=100):
        # On-device dependency-chained loop: ONE dispatch per measurement so
        # tunnel/dispatch overhead can't pollute the per-op number, and each
        # iteration consumes the previous result so nothing is elided.
        def body(xc, _):
            y = f(xc, *ws)
            bump = (y.astype(jnp.float32).sum() * 1e-30).astype(xc.dtype)
            return xc + bump, ()

        g = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=n)[0])
        r = g(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = g(x)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e6  # us

    # --- shift-unpack kernel variant
    def _kernel_shift(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *,
                      n_kblocks):
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p32 = q_ref[...].astype(jnp.int32)
        lo = ((p32 << 28) >> 28)
        hi = (p32 >> 4)
        xlo = xlo_ref[...]
        xhi = xhi_ref[...]
        dims = (((1,), (0,)), ((), ()))
        acc_ref[...] += (
            jax.lax.dot_general(xlo, lo.astype(xlo.dtype), dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xhi, hi.astype(xhi.dtype), dims,
                                  preferred_element_type=jnp.float32))

        @pl.when(kb == n_kblocks - 1)
        def _finalize():
            o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)

    def shift_matmul(x, q4, scale, block_n, block_k, kb_outer=False):
        t, k = x.shape
        k2, n = q4.shape
        n_kblocks = k2 // block_k
        t_pad = -(-t // 8) * 8
        x_lo, x_hi = x[:, :k2], x[:, k2:]
        if kb_outer:
            grid = (n_kblocks, n // block_n)
            imap_x = lambda kb, nb: (0, kb)
            imap_q = lambda kb, nb: (kb, nb)
            imap_s = lambda kb, nb: (0, nb)
            imap_o = lambda kb, nb: (0, nb)

            def kern(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref):
                kb = pl.program_id(0)
                nb = pl.program_id(1)

                @pl.when(kb == 0)
                def _init():
                    acc_ref[:, nb * block_n:(nb + 1) * block_n] = jnp.zeros(
                        (t_pad, block_n), jnp.float32)

                p32 = q_ref[...].astype(jnp.int32)
                lo = ((p32 << 28) >> 28)
                hi = (p32 >> 4)
                dims = (((1,), (0,)), ((), ()))
                acc_ref[:, nb * block_n:(nb + 1) * block_n] += (
                    jax.lax.dot_general(
                        xlo_ref[...], lo.astype(x.dtype), dims,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        xhi_ref[...], hi.astype(x.dtype), dims,
                        preferred_element_type=jnp.float32))

                @pl.when(kb == n_kblocks - 1)
                def _fin():
                    o_ref[...] = (
                        acc_ref[:, nb * block_n:(nb + 1) * block_n]
                        * s_ref[...]).astype(o_ref.dtype)

            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((t_pad, block_k), imap_x,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t_pad, block_k), imap_x,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_k, block_n), imap_q,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, block_n), imap_s,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((t_pad, block_n), imap_o,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t_pad, n), x.dtype),
                scratch_shapes=[pltpu.VMEM((t_pad, n), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(x_lo, x_hi, q4, scale)

        return pl.pallas_call(
            functools.partial(_kernel_shift, n_kblocks=n_kblocks),
            grid=(n // block_n, n_kblocks),
            in_specs=[
                pl.BlockSpec((t_pad, block_k), lambda nb, kb: (0, kb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_pad, block_k), lambda nb, kb: (0, kb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, block_n), lambda nb, kb: (kb, nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda nb, kb: (0, nb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_pad, block_n), lambda nb, kb: (0, nb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, n), x.dtype),
            scratch_shapes=[pltpu.VMEM((t_pad, block_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(x_lo, x_hi, q4, scale)

    # XLA two-plane variant: two dots against elementwise nibble decodes of
    # the SAME packed buffer — if XLA fuses convert(decode(q)) into the MXU
    # operand load, weight HBM traffic stays at int4 width with XLA's
    # small-T matmul scheduling (no pallas call overhead).
    def xla2_matmul(x, q4, scale):
        k2 = q4.shape[0]
        x_lo, x_hi = x[:, :k2], x[:, k2:]
        lo = ((q4 & 15) ^ 8) - 8
        hi = q4 >> 4
        acc = (jax.lax.dot_general(
                   x_lo, lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   x_hi, hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32))
        return (acc * scale).astype(x.dtype)

    for (K, N) in shapes:
        w = rng.randn(K, N).astype(np.float32) * 0.02
        x = jnp.asarray(rng.randn(T, K), jnp.bfloat16)
        wq4 = quantize_weight(w, 4)
        wq8 = quantize_weight(w, 8)
        wbf = jnp.asarray(w, jnp.bfloat16)
        sol = K * N / 2 / 819e9 * 1e6  # HBM speed-of-light us (int4 bytes)

        t_bf = timeit(jax.jit(lambda x, w: x @ w), x, wbf)
        t_i8 = timeit(jax.jit(
            lambda x, q, s: x @ (q.astype(jnp.bfloat16) * s)),
            x, wq8["q"], wq8["scale"])
        t_cur = timeit(functools.partial(qm.int4_matmul), x, wq4["q4"],
                       wq4["scale"])
        t_xla2 = timeit(jax.jit(xla2_matmul), x, wq4["q4"], wq4["scale"])
        row = (f"K={K:5d} N={N:5d}  sol_i4={sol:6.1f}us  bf16={t_bf:7.1f}  "
               f"int8={t_i8:7.1f}  int4_cur={t_cur:7.1f}  int4_xla2={t_xla2:7.1f}")
        bn = qm._pick_block(N)
        bk = qm._pick_block(K // 2, cap=1408, floor=256)
        try:
            f = jax.jit(functools.partial(
                shift_matmul, block_n=bn, block_k=bk))
            t_shift = timeit(f, x, wq4["q4"], wq4["scale"])
            row += f"  int4_shift={t_shift:7.1f}"
        except Exception as e:
            row += f"  shift FAILED: {str(e)[:60]}"
        try:
            f = jax.jit(functools.partial(
                shift_matmul, block_n=bn, block_k=bk, kb_outer=True))
            t_ko = timeit(f, x, wq4["q4"], wq4["scale"])
            row += f"  int4_kbouter={t_ko:7.1f}"
        except Exception as e:
            row += f"  kbouter FAILED: {str(e)[:60]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
