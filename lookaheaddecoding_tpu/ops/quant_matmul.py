"""Fused int4 dequantize-matmul Pallas kernel.

XLA handles the int8 weight path well (the int8->bf16 convert fuses into the
MXU operand load), but the int4 nibble unpack does NOT fuse — it
materializes full-width weights every step, making int4 *slower* than bf16.
This kernel streams the packed ``[K/2, N] int8`` buffer from HBM, unpacks
nibbles in VMEM and feeds the MXU directly, so weight HBM traffic is a true
quarter of bf16.

Split-half packing (ops/quant.py:quantize_weight): packed row r holds input
row r in its low nibble and input row r + K/2 in its high nibble. A packed
K-block therefore pairs with TWO activation column blocks — one from each
half — which the kernel takes as separate operands (two narrow dots instead
of a row-interleave shuffle).

Per-output-channel scales are applied once at the K-accumulation epilogue
(they factor out of the contraction exactly, matching the XLA dequant path
in fp32 accumulation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xlo_ref, xhi_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kblocks,
            unpack_bits=32):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Nibble unpack via integer shifts (Mosaic has no i8 vector shifts, so
    # the bytes are widened first): low nibble sign-extends by shifting to
    # the top and arithmetic-shifting back; high nibble is a plain
    # arithmetic shift. Measured faster than the mask/xor/exact-divide
    # formulation (~268 vs ~317us at the 2048x5632 decode shape,
    # scripts/int4_micro.py). unpack_bits=16 runs the shifts on i16 lanes
    # (2 bytes per 32-bit VPU lane — half the vector-op count).
    if unpack_bits == 16:
        p = q_ref[...].astype(jnp.int16)
        lo = (p << 12) >> 12
        hi = p >> 4
    else:
        p = q_ref[...].astype(jnp.int32)               # sign-extended bytes
        lo = (p << 28) >> 28
        hi = p >> 4
    xlo = xlo_ref[...]                                 # [T, BKh]
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


def _kernel_pipe(xlo_ref, xhi_ref, q_ref, s_ref, o_ref,
                 acc_ref, u0lo_ref, u0hi_ref, u1lo_ref, u1hi_ref,
                 *, n_kblocks, unpack_bits=32):
    """Software-pipelined variant: the VPU nibble unpack of K-block ``kb``
    and the MXU dot over K-block ``kb-1`` live in the same grid step but
    touch different double-buffer parities, so Mosaic can overlap them
    (the plain kernel serializes unpack -> dot within every block, leaving
    the MXU idle during ~6 VPU ops/packed byte — above v5e's ~4.7 ops/byte
    VPU:HBM breakeven, which is exactly why int4 trailed int8)."""
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dims = (((1,), (0,)), ((), ()))

    def _dot(lo_ref, hi_ref):
        acc_ref[...] += (
            jax.lax.dot_general(xlo_ref[...], lo_ref[...], dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xhi_ref[...], hi_ref[...], dims,
                                  preferred_element_type=jnp.float32))

    def _unpack(lo_ref, hi_ref):
        if unpack_bits == 16:
            p = q_ref[...].astype(jnp.int16)
            lo_ref[...] = ((p << 12) >> 12).astype(lo_ref.dtype)
        else:
            p = q_ref[...].astype(jnp.int32)
            lo_ref[...] = ((p << 28) >> 28).astype(lo_ref.dtype)
        hi_ref[...] = (p >> 4).astype(hi_ref.dtype)

    parity = jax.lax.rem(kb, 2)

    # dot over the block unpacked in the previous grid step (parity flipped)
    @pl.when(jnp.logical_and(kb > 0, parity == 1))
    def _dot_even():       # kb odd -> previous block kb-1 sits in buffer 0
        _dot(u0lo_ref, u0hi_ref)

    @pl.when(jnp.logical_and(kb > 0, parity == 0))
    def _dot_odd():
        _dot(u1lo_ref, u1hi_ref)

    # unpack block kb into this step's parity buffer
    @pl.when(jnp.logical_and(kb < n_kblocks, parity == 0))
    def _unpack_even():
        _unpack(u0lo_ref, u0hi_ref)

    @pl.when(jnp.logical_and(kb < n_kblocks, parity == 1))
    def _unpack_odd():
        _unpack(u1lo_ref, u1hi_ref)

    @pl.when(kb == n_kblocks)
    def _finalize():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


# Auto block-size caps. Per-program overhead dominates this kernel at
# decode T, so fewer/larger blocks win decisively: on the 1.1B bench model
# raising the caps from 2048/1408 to 16384/2816 (gate_up = ONE program)
# took int4 AR decode 349 -> 385 tok/s (scripts/int4_sweep2.py, v5e).
# Env knobs for on-hardware sweeps.
CAP_N = int(os.environ.get("LADE_INT4_CAP_N", "16384"))
CAP_K = int(os.environ.get("LADE_INT4_CAP_K", "2816"))
# The int8 kernel has its OWN cap knobs (defaults match the int4 ones):
# sweeping LADE_INT4_CAP_* to tune the int4 kernel must not silently
# reshape the int8 kernel it is being A/B'd against.
INT8_CAP_N = int(os.environ.get("LADE_INT8_CAP_N", "16384"))
INT8_CAP_K = int(os.environ.get("LADE_INT8_CAP_K", "5632"))


def _pick_block(dim: int, cap: int = 2048, floor: int = 256) -> int:
    """Largest lane-aligned (x128) divisor of ``dim`` that is <= cap.

    Program-switch overhead dominates this kernel at decode T (the MXU work
    per program is tiny), so FEWER, LARGER blocks win: e.g. N=5632 tiles as
    4 programs of 1408 instead of 11 of 512."""
    for c in range(cap - cap % 128, floor - 1, -128):
        if dim % c == 0:
            return c
    return 0


def pad_packed_rows(k2: int, cap: int = 0) -> int:
    """Packed-row count the int4 kernel should see for input half-dim
    ``k2``: ``k2`` itself when it already tiles with big blocks, else the
    smallest zero-row-padded size that does.

    Real models hit pathological dims: Llama-2-7B's intermediate 11008
    packs to k2=5504 = 128*43 (43 prime) — untileable above the 256-row
    floor, so the whole down projection silently fell back to the XLA
    dequant path (the one this kernel exists to replace); Qwen2-7B's 18944
    packs to 9472 whose only exact tiling is 37 blocks of 256. Zero packed
    rows unpack to zero weights, so padding changes nothing numerically
    (the matmul pads the activation halves to match)."""
    cap = cap or CAP_K
    cap_aligned = cap - cap % 128
    if k2 < 256:
        return k2                            # below the kernel's row floor
    b0 = _pick_block(k2, cap=cap, floor=256)
    if b0 >= 1024:
        return k2
    best = 0
    for nb in range(1, 17):
        rows = -(-k2 // nb)                  # ceil rows per block
        b = -(-rows // 128) * 128            # lane-align up
        if b > cap_aligned or b < 256:
            continue
        k2p = nb * b
        if best == 0 or k2p < best:
            best = k2p
    if best == 0 or best == k2:
        return k2
    # keep an existing exact tiling unless padding is modest
    if b0 and best > k2 * 1.25:
        return k2
    return best


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "pipeline", "unpack_bits",
                                             "interpret"))
def int4_matmul(
    x: jax.Array,        # [T, K] activations
    q4: jax.Array,       # [K/2, N] int8 split-half packed weights
    scale: jax.Array,    # [1, N] fp32 per-output-channel scales
    block_n: int = 0,    # 0 = auto (largest tiling divisor, caps program count)
    block_k: int = 0,    # packed rows per block (= K/2 tile); 0 = auto
    pipeline: bool = False,  # double-buffered unpack (measured: loses e2e)
    unpack_bits: int = 32,   # 16 = i16-lane nibble shifts (half the VPU ops)
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant(q4, scale) with in-kernel nibble unpack.

    ``q4`` may carry zero-padded packed rows (k2p >= K/2, see
    pad_packed_rows): zero rows unpack to zero weights, so the activation
    halves are simply zero-padded to match — the pad touches only the tiny
    [T, pad] activation slices, never the weights."""
    t, k = x.shape
    k2p, n = q4.shape
    k2 = k // 2
    assert k == 2 * k2 and k2p >= k2, "split-half packed weight mismatch"
    auto_n = block_n == 0
    block_n = block_n or _pick_block(n, cap=CAP_N)
    block_k = block_k or _pick_block(k2p, cap=CAP_K, floor=256)
    assert block_n and block_k, "untileable shapes; use the dequant fallback"
    # combined guard (auto sizing only — explicit blocks are the caller's
    # sweep to control): the unpack materializes the block at i32 width in
    # VMEM, so bound block_k x block_n (12M int8 elems ~= 48MB unpacked)
    while auto_n and block_k * block_n > 12 * 1024 * 1024 and block_n > 256:
        smaller = _pick_block(n, cap=block_n - 128)
        if not smaller:
            break
        block_n = smaller
    n_kblocks = k2p // block_k
    t_pad = -(-t // 8) * 8
    if t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0)))
    x_lo, x_hi = x[:, :k2], x[:, k2:]
    if k2p != k2:
        x_lo = jnp.pad(x_lo, ((0, 0), (0, k2p - k2)))
        x_hi = jnp.pad(x_hi, ((0, 0), (0, k2p - k2)))

    if unpack_bits not in (16, 32):
        raise ValueError(f"unpack_bits must be 16 or 32, got {unpack_bits}")
    if pipeline:
        # one extra K step per N block drains the pipeline (dot-only)
        kern = functools.partial(_kernel_pipe, n_kblocks=n_kblocks,
                                 unpack_bits=unpack_bits)
        grid = (n // block_n, n_kblocks + 1)
        last = n_kblocks - 1
        x_idx = lambda nb, kb: (0, jnp.maximum(kb - 1, 0))
        q_idx = lambda nb, kb: (jnp.minimum(kb, last), nb)
        scratch = [pltpu.VMEM((t_pad, block_n), jnp.float32)] + [
            pltpu.VMEM((block_k, block_n), x.dtype) for _ in range(4)]
    else:
        kern = functools.partial(_kernel, n_kblocks=n_kblocks,
                                 unpack_bits=unpack_bits)
        grid = (n // block_n, n_kblocks)
        x_idx = lambda nb, kb: (0, kb)
        q_idx = lambda nb, kb: (kb, nb)
        scratch = [pltpu.VMEM((t_pad, block_n), jnp.float32)]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_pad, block_k), x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, block_k), x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), q_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda nb, kb: (0, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_pad, block_n), lambda nb, kb: (0, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, n), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x_lo, x_hi, q4, scale)
    return out[:t]


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_kblocks):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                       # [T, BK]
    w = q_ref[...].astype(x.dtype)                       # int8 -> bf16/f32
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == n_kblocks - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def int8_matmul(
    x: jax.Array,        # [T, K] activations
    q: jax.Array,        # [K, N] int8 weights
    scale: jax.Array,    # [1, N] fp32 per-output-channel scales
    block_n: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """x @ (q * scale) with the int8->bf16 convert inside the kernel and
    the scale applied once at the K-accumulation epilogue.

    Rationale: the XLA int8 path leaves measurable bandwidth on the table
    at large K*N (7B decode shapes) — the convert is cheap (1 VPU op/byte,
    well under v5e's ~4.7 ops/byte VPU:HBM breakeven, unlike int4's ~6)
    but XLA's epilogue scheduling stalls the weight stream. Same blocking
    strategy as the int4 kernel: fewest, largest lane-aligned blocks."""
    t, k = x.shape
    kq, n = q.shape
    assert kq == k, "weight packed for a different K"
    if not (block_n and block_k):
        auto = _int8_blocks(k, n, t)
        assert auto, "untileable/over-VMEM shapes; use the XLA fallback"
        block_k = block_k or auto[0]
        block_n = block_n or auto[1]
    n_kblocks = k // block_k
    t_pad = -(-t // 8) * 8
    if t_pad != t:
        x = jnp.pad(x, ((0, t_pad - t), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_int8_kernel, n_kblocks=n_kblocks),
        grid=(n // block_n, n_kblocks),
        in_specs=[
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
        interpret=interpret,
    )(x, q, scale)
    return out[:t]


def _int8_blocks(k, n, t=8):
    """Auto block sizing for ``int8_matmul``: largest lane-aligned divisors,
    shrunk (N first, then K) until the int8 block plus its in-kernel bf16
    widening fits the VMEM bound (8M elems ~= 24 MB). Returns
    ``(block_k, block_n)`` or None when no divisor pair fits — callers must
    take the XLA fallback. ``int8_matmul_supported`` mirrors this exactly,
    so the guarded dispatch (quant.qmatmul) never compiles an over-VMEM
    kernel (e.g. N = 128 x prime, where N cannot shrink below its only
    divisor). ``t`` is the activation row count: the T-axis buffers
    (double-buffered x blocks, f32 accumulator, output) scale with it, so
    a block pair fine at decode sizes can blow VMEM at a large prefill
    chunk — they are part of the budget, not just the weight block."""
    t_pad = max(8, -(-t // 8) * 8)
    block_n = _pick_block(n, cap=INT8_CAP_N)
    block_k = _pick_block(k, cap=INT8_CAP_K, floor=256)
    if not (block_n and block_k):
        return None

    def vmem_bytes(bk, bn):
        w = 3 * bk * bn                  # int8 block x2 buffers + widening
        xb = 2 * 2 * t_pad * bk          # bf16 x blocks, double-buffered
        tn = (4 + 2 * 2) * t_pad * bn    # f32 acc + bf16 out x2 buffers
        return w + xb + tn

    # two bounds: the weight block keeps the benched 8M-elem budget (the
    # block sizes all round-4 chip numbers were measured at), and the
    # T-scaled total stays under 64 MB of the 96 MB VMEM limit
    while (block_k * block_n > 8 * 1024 * 1024
           or vmem_bytes(block_k, block_n) > 64 * 1024 * 1024):
        smaller_n = _pick_block(n, cap=block_n - 128)
        if smaller_n:
            block_n = smaller_n
            continue
        smaller_k = _pick_block(k, cap=block_k - 128, floor=256)
        if not smaller_k:
            return None
        block_k = smaller_k
    return block_k, block_n


def int8_matmul_supported(k: int, q_shape, t: int = 8) -> bool:
    kq, n = q_shape
    return kq == k and _int8_blocks(k, n, t) is not None


def int4_matmul_supported(k: int, q4_shape, logical_k2=None) -> bool:
    """Whether the kernel can run x[..., k] @ q4. ``logical_k2`` is the
    weight's pre-padding packed-row count (quant.logical_packed_rows):
    when known, pad-extended rows (k2p > k/2) are accepted only if the
    weight was really packed for THIS k — a q4 packed for a larger K would
    otherwise pass the shape test and silently compute a wrong result (the
    hi-nibble plane rows would no longer correspond to x[:, k2:]). Legacy
    dicts without the sentinel require exact k2p == k/2."""
    k2p, n = q4_shape
    if k % 2 != 0:
        return False
    if logical_k2 is not None:
        if logical_k2 != k // 2 or k2p < logical_k2:
            return False
    elif k2p != k // 2:
        return False
    return (_pick_block(k2p, cap=CAP_K, floor=256) != 0
            and _pick_block(n, cap=CAP_N) != 0)
