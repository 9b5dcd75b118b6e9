"""Fused lookahead attention kernel (Pallas / Mosaic).

TPU-native equivalent of the reference's forked FlashAttention CUDA kernel
``flash_attn_lade`` (reference: lade/models/modeling_llama.py:58-63 import,
:680-715 invocation; the fork applies the composite lookahead+verification
mask *inside* the kernel, parameterized by a 7-int descriptor, instead of
materializing a dense additive mask). Here the mask is derived analytically
per KV block from integer iota arithmetic and one runtime scalar
(``kv_len``; the W/N/G layout is compile-time), with:

  - online-softmax accumulation over KV blocks (FlashAttention-2 style) —
    but when the cache fits ONE KV block (the common decode configuration)
    a specialized kernel computes the softmax directly with no VMEM
    scratch, no running-max/denominator bookkeeping and no accumulator
    round-trips,
  - ALL KV heads processed per program (static unroll) so the grid is just
    the KV-block axis — per-program overhead, not FLOPs, dominates this
    kernel at decode sizes, and the composite mask is computed once per
    block and shared across heads,
  - grouped-query attention folded in with NO relayout: q arrives as the
    pure reshape [S, Hkv, rep, D] of the projection output and the kernel
    slices the KV-head axis per head (row id = s*rep + r, qi = row // rep),
    so neither the input nor the output needs a transpose,
  - KV-block skipping: blocks past ``kv_len + S`` are clamped to the last
    active block via the scalar-prefetched index map and their compute is
    predicated away, so decode cost scales with the *live* context length,
    not the cache capacity.

Mask semantics (must equal core/layout.py:_build_spec_mask; tested against
it): query rows are [lst + window levels + guess n-grams]; a committed key
slot (< kv_len) is visible to every query; speculative keys follow the
within-composite visibility rules.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _spec_visible(qi, rj, *, level, window, guess_size):
    """Within-composite visibility, computed from index arithmetic.

    qi: [rows, BK] spec row ids (0..S-1); rj: [rows, BK] key index relative
    to kv_len. Both int32. Returns bool visibility. Mirrors
    core/layout.py:_build_spec_mask (itself mirroring reference
    modeling_llama.py:115-207)."""
    n, w, gs = level, window, guess_size
    nw = (n - 1) * w          # window region size (incl. the lst slot)

    q_in_win = qi < nw
    lvl_q = qi // w
    pos_q = qi % w
    k_in_win = rj < nw
    lvl_k = rj // w
    pos_k = rj % w

    win_win = q_in_win & k_in_win & (
        ((lvl_k == 0) & (pos_k <= pos_q))
        | ((lvl_k >= 1) & (lvl_k <= lvl_q) & (pos_k == pos_q))
    )

    g_q = (qi - nw) // gs
    i_q = (qi - nw) % gs
    g_k = (rj - nw) // gs
    i_k = (rj - nw) % gs
    guess_q = (~q_in_win) & (
        (rj == 0) | ((~k_in_win) & (g_k == g_q) & (i_k <= i_q))
    )
    return win_win | guess_q


def _rel_pos(qi, *, level, window, guess_size):
    """Position offset of composite row qi relative to the last confirmed
    token (mirrors core/layout.py rel_pos): window row -> lvl + pos within
    level; guess token i -> 1 + i."""
    nw = (level - 1) * window
    win_rel = qi // window + qi % window
    guess_rel = 1 + (qi - nw) % guess_size
    return jnp.where(qi < nw, win_rel, guess_rel)


def _block_mask(kv_len, j, *, rows, rep, block_k, s_len, level, window,
                guess_size, causal, sliding_window):
    """[rows, block_k] visibility for KV block j; computed once per block
    and shared by every KV head. Row id = s*rep + r (s-major GQA layout)."""
    col = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (rows, block_k), 1)
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0) // rep
    if causal:
        # prefill: query qi sits at absolute slot kv_len + qi and sees
        # every key at or before it (plain causal attention over the
        # live context; blocks past it are skipped by the index map)
        visible = col <= kv_len + qi
        if sliding_window:
            visible &= col > kv_len + qi - sliding_window
    else:
        rel = col - kv_len
        committed = col < kv_len
        if sliding_window:
            # Mistral-style window: a query at absolute position p sees
            # committed keys in (p - sw, p]. Within-composite visibility
            # is unaffected (the engine enforces S <= sliding_window).
            q_pos = kv_len + _rel_pos(qi, level=level, window=window,
                                      guess_size=guess_size)
            committed &= col > q_pos - sliding_window
        visible = committed | (
            (rel >= 0) & (rel < s_len)
            & _spec_visible(qi, rel, level=level, window=window,
                            guess_size=guess_size))
    return visible


def _head_q(q_ref, g):
    """[S_pad, Hkv, rep, D] ref -> [S_pad*rep, D] rows for KV head g
    (pure leading-dim collapse; no relayout)."""
    blk = q_ref[:, g]                       # [S_pad, rep, D]
    return blk.reshape(blk.shape[0] * blk.shape[1], blk.shape[2])


def _kernel_single(kv_len_ref, q_ref, k_ref, v_ref, *rest,
                   level, window, guess_size, s_len, block_k, n_heads, rep,
                   scale, quantized, causal, sliding_window, has_spec,
                   interpret=False):
    """Whole cache in ONE KV block: direct softmax, no scratch state."""
    if has_spec:
        spec_ref, *rest = rest
    if quantized:
        ks_ref, vs_ref, o_ref = rest
    else:
        (o_ref,) = rest
        ks_ref = vs_ref = None
    kv_len = kv_len_ref[0]
    rows = q_ref.shape[0] * q_ref.shape[2]

    if has_spec:
        # The within-composite mask is STATIC — it rides in as a [S_pad, M]
        # i32 operand (Mosaic's dynamic rotate is 32-bit-only) with the spec
        # block at columns [0, S) and is placed at the live offset with ONE
        # dynamic lane roll; ~3 vector ops on the un-expanded [S_pad, M]
        # tile instead of the ~20-op iota derivation on [rows, M]. The mask
        # would otherwise be recomputed per LAYER (the XLA path computes its
        # dense mask once per step). The rep (GQA) axis is applied by a free
        # leading-dim split of the score tile.
        # interpret mode (CPU CI) lacks the Mosaic roll primitive; jnp.roll
        # is semantically identical so the mask-placement arithmetic is
        # exercised by the same code path on both backends
        roll = jnp.roll if interpret else pltpu.roll
        sm2 = roll(spec_ref[...], kv_len, axis=1)           # [S_pad, BK]
        col2 = jax.lax.broadcasted_iota(jnp.int32, sm2.shape, 1)
        visible = ((col2 < kv_len) | (sm2 != 0))[:, None, :]
    else:
        visible = _block_mask(
            kv_len, 0, rows=rows, rep=rep, block_k=block_k, s_len=s_len,
            level=level, window=window, guess_size=guess_size, causal=causal,
            sliding_window=sliding_window)

    for g in range(n_heads):              # static unroll over KV heads
        q = _head_q(q_ref, g)                            # [rows, D]
        k = k_ref[g]                                     # [BK, D]
        v = v_ref[g]
        if quantized:
            k = k.astype(q.dtype)
            v = v.astype(q.dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if quantized:
            s = s * ks_ref[g][None, :]                   # per-key scale
        if has_spec:
            # [rows, BK] -> [S_pad, rep, BK] (free leading-dim split) so the
            # un-expanded mask broadcasts over the GQA rep axis
            s = jnp.where(
                visible, s.reshape(q_ref.shape[0], rep, block_k), NEG_INF
            ).reshape(rows, block_k)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - jnp.where(m == NEG_INF, 0.0, m))  # exp(-inf)=0
        else:
            s = jnp.where(visible, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - jnp.where(m == NEG_INF, 0.0, m))
            p = jnp.where(visible, p, 0.0)
        denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        if quantized:
            p = p * vs_ref[g][None, :]                   # per-value scale
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom
        o_ref[:, g] = o.astype(o_ref.dtype).reshape(
            q_ref.shape[0], rep, q_ref.shape[3])


def _kernel(kv_len_ref, q_ref, k_ref, v_ref, *rest,
            level, window, guess_size, s_len, block_k, n_blocks, n_heads,
            rep, scale, quantized, causal, sliding_window):
    if quantized:
        # int8 KV: per-slot-per-head scales ride as extra operands and are
        # applied AFTER the dots (exactly equivalent to dequantizing — the
        # scales factor out of the contractions)
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    j = pl.program_id(0)
    kv_len = kv_len_ref[0]
    rows = q_ref.shape[0] * q_ref.shape[2]

    last_active = jnp.maximum(
        (kv_len + s_len + block_k - 1) // block_k - 1, 0)
    if sliding_window:
        # no query sees keys below kv_len - sw + 1 -> skip whole blocks
        first_active = jnp.maximum(
            (kv_len - sliding_window + 1) // block_k, 0)
    else:
        first_active = 0

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when((j <= last_active) & (j >= first_active))
    def _compute():
        # mask: computed once per KV block, shared by all heads
        visible = _block_mask(
            kv_len, j, rows=rows, rep=rep, block_k=block_k, s_len=s_len,
            level=level, window=window, guess_size=guess_size, causal=causal,
            sliding_window=sliding_window)

        for g in range(n_heads):          # static unroll over KV heads
            q = _head_q(q_ref, g)                        # [rows, D] (dtype)
            k = k_ref[g]                                 # [BK, D]
            v = v_ref[g]
            if quantized:
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if quantized:
                s = s * ks_ref[g][None, :]               # per-key scale
            s = jnp.where(visible, s, NEG_INF)

            m_prev = m_ref[g, :, :1]                     # [rows, 1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            # all-masked rows/blocks: keep exp argument finite
            p = jnp.exp(s - jnp.where(m_new == NEG_INF, 0.0, m_new))
            p = jnp.where(visible, p, 0.0)
            alpha = jnp.exp(
                jnp.where(m_prev == NEG_INF, NEG_INF, m_prev - m_new))
            alpha = jnp.where(m_new == NEG_INF, 0.0, alpha)

            l_ref[g] = alpha * l_ref[g] + jnp.sum(p, axis=1, keepdims=True)
            if quantized:
                p = p * vs_ref[g][None, :]               # per-value scale
            acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[g] = jnp.broadcast_to(m_new, m_ref.shape[1:])

    @pl.when(j == n_blocks - 1)
    def _finalize():
        for g in range(n_heads):
            denom = jnp.maximum(l_ref[g, :, :1], 1e-30)
            o = acc_ref[g] / denom                       # [rows, D]
            o_ref[:, g] = o.astype(o_ref.dtype).reshape(
                q_ref.shape[0], rep, q_ref.shape[3])


def _paged_kernel(kv_lens_ref, tables_ref, q_ref, k_ref, v_ref, *rest,
                  level, window, guess_size, s_len, block_k, n_blocks,
                  n_heads, rep, scale, quantized, causal, sliding_window):
    """Lane-batched paged variant of :func:`_kernel`: grid (lane, logical
    page); the KV operand blocks are fetched from the PHYSICAL page
    ``tables[b, j]`` by the index map (the paged-attention pattern), while
    all mask arithmetic stays in LOGICAL column space. Per-lane ``kv_len``
    drives the same not-yet-live block skipping as the flat kernel."""
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    j = pl.program_id(1)
    kv_len = kv_lens_ref[b]
    rows = q_ref.shape[1] * q_ref.shape[3]

    last_active = jnp.maximum(
        (kv_len + s_len + block_k - 1) // block_k - 1, 0)
    if sliding_window:
        first_active = jnp.maximum(
            (kv_len - sliding_window + 1) // block_k, 0)
    else:
        first_active = 0

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when((j <= last_active) & (j >= first_active))
    def _compute():
        visible = _block_mask(
            kv_len, j, rows=rows, rep=rep, block_k=block_k, s_len=s_len,
            level=level, window=window, guess_size=guess_size, causal=causal,
            sliding_window=sliding_window)

        for g in range(n_heads):
            blk = q_ref[0, :, g]                         # [S_pad, rep, D]
            q = blk.reshape(blk.shape[0] * blk.shape[1], blk.shape[2])
            k = k_ref[g]
            v = v_ref[g]
            if quantized:
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if quantized:
                s = s * ks_ref[g][None, :]
            s = jnp.where(visible, s, NEG_INF)

            m_prev = m_ref[g, :, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - jnp.where(m_new == NEG_INF, 0.0, m_new))
            p = jnp.where(visible, p, 0.0)
            alpha = jnp.exp(
                jnp.where(m_prev == NEG_INF, NEG_INF, m_prev - m_new))
            alpha = jnp.where(m_new == NEG_INF, 0.0, alpha)

            l_ref[g] = alpha * l_ref[g] + jnp.sum(p, axis=1, keepdims=True)
            if quantized:
                p = p * vs_ref[g][None, :]
            acc_ref[g] = acc_ref[g] * alpha + jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[g] = jnp.broadcast_to(m_new, m_ref.shape[1:])

    @pl.when(j == n_blocks - 1)
    def _finalize():
        for g in range(n_heads):
            denom = jnp.maximum(l_ref[g, :, :1], 1e-30)
            o = acc_ref[g] / denom
            o_ref[0, :, g] = o.astype(o_ref.dtype).reshape(
                q_ref.shape[1], rep, q_ref.shape[4])


@functools.partial(
    jax.jit,
    static_argnames=("level", "window", "guess_size", "page_size",
                     "interpret", "causal", "sliding_window"))
def paged_lookahead_attention(
    q: jax.Array,          # [B, S, Hq, D]
    k,                     # [Hkv, P, D] shared pool slice, or int8 dict
    v,
    kv_lens: jax.Array,    # [B] int32
    tables: jax.Array,     # [B, NB] int32 logical -> physical page
    *,
    level: int,
    window: int,
    guess_size: int,
    page_size: int,
    interpret: bool = False,
    causal: bool = False,
    sliding_window: int = 0,
) -> jax.Array:
    """Fused composite-mask attention over the paged KV pool
    (core/paged.py): each lane's logical KV blocks are read IN PLACE from
    their physical pages via the scalar-prefetched table — no per-step
    gather of the cache (the XLA fallback, core/paged.py:paged_gather,
    materializes a contiguous copy per layer). Returns [B, S, Hq*D]."""
    quantized = isinstance(k, dict)
    if quantized:
        k_scale, v_scale = k["s"], v["s"]
        k, v = k["q"], v["q"]
    b, s_len, hq, d = q.shape
    hkv, p, _ = k.shape
    rep = hq // hkv
    nb = tables.shape[1]
    block_k = page_size
    assert p % page_size == 0
    scale = 1.0 / math.sqrt(d)

    s_pad = s_len
    while (s_pad * rep) % 8:
        s_pad += 1
    q5 = q.reshape(b, s_len, hkv, rep, d)
    if s_pad != s_len:
        q5 = jnp.pad(q5, ((0, 0), (0, s_pad - s_len), (0, 0), (0, 0), (0, 0)))

    kernel = functools.partial(
        _paged_kernel, level=level, window=window, guess_size=guess_size,
        s_len=s_len, block_k=block_k, n_blocks=nb, n_heads=hkv, rep=rep,
        scale=scale, quantized=quantized, causal=causal,
        sliding_window=sliding_window)
    scratch_shapes = [
        pltpu.VMEM((hkv, s_pad * rep, d), jnp.float32),      # acc
        pltpu.VMEM((hkv, s_pad * rep, 128), jnp.float32),    # running max
        pltpu.VMEM((hkv, s_pad * rep, 128), jnp.float32),    # running denom
    ]

    def page_of(bi, j, kv_lens_ref, tables_ref):
        last_active = jnp.maximum(
            (kv_lens_ref[bi] + s_len + block_k - 1) // block_k - 1, 0)
        jj = jnp.minimum(j, last_active)
        if sliding_window:
            jj = jnp.maximum(jj, jnp.maximum(
                (kv_lens_ref[bi] - sliding_window + 1) // block_k, 0))
        return tables_ref[bi, jj]

    def kv_index(bi, j, kv_lens_ref, tables_ref):
        return (0, page_of(bi, j, kv_lens_ref, tables_ref), 0)

    def kv_index2(bi, j, kv_lens_ref, tables_ref):
        return (0, page_of(bi, j, kv_lens_ref, tables_ref))

    in_specs = [
        pl.BlockSpec((1, s_pad, hkv, rep, d),
                     lambda bi, j, kl, tb: (bi, 0, 0, 0, 0)),
        pl.BlockSpec((hkv, block_k, d), kv_index),
        pl.BlockSpec((hkv, block_k, d), kv_index),
    ]
    operands = [q5, k, v]
    if quantized:
        in_specs += [pl.BlockSpec((hkv, block_k), kv_index2),
                     pl.BlockSpec((hkv, block_k), kv_index2)]
        operands += [k_scale[:, :, 0].astype(jnp.float32),
                     v_scale[:, :, 0].astype(jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s_pad, hkv, rep, d),
                               lambda bi, j, kl, tb: (bi, 0, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hkv, rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), tables.astype(jnp.int32), *operands)

    return out[:, :s_len].reshape(b, s_len, hq * d)


@functools.partial(
    jax.jit,
    static_argnames=("level", "window", "guess_size", "block_k", "interpret",
                     "causal", "sliding_window"))
def lookahead_attention(
    q: jax.Array,          # [S, Hq, D]
    k,                     # [Hkv, M, D] cache buffer, or int8 {"q","s"} dict
    v,                     # same
    kv_len: jax.Array,     # scalar int32
    *,
    level: int,
    window: int,
    guess_size: int,
    block_k: int = 0,
    interpret: bool = False,
    causal: bool = False,  # prefill mode: plain causal mask over the live
                           # context (the reference's flash path also covers
                           # prefill, modeling_llama.py:1177-1178)
    sliding_window: int = 0,  # Mistral-style attention window (0 = full)
    spec_mask=None,        # optional static [S, S] within-composite mask;
                           # enables the rolled-operand fast path when the
                           # cache fits one KV block
) -> jax.Array:
    """Fused composite-mask attention. Returns [S, Hq*D] in q.dtype.

    The cache is KV-head-major ([Hkv, M, D]) and q rides in as the pure
    reshape [S, Hkv, rep, D] of the projection output — neither operand nor
    the output is transposed on the hot path. ``block_k=0`` auto-sizes the
    KV block (whole cache when it fits 1024 slots -> scratch-free direct
    softmax; 1024-wide online-softmax blocks beyond). Quantized caches
    stream int8 values with scales applied at the score/probability stage."""
    quantized = isinstance(k, dict)
    if quantized:
        k_scale, v_scale = k["s"], v["s"]
        k, v = k["q"], v["q"]
    s_len, hq, d = q.shape
    hkv, m, _ = k.shape
    rep = hq // hkv
    if block_k == 0:
        # Per-program overhead dominates decode-size kernels, so prefer FEW
        # large KV blocks: one program covers M<=1024 (scratch-free direct
        # softmax); beyond that, the largest lane-aligned divisor <= 1024
        # keeps the scalar-driven skip of not-yet-live cache regions while
        # bounding program count (e.g. M=2560 -> 640-wide blocks).
        block_k = m if m <= 1024 else next(
            (c for c in range(1024, 127, -128) if m % c == 0), 0)
        if not block_k:
            raise ValueError(
                f"cache capacity {m} has no lane-aligned KV block divisor;"
                f" use a multiple of 128 or the xla attention impl")
    block_k = min(block_k, m)
    assert m % block_k == 0, "cache capacity must be a multiple of block_k"
    n_blocks = m // block_k
    scale = 1.0 / math.sqrt(d)

    # [S, Hq, D] -> [S, Hkv, rep, D]: a pure reshape (same memory layout);
    # S padded so rows-per-head (S_pad * rep) is a sublane multiple. Padded
    # rows compute garbage harmlessly and are sliced off at the end.
    s_pad = s_len
    while (s_pad * rep) % 8:
        s_pad += 1
    q4 = q.reshape(s_len, hkv, rep, d)
    if s_pad != s_len:
        q4 = jnp.pad(q4, ((0, s_pad - s_len), (0, 0), (0, 0), (0, 0)))

    common = dict(level=level, window=window, guess_size=guess_size,
                  s_len=s_len, block_k=block_k, n_heads=hkv, rep=rep,
                  scale=scale, quantized=quantized, causal=causal,
                  sliding_window=sliding_window)
    # rolled-operand mask path: single block, composite mode, no window
    # bound (interpret mode emulates the Mosaic roll with jnp.roll so CPU
    # CI exercises the same mask-placement arithmetic)
    has_spec = (n_blocks == 1 and spec_mask is not None and not causal
                and not sliding_window)
    if n_blocks == 1:
        kernel = functools.partial(_kernel_single, has_spec=has_spec,
                                   interpret=interpret, **common)
        scratch_shapes = []
    else:
        kernel = functools.partial(_kernel, n_blocks=n_blocks, **common)
        scratch_shapes = [
            pltpu.VMEM((hkv, s_pad * rep, d), jnp.float32),      # acc
            pltpu.VMEM((hkv, s_pad * rep, 128), jnp.float32),    # running max
            pltpu.VMEM((hkv, s_pad * rep, 128), jnp.float32),    # running denom
        ]

    def clamp_j(j, kv_len_ref):
        last_active = jnp.maximum(
            (kv_len_ref[0] + s_len + block_k - 1) // block_k - 1, 0)
        j = jnp.minimum(j, last_active)
        if sliding_window:
            j = jnp.maximum(
                j, jnp.maximum(
                    (kv_len_ref[0] - sliding_window + 1) // block_k, 0))
        return j

    def kv_index(j, kv_len_ref):
        return (0, clamp_j(j, kv_len_ref), 0)

    def kv_index2(j, kv_len_ref):
        return (0, clamp_j(j, kv_len_ref))

    in_specs = [
        pl.BlockSpec((s_pad, hkv, rep, d), lambda j, kv_len_ref: (0, 0, 0, 0)),
        pl.BlockSpec((hkv, block_k, d), kv_index),
        pl.BlockSpec((hkv, block_k, d), kv_index),
    ]
    operands = [q4, k, v]
    if has_spec:
        # [S, S] bool -> [S_pad, M] i32 (32-bit: Mosaic dynamic-rotate
        # requirement), spec block at cols [0, S)
        sm = jnp.pad(spec_mask.astype(jnp.int32),
                     ((0, s_pad - s_len), (0, m - s_len)))
        in_specs.append(pl.BlockSpec((s_pad, m), lambda j, kv_len_ref: (0, 0)))
        operands.append(sm)
    if quantized:
        in_specs += [pl.BlockSpec((hkv, block_k), kv_index2),
                     pl.BlockSpec((hkv, block_k), kv_index2)]
        operands += [k_scale[:, :, 0].astype(jnp.float32),     # [Hkv, M]
                     v_scale[:, :, 0].astype(jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (s_pad, hkv, rep, d), lambda j, kv_len_ref: (0, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, hkv, rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(kv_len.reshape(1).astype(jnp.int32), *operands)

    return out[:s_len].reshape(s_len, hq * d)
