"""Paged (block-table) KV cache: a shared physical page pool + per-lane
logical→physical page tables.

The north-star requirement this implements (BASELINE.json: "quantized paged
KV-cache supporting speculative rollback/append on accept/reject"): instead
of every request/serving-lane/PrefixCache pinning a full-capacity
``[L, Hkv, max_seq, D]`` buffer (~1.07 GB bf16 per lane at Llama-2-7B/2048 —
models/llama.py:make_kv_cache), all sequences share ONE physical pool of
fixed-size pages:

    pool K/V : [L, Hkv, n_pages * page_size, D]   (bf16 or int8+scales)
    table    : [NB] int32 per lane — logical page j lives in physical page
               table[j]; NB = ceil(max_seq_len / page_size)

so a lane holds exactly ``ceil((prompt + max_new + S) / page_size)`` pages,
prefix caches hold ``O(prefix pages)`` (sharing = refcount bump, not a GB
copy), and admission backpressures on real memory instead of OOMing.

Speculative append/rollback semantics are unchanged from the flat cache
(core/step.py): each decode step writes the S composite tokens at logical
slots [kv_len, kv_len+S) — pages for that span are always allocated
(`pages_needed` accounts the composite overhang) — then the accept commit
copies the winning n-gram's span to [kv_len+1, kv_len+1+max_hit] and the
kv_len pointer moves; rejected speculation needs no undo because slots
>= kv_len are scratch by contract. The only new mechanics are the address
translation (gathers/scatters through the table, the Pallas kernel's
scalar-prefetched page-table index map) and the page lifecycle below.

Page lifecycle (host-side BlockAllocator; all device writes go through
lane-owned or per-lane trash pages, so freed pages are never written):
  - pages [0, num_lanes) are permanently reserved as per-lane TRASH pages:
    an idle/finished lane's table points every logical page at its own
    trash page, so the unconditional speculative writes of the batched
    step land harmlessly in lane-private garbage (the paged analog of the
    n-gram pool's trash row, core/pool.py).
  - allocation is whole-request up-front (prompt + max_new + composite
    overhang), refcounted for prefix sharing; a partial tail page of a
    shared prefix is copied on admission (copy-on-write) because the
    admitted lane writes into it.

Reference contrast: the reference concatenates python KV tuples and
slice-copies accepted spans on the host every step
(/root/reference/lade/decoding.py:1145-1163); it has no paging, no
sharing, and no batching (batch==1 asserted, modeling_llama.py:1448).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Physical pool
# ---------------------------------------------------------------------------

def make_paged_pool(cfg, n_pages: int, page_size: int,
                    quant: Optional[str] = None):
    """Shared physical K/V pools [L, Hkv, n_pages*page_size, D]; int8 mode
    mirrors models/llama.py:make_kv_cache (per-slot-per-head scales)."""
    p = n_pages * page_size
    shape = (cfg.num_hidden_layers, cfg.num_key_value_heads, p, cfg.head_dim)
    if quant is None:
        return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)
    if quant != "int8":
        raise ValueError(f"unsupported kv quantization: {quant}")
    sshape = shape[:-1] + (1,)
    mk = lambda: {"q": jnp.zeros(shape, jnp.int8),
                  "s": jnp.full(sshape, 1e-8, jnp.float32)}
    return mk(), mk()


# ---------------------------------------------------------------------------
# Device-side address translation
# ---------------------------------------------------------------------------

def phys_slots(tables: jax.Array, start, length: int, page_size: int):
    """Physical slot ids for logical span [start, start+length).

    tables: [B, NB] (batched) or [NB]; start: [B] or scalar. Returns
    [B, length] (or [length]) int32. ``length`` is static."""
    batched = tables.ndim == 2
    if not batched:
        tables = tables[None]
        start = jnp.asarray(start)[None]
    m = start[:, None] + jnp.arange(length, dtype=jnp.int32)[None, :]
    page = jnp.take_along_axis(tables, m // page_size, axis=1)
    out = page * page_size + m % page_size
    return out if batched else out[0]


def paged_write(buf, slots_flat: jax.Array, new_flat: jax.Array):
    """Scatter new K or V rows into one layer's pool slice.

    buf: [Hkv, P, D] (or int8 {"q","s"}); slots_flat: [R] physical slots;
    new_flat: [R, Hkv, D]. Quantization matches
    models/llama.py:kv_cache_write (symmetric per-slot-per-head int8)."""
    if not isinstance(buf, dict):
        return buf.at[:, slots_flat, :].set(
            new_flat.transpose(1, 0, 2).astype(buf.dtype))
    nf = new_flat.astype(jnp.float32)
    amax = jnp.max(jnp.abs(nf), axis=-1, keepdims=True)      # [R, Hkv, 1]
    s = jnp.maximum(amax / 127.0, 1e-8)
    qv = jnp.clip(jnp.round(nf / s), -127, 127).astype(jnp.int8)
    return {
        "q": buf["q"].at[:, slots_flat, :].set(qv.transpose(1, 0, 2)),
        "s": buf["s"].at[:, slots_flat, :].set(
            s.transpose(1, 0, 2).astype(jnp.float32)),
    }


def paged_gather(buf, tables: jax.Array, page_size: int):
    """Contiguous logical view of each lane's cache — the XLA dense
    attention path (and tests). buf: [Hkv, P, D] (or int8 dict);
    tables: [B, NB]. Returns [B, Hkv, NB*page_size, D] (dict: q and s).

    This materializes a copy per layer per step; the Pallas kernel variant
    (ops/lookahead_attention.py:paged_lookahead_attention) reads pages in
    place through its index map instead and is the TPU hot path."""
    b, nb = tables.shape
    idx = (tables[:, :, None] * page_size
           + jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
           ).reshape(b, nb * page_size)

    def one(a):
        return a[:, idx, :].transpose(1, 0, 2, 3)
    return jax.tree.map(one, buf)


def paged_commit(buf, src_flat: jax.Array, dst_flat: jax.Array):
    """Accept-commit on the shared pool: copy rows at physical slots
    ``src_flat`` to ``dst_flat`` across all layers. buf: [L, Hkv, P, D]
    or the int8 tree; slots: [R] flat (already batched over lanes)."""
    def one(a):
        blk = a[:, :, src_flat, :]
        return a.at[:, :, dst_flat, :].set(blk)
    return jax.tree.map(one, buf)


def copy_page(pools, src_page, dst_page, page_size: int):
    """Copy-on-write of one physical page (both K and V pools, all layers):
    admission of a shared prefix with a partial tail page copies that page
    into the lane's private page before the lane writes into it."""
    k_pool, v_pool = pools

    def one(a):
        blk = jax.lax.dynamic_slice(
            a, (0, 0, src_page * page_size, 0),
            a.shape[:2] + (page_size,) + a.shape[3:])
        return jax.lax.dynamic_update_slice(
            a, blk, (0, 0, dst_page * page_size, 0))
    return jax.tree.map(one, k_pool), jax.tree.map(one, v_pool)


# ---------------------------------------------------------------------------
# Host-side page allocator
# ---------------------------------------------------------------------------

class OutOfPages(Exception):
    """Raised by alloc when the pool cannot satisfy a request; the serving
    scheduler catches it and keeps the request queued (admission
    backpressure instead of device OOM)."""


class BlockAllocator:
    """Refcounted free-list allocator over the physical pages.

    Host-side by design: allocation happens at request admission (already a
    host decision point), so the device graph only ever sees ready-made
    tables. Pages [0, reserved) are per-lane trash pages and never
    allocated."""

    def __init__(self, n_pages: int, reserved: int = 0):
        if n_pages <= reserved:
            raise ValueError("pool needs more pages than reserved trash")
        self.n_pages = n_pages
        self.reserved = reserved
        self._free: List[int] = list(range(n_pages - 1, reserved - 1, -1))
        self._refs = np.zeros((n_pages,), np.int32)
        self._refs[:reserved] = 1          # trash pages: permanently held

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def used_pages(self) -> int:
        return self.n_pages - self.reserved - len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise OutOfPages(
                f"need {n} pages, {len(self._free)} free "
                f"(pool: {self.n_pages}, reserved: {self.reserved})")
        pages = [self._free.pop() for _ in range(n)]
        self._refs[pages] = 1
        return pages

    def share(self, pages: List[int]) -> None:
        """Refcount bump — prefix sharing (the 'not a 1 GB copy' path)."""
        for p in pages:
            assert self._refs[p] > 0, f"share of unallocated page {p}"
            self._refs[p] += 1

    def release(self, pages: List[int]) -> None:
        for p in pages:
            assert self._refs[p] > 0, f"double free of page {p}"
            self._refs[p] -= 1
            if self._refs[p] == 0:
                self._free.append(p)


def pages_needed(prompt_len: int, max_new: int, s_len: int,
                 page_size: int, max_seq_len: int,
                 prefix_len: int = 0):
    """Logical pages a request must own beyond any shared prefix pages.

    The logical extent a lane touches is ``kv_len_final + S`` — the
    speculative composite writes and the accept-commit both stay within it,
    prefill writes stay below the prompt (padded tail rows go to the trash
    page), and ``kv_len_final <= prompt-1+max_new``. The extent is clamped
    to ``max_seq_len`` so the lane's capacity stop reproduces the flat
    engine's (core/step.py: new_kv_len + S > M) exactly when generation
    runs to the logical bound.

    Returns ``(n_private_pages, first_page)``: pages the lane must own
    privately starting at logical page ``first_page`` (the page holding
    slot ``prefix_len`` — COW'd when the prefix ends mid-page)."""
    extent = min(prompt_len - 1 + max_new + s_len, max_seq_len)
    first_page = prefix_len // page_size    # partial prefix page is COW'd
    return -(-(extent - first_page * page_size) // page_size), first_page
