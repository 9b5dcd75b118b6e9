"""Device-resident n-gram pool with LRU semantics.

The reference keeps the pool as a host Python dict
``token_map: {token_id -> list[(LEVEL-1)-tuple]}`` with move-to-back-on-hit /
evict-front LRU capped at GUESS_SET_SIZE per key (reference:
lade/decoding.py:37-78 ``update_token_map``, :80-101
``append_new_generated_pool``, :104-127 ``fill_pool_with_prompt``), forcing a
host round-trip every step. Here the pool lives in HBM as flat tables and
every operation is traced into the jitted step:

  values [V+1, G, GS] int32 : candidate n-grams per key token
  age    [V+1, G]     int32 : LRU stamps; 0 = empty slot
  clock  scalar       int32 : monotonic logical time

Row V is a write-only trash row: updates that must be skipped (invalid
lanes) redirect their key there, which keeps the update loop branch-free.

LRU equivalences with the reference list semantics:
  - "in list -> remove + append"      == refresh the matching slot's age
  - "len < cap -> append"             == fill the min-age slot (empties are 0)
  - "full -> drop front + append"     == overwrite the min-age (oldest) slot
Slot order is not materialized; the reference iterates candidates in list
order, but candidate order provably cannot change the accepted tokens (ties
in match length accept identical token sequences), so we keep slots unsorted.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    values: jax.Array   # [V+1, G, GS] int32
    age: jax.Array      # [V+1, G] int32
    clock: jax.Array    # scalar int32


def pool_init(vocab_size: int, guess_set_size: int, guess_size: int) -> PoolState:
    return PoolState(
        values=jnp.zeros((vocab_size + 1, guess_set_size, guess_size), jnp.int32),
        age=jnp.zeros((vocab_size + 1, guess_set_size), jnp.int32),
        clock=jnp.int32(1),
    )


_BIGRAM_PRIME = 1000003


def pool_table_rows(vocab_size: int, key_len: int, hash_size: int = 0) -> int:
    """Key-table rows (excl. the trash row): token-indexed for key_len=1,
    hashed bigram space for key_len=2."""
    if key_len == 1:
        return vocab_size
    return hash_size or min(4 * vocab_size, 262144)


def bigram_key(a, b, table_rows: int):
    """Hash of the (second-to-last, last) token pair into the key table.
    Collisions only ever inject extra (wrong) candidates — verification
    rejects them — so a simple multiplicative hash suffices."""
    return ((a.astype(jnp.uint32) * _BIGRAM_PRIME + b.astype(jnp.uint32))
            % jnp.uint32(table_rows)).astype(jnp.int32)


def pool_update(
    pool: PoolState,
    keys: jax.Array,     # [K] int32 key tokens
    tups: jax.Array,     # [K, GS] int32 n-grams
    valid: jax.Array,    # [K] bool; invalid lanes are no-ops
) -> PoolState:
    """Insert K (key, n-gram) pairs with sequential LRU semantics (lane
    order defines logical time, matching the reference's per-n-gram loop
    order in update_token_map).

    TPU shape: per-lane scatters into the [V, G, GS] table are ruinously
    slow (~1ms each), so the sequential chain runs on a small gathered
    working set ([K, G, GS]) and the result is written back with ONE
    batched scatter. Duplicate keys within a batch chain through
    ``prev_same`` so later lanes see earlier lanes' edits; only each key's
    last lane writes back."""
    k_lanes = keys.shape[0]
    if pool.age.shape[1] == 0 or k_lanes == 0:
        return pool
    trash_row = pool.values.shape[0] - 1
    keys = jnp.where(valid, keys, trash_row)

    lane = jnp.arange(k_lanes)
    same = (keys[None, :] == keys[:, None])              # [K, K]
    before = lane[None, :] < lane[:, None]
    sb = same & before
    # index of the previous lane with the same key, -1 if none
    prev_same = jnp.where(
        jnp.any(sb, axis=1),
        k_lanes - 1 - jnp.argmax(sb[:, ::-1], axis=1), -1)
    is_last = ~jnp.any(same & ~before & (lane[None, :] != lane[:, None]),
                       axis=1)

    rows0 = pool.values[keys]                            # [K, G, GS] gather
    ages0 = pool.age[keys]                               # [K, G]

    def _insert_one(row, arow, tup, i):
        match = jnp.all(row == tup[None, :], axis=-1) & (arow > 0)
        slot = jnp.where(
            jnp.any(match), jnp.argmax(match), jnp.argmin(arow))
        # On match row[slot] == tup already, so an unconditional write is
        # correct for both the refresh and insert/evict cases.
        row = jax.lax.dynamic_update_slice(row, tup[None, :], (slot, 0))
        arow = jax.lax.dynamic_update_slice(
            arow, (pool.clock + i)[None], (slot,))
        return row, arow

    def _chain(_):
        """Sequential per-lane chain — only needed when two valid lanes
        share a key, so later lanes must see earlier lanes' edits."""
        def body(i, carry):
            work_vals, work_age = carry
            p = prev_same[i]
            row = jnp.where(p >= 0, work_vals[p], rows0[i])
            arow = jnp.where(p >= 0, work_age[p], ages0[i])
            row, arow = _insert_one(row, arow, tups[i], i)
            work_vals = jax.lax.dynamic_update_slice(
                work_vals, row[None], (i, 0, 0))
            work_age = jax.lax.dynamic_update_slice(
                work_age, arow[None], (i, 0))
            return work_vals, work_age

        return jax.lax.fori_loop(0, k_lanes, body, (rows0, ages0))

    def _parallel(_):
        """All valid keys distinct (the common case): every lane edits its
        own row, so the whole batch is one vmapped insert — ~K× shorter
        device-latency chain than the sequential fallback."""
        return jax.vmap(_insert_one)(rows0, ages0, tups, lane)

    # duplicates among trash-redirected lanes don't need chaining (their
    # rows are write-only garbage), so only valid-lane collisions count.
    # NB: under vmap (batched serving) this cond lowers to a select that
    # runs BOTH branches; the win there is nil (the chain still bounds the
    # latency) but the vmapped insert + [K,K] dup check it adds are a few
    # percent of the chain's cost. Single-stream decode — the latency-
    # critical path — takes the parallel branch alone.
    valid_dup = same & (lane[None, :] != lane[:, None]) \
        & valid[None, :] & valid[:, None]
    work_vals, work_age = jax.lax.cond(
        jnp.any(valid_dup), _chain, _parallel, operand=None)

    # single batched write-back; non-final duplicate lanes go to the trash
    # row so all real indices are unique
    keys_final = jnp.where(is_last, keys, trash_row)
    values = pool.values.at[keys_final].set(work_vals, unique_indices=False)
    age = pool.age.at[keys_final].set(work_age, unique_indices=False)
    return PoolState(values, age, pool.clock + k_lanes)


def pool_lookup(pool: PoolState, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Candidate n-grams for ``key``: ([G, GS] tokens, [G] validity)."""
    return pool.values[key], pool.age[key] > 0


def host_prompt_fill(prompt_tokens, level: int, guess_set_size: int,
                     pad_to: int, key_len: int = 1, table_rows: int = 0):
    """Host-side computation of the prompt-seeded pool rows (reference
    fill_pool_with_prompt semantics, decoding.py:104-127: in-order LRU with
    dedupe-refresh and a G cap per key). The prompt is host data at prepare
    time, so the sequential dict walk runs in Python and the result is
    uploaded with ONE padded scatter (`apply_host_fill`) instead of a
    thousand-lane sequential device loop.

    Returns (keys [pad_to], rows [pad_to, G, GS], ages [pad_to, G], clock).
    Unused lanes carry key == -1 (callers redirect them to the trash row).
    """
    import numpy as np
    gs = level - 1
    g = guess_set_size
    toks = [int(t) for t in prompt_tokens]
    table = {}
    clock = 1
    start = 0 if key_len == 1 else 1
    for i in range(start, len(toks) - gs):
        if key_len == 2:
            key = int(((toks[i - 1] * _BIGRAM_PRIME + toks[i]) % (1 << 32))
                      % table_rows)
        else:
            key = toks[i]
        tup = tuple(toks[i + 1:i + 1 + gs])
        ent = table.setdefault(key, [])
        for j, (t2, _) in enumerate(ent):
            if t2 == tup:
                del ent[j]
                break
        else:
            if len(ent) == g:
                ent.pop(0)
        ent.append((tup, clock))
        clock += 1

    keys = np.full((pad_to,), -1, np.int32)
    rows = np.zeros((pad_to, g, gs), np.int32)
    ages = np.zeros((pad_to, g), np.int32)
    for u, (key, ent) in enumerate(table.items()):
        if u >= pad_to:
            break
        keys[u] = key
        for slot, (tup, age) in enumerate(ent):
            rows[u, slot] = tup
            ages[u, slot] = age
    return keys, rows, ages, clock


def apply_host_fill(pool: PoolState, keys, rows, ages, clock,
                    merge: bool = False) -> PoolState:
    """One batched scatter of host-computed fill rows (jit-friendly; lanes
    with key == -1 go to the trash row).

    Ages and the clock are OFFSET by the pool's current clock so a fill
    applied to a carried (warm) pool never rewinds logical time: a rewound
    clock would make every subsequent insert the argmin-age eviction victim
    of entries older than it (LRU inversion). Empty slots (age 0) stay 0.
    On a fresh pool (clock 0) this is the identity semantics.

    ``merge=True`` LRU-inserts each fill entry into the key's EXISTING row
    (match -> refresh, else evict the min-age slot) instead of replacing the
    whole row — so a carried warm pool keeps every entry the fill doesn't
    displace. On empty rows merge and set produce identical content; the
    prefix-cache path always merges."""
    trash_row = pool.values.shape[0] - 1
    keys = jnp.where(keys < 0, trash_row, keys)
    ages = jnp.asarray(ages)
    if not merge:
        return PoolState(
            values=pool.values.at[keys].set(rows),
            age=pool.age.at[keys].set(
                jnp.where(ages > 0, ages + pool.clock, 0)),
            clock=pool.clock + jnp.int32(clock),
        )
    rows0 = pool.values[keys]                            # [K, G, GS]
    ages0 = pool.age[keys]                               # [K, G]
    rows_f = jnp.asarray(rows)

    def insert_slot(row, arow, tup, age):
        # same slot rule as pool_update._insert_one; age == 0 marks an
        # unused fill slot -> no-op for that key
        match = jnp.all(row == tup[None, :], axis=-1) & (arow > 0)
        slot = jnp.where(
            jnp.any(match), jnp.argmax(match), jnp.argmin(arow))
        nrow = jax.lax.dynamic_update_slice(row, tup[None, :], (slot, 0))
        narow = jax.lax.dynamic_update_slice(
            arow, (pool.clock + age)[None], (slot,))
        live = age > 0
        return jnp.where(live, nrow, row), jnp.where(live, narow, arow)

    vins = jax.vmap(insert_slot)
    for j in range(rows0.shape[1]):      # fill entries in insertion order
        rows0, ages0 = vins(rows0, ages0, rows_f[:, j], ages[:, j])
    return PoolState(
        values=pool.values.at[keys].set(rows0),
        age=pool.age.at[keys].set(ages0),
        clock=pool.clock + jnp.int32(clock),
    )


def fill_pool_with_prompt(
    pool: PoolState, prompt: jax.Array, prompt_len: jax.Array, level: int
) -> PoolState:
    """Seed the pool with every n-gram of the prompt (reference
    fill_pool_with_prompt, decoding.py:104-127). ``prompt`` is a padded [P]
    int32 device buffer whose first ``prompt_len`` entries are real tokens."""
    gs = level - 1
    p = prompt.shape[0]
    k = p - gs  # static upper bound on (key, n-gram) pairs
    if k <= 0:
        return pool
    idx = jnp.arange(k)
    keys = prompt[:k]
    tups = prompt[idx[:, None] + 1 + jnp.arange(gs)[None, :]]
    valid = idx + gs < prompt_len
    return pool_update(pool, keys, tups, valid)
