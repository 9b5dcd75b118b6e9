"""Jitted lookahead decode over the paged KV pool (core/paged.py).

The decode SEMANTICS (verification, EOS, pool harvest, window slide) are
shared with the flat-cache step via core/step.py:make_post_forward — this
module only changes how KV is addressed: B lanes write/commit through their
page tables into ONE shared physical pool, batched in a single traced step
(models/llama.py:forward_paged). The flat step's per-lane ``lax.cond``
no-op for finished lanes becomes a bookkeeping select plus a trash-page
redirect for the shared-pool writes (a finished lane's speculative writes
land in its own reserved trash page, never in pages another lane owns).

Reference contrast: the reference's loop is strictly batch==1
(modeling_llama.py:1448) with host-driven KV slice-copies per step
(decoding.py:1145-1163)."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, LookaheadConfig
from ..models import llama
from .layout import Layout
from .paged import paged_commit, phys_slots
from .pool import PoolState, bigram_key, pool_lookup, pool_table_rows
from .step import NEG_INF, make_post_forward


class PagedLaneState(NamedTuple):
    """Per-lane decode bookkeeping; the KV itself lives in the shared pool.
    Same fields as core/state.py:DecodeState minus the cache buffers, plus
    the page table and the lane's allocated logical capacity."""

    table: jax.Array        # [NB] int32 logical -> physical page
    cap: jax.Array          # scalar int32: allocated logical slot capacity
    trash: jax.Array        # scalar int32: base slot of the lane's trash page
    kv_len: jax.Array
    window: jax.Array
    pool: PoolState
    out_buf: jax.Array
    n_confirmed: jax.Array
    init_len: jax.Array
    step_idx: jax.Array
    finished: jax.Array
    rng: jax.Array


class PagedStepFns(NamedTuple):
    init_lane: Callable
    prefill_from: Callable    # single-lane suffix prefill into the pool
    decode_batch: Callable    # one batched greedy step over all lanes
    sample_batch: Callable    # one batched sampling step


def build_paged_step_fns(
    mcfg: llama.LlamaConfig,
    lcfg: LookaheadConfig,
    ecfg: EngineConfig,
    layout: Layout,
    page_size: int,
    top_k: int = 0,
    use_top_p: bool = True,
) -> PagedStepFns:
    M = ecfg.max_seq_len
    S = layout.seq_len
    W = layout.window
    N = layout.level
    G = layout.guess_set_size
    GS = layout.guess_size
    n_window = layout.n_window
    C = ecfg.prefill_chunk
    NB = -(-M // page_size)
    MLOG = NB * page_size
    if page_size < GS:
        raise ValueError(
            f"page_size ({page_size}) must be >= guess_size ({GS}) so the "
            "accept-commit's trash redirect fits one page")

    SW = mcfg.sliding_window or 0
    if SW >= MLOG:
        SW = 0

    use_pallas = lcfg.attention_impl == "pallas"
    rope_cos, rope_sin = llama.rope_tables(mcfg, MLOG + C)
    rel_pos = jnp.asarray(layout.rel_pos)
    spec_add = jnp.asarray(
        np.where(layout.spec_mask, 0.0, NEG_INF).astype(np.float32))
    col_ids = jnp.arange(MLOG, dtype=jnp.int32)
    logits_rows = jnp.asarray(np.concatenate([
        np.array([0], np.int64),
        np.arange(layout.inp_start, layout.inp_stop),
        np.arange(layout.guess_start, layout.seq_len),
    ]))

    # ------------------------------------------------------------------
    def init_lane(table, cap, trash, pool: PoolState, out_buf, prompt_len,
                  rng):
        """Mirror of core/step.py:init_state for a paged lane."""
        rng, sub = jax.random.split(rng)
        if lcfg.window_init == "random_set":
            window = jax.random.randint(
                sub, (n_window,), 0, mcfg.vocab_size)
        elif lcfg.window_init == "order_copy_from":
            window = out_buf[jnp.arange(n_window) % prompt_len]
        elif lcfg.window_init == "copy_from_last":
            window = jnp.full((n_window,), out_buf[prompt_len - 1])
        else:  # copy_from (reference default, decoding.py:900)
            idx = jax.random.randint(sub, (n_window,), 0, prompt_len)
            window = out_buf[idx]
        return PagedLaneState(
            table=table.astype(jnp.int32),
            cap=jnp.asarray(cap, jnp.int32),
            trash=jnp.asarray(trash, jnp.int32),
            kv_len=jnp.int32(0),
            window=window.astype(jnp.int32),
            pool=pool,
            out_buf=out_buf,
            n_confirmed=prompt_len.astype(jnp.int32),
            init_len=prompt_len.astype(jnp.int32),
            step_idx=jnp.int32(0),
            finished=jnp.zeros((), bool),
            rng=rng,
        )

    # ------------------------------------------------------------------
    def prefill_chunk_lane(params, pools, lane: PagedLaneState, tokens,
                           start):
        """One C-token prefill chunk for a single lane (B=1 batched
        forward). Unlike the flat prefill_from, chunks never start below
        the suffix start (shared prefix pages are read-only) and never
        write past the prompt: the final chunk PADS past it and the padded
        rows' K/V writes are redirected to the lane's trash page
        (forward_paged write_limit) — their outputs are garbage and
        discarded, real rows never see their columns."""
        k_pool, v_pool = pools
        positions = start + jnp.arange(C, dtype=jnp.int32)
        if use_pallas:
            mask = None
            attn_meta = {
                "kv_lens": start[None], "level": N, "window": W,
                "guess_size": GS, "causal": True, "sliding_window": SW,
                "interpret": jax.default_backend() == "cpu",
            }
        else:
            vis = col_ids[None, :] <= positions[:, None]
            if SW:
                vis &= col_ids[None, :] > positions[:, None] - SW
            mask = jnp.where(vis, 0.0, NEG_INF)[None]
            attn_meta = None
        _, k_pool, v_pool = llama.forward_paged(
            params, mcfg, tokens[None], positions[None], k_pool, v_pool,
            lane.table[None], start[None], page_size, mask,
            rope_cos, rope_sin, logits_rows=jnp.arange(0),
            attn_impl="pallas" if use_pallas else "xla",
            attn_meta=attn_meta,
            write_limit=(lane.init_len - 1)[None],
            trash_slot=lane.trash[None])
        return (k_pool, v_pool), lane._replace(
            kv_len=jnp.minimum(start + C, lane.init_len - 1))

    def prefill_from(params, pools, lane: PagedLaneState, start0):
        """Prefill prompt[start0:-1] as one traced dynamic-trip loop."""
        n = lane.init_len - 1
        n_chunks = jnp.maximum(-(-jnp.maximum(n - start0, 0) // C), 0)

        def body(c, carry):
            pools, lane = carry
            start = start0 + c * C
            tokens = jax.lax.dynamic_slice(lane.out_buf, (start,), (C,))
            return prefill_chunk_lane(params, pools, lane, tokens, start)

        pools, lane = jax.lax.fori_loop(0, n_chunks, body, (pools, lane))
        return pools, lane._replace(kv_len=jnp.maximum(n, 0))

    # ------------------------------------------------------------------
    def _lane_mask(kv_len):
        """[S, MLOG] additive mask over logical columns for one lane —
        identical semantics to the flat decode mask (core/step.py)."""
        vis = (col_ids[None, :] < kv_len) & jnp.ones((S, 1), bool)
        if SW:
            vis &= (col_ids[None, :]
                    > (kv_len + rel_pos)[:, None] - SW)
        base = jnp.where(vis, 0.0, NEG_INF)
        return jax.lax.dynamic_update_slice(base, spec_add, (0, kv_len))

    def _make_decode_batch(mode: str):
        post = make_post_forward(mode, mcfg, lcfg, layout,
                                 top_k=top_k, use_top_p=use_top_p)

        def decode_batch(params, k_pool, v_pool, states: PagedLaneState,
                         max_new, eos_id, temperature, top_p):
            """One lookahead step for ALL lanes against the shared pool.
            max_new/temperature/top_p: [B]; eos_id: [B, N_EOS]."""
            b = states.kv_len.shape[0]
            kv_lens = states.kv_len
            nc = states.n_confirmed
            lst = jnp.take_along_axis(
                states.out_buf, (nc - 1)[:, None], axis=1)[:, 0]
            if lcfg.pool_key_len == 2:
                rows = pool_table_rows(
                    mcfg.vocab_size, 2, lcfg.pool_hash_size)
                prev = jnp.take_along_axis(
                    states.out_buf,
                    jnp.maximum(nc - 2, 0)[:, None], axis=1)[:, 0]
                lookup_key = bigram_key(prev, lst, rows)
            else:
                prev = lst
                lookup_key = lst
            guesses, guess_valid = jax.vmap(pool_lookup)(
                states.pool, lookup_key)               # [B,G,GS],[B,G]
            tokens = jnp.concatenate(
                [lst[:, None], states.window,
                 guesses.reshape(b, -1)], axis=1).astype(jnp.int32)
            positions = kv_lens[:, None] + rel_pos[None, :]

            if use_pallas:
                mask = None
                attn_meta = {
                    "kv_lens": kv_lens, "level": N, "window": W,
                    "guess_size": GS, "sliding_window": SW,
                    "interpret": jax.default_backend() == "cpu",
                }
            else:
                mask = jax.vmap(_lane_mask)(kv_lens)   # [B, S, MLOG]
                attn_meta = None

            logits, k_pool, v_pool = llama.forward_paged(
                params, mcfg, tokens, positions, k_pool, v_pool,
                states.table, kv_lens, page_size, mask, rope_cos, rope_sin,
                logits_rows=logits_rows,
                attn_impl="pallas" if use_pallas else "xla",
                attn_meta=attn_meta)

            updates, winner, max_hit = jax.vmap(
                post, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))(
                states, logits, guesses, guess_valid, lst, prev,
                max_new, eos_id, temperature, top_p, states.cap)

            # finished lanes no-op their bookkeeping (the flat step's
            # lax.cond, as a select over the batched fields)
            old = dict(
                kv_len=states.kv_len, window=states.window,
                pool=states.pool, out_buf=states.out_buf,
                n_confirmed=states.n_confirmed, step_idx=states.step_idx,
                finished=states.finished, rng=states.rng)

            def sel(o, nw):
                f = states.finished.reshape(
                    (-1,) + (1,) * (o.ndim - 1))
                return jnp.where(f, o, nw)

            upd = jax.tree.map(sel, old, updates)

            # ---- accept-commit on the SHARED pool (the flat step's
            # dynamic_slice copy, reference decoding.py:1145-1163):
            # gather the winning n-gram's physical rows, scatter them to
            # the canonical slots after lst. Entry-finished lanes redirect
            # both ends to their reserved trash page.
            if G > 0:
                src_log = kv_lens + layout.guess_start + winner * GS
                dst_log = kv_lens + 1
                src = phys_slots(states.table, src_log, GS, page_size)
                dst = phys_slots(states.table, dst_log, GS, page_size)
                trash = (states.trash[:, None]
                         + jnp.arange(GS, dtype=jnp.int32)[None, :])
                fin = states.finished[:, None]
                src = jnp.where(fin, trash, src).reshape(-1)
                dst = jnp.where(fin, trash, dst).reshape(-1)
                k_pool = paged_commit(k_pool, src, dst)
                v_pool = paged_commit(v_pool, src, dst)

            new_states = PagedLaneState(
                table=states.table, cap=states.cap, trash=states.trash,
                init_len=states.init_len, **upd)
            return k_pool, v_pool, new_states

        return decode_batch

    return PagedStepFns(
        init_lane=init_lane,
        prefill_from=prefill_from,
        decode_batch=_make_decode_batch("greedy"),
        sample_batch=_make_decode_batch("sample"),
    )
