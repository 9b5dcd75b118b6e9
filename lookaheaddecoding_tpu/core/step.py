"""The jitted lookahead decode step and prefill.

This is the TPU-native re-design of the reference's hot loop
(reference: lade/decoding.py:923-1219 greedy, :380-650 sampling; composite
assembly lade/models/modeling_llama.py:1471-1511). The reference runs the
loop on the host with ``.item()``/``.tolist()`` round-trips at every stage;
here ONE static-shape jitted function performs: guess gather -> composite
assembly -> model forward -> verification -> KV commit -> window slide ->
pool harvest -> output append, and the generation loop itself is a
``lax.while_loop`` over that step.

Exactness: the speculative window/pool content only ever *proposes* tokens;
acceptance requires exact agreement with the model's own argmax (greedy) or
passes SpecInfer rejection sampling, so outputs are token-exact vs. the
autoregressive baseline regardless of window seeding. This lets us run the
steady-state shape from step 0 (no shape-changing warm-up forwards — see
core/layout.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, LookaheadConfig
from ..models import llama
from ..ops.sampling import rejection_sample_verify, warp_logits
from .layout import Layout
from .pool import (PoolState, bigram_key, pool_lookup, pool_table_rows,
                   pool_update)
from .state import DecodeState

NEG_INF = float("-inf")


def make_post_forward(mode: str, mcfg, lcfg, layout: Layout,
                      top_k: int = 0, use_top_p: bool = True):
    """Everything a lookahead decode step does AFTER the model forward and
    BEFORE the KV commit, as a per-sequence pure function: verification
    (greedy longest-prefix / SpecInfer rejection sampling), EOS truncation,
    output append, pool harvest and window slide (reference
    decoding.py:1021-1177 greedy, :484-580 sampling).

    Shared by the flat-cache step (build_step_fns) and the paged-KV step
    (core/paged_step.py) — the two differ only in how KV is addressed, so
    the decode semantics live here exactly once. Returns
    ``post(state, logits, guesses, guess_valid, lst, prev, max_new, eos_id,
    temperature, top_p, cap) -> (updates, winner, max_hit)`` where
    ``state`` is any object with the DecodeState bookkeeping fields,
    ``cap`` is the sequence's logical KV capacity (the flat path passes
    max_seq_len; paged lanes pass their allocated page span) and
    ``updates`` holds the replacement bookkeeping fields."""
    assert mode in ("greedy", "sample")
    W = layout.window
    N = layout.level
    G = layout.guess_set_size
    GS = layout.guess_size
    S = layout.seq_len
    n_window = layout.n_window
    OUT_ROW = 0
    INP_ROWS = slice(1, 1 + W)
    GUESS_ROWS = slice(1 + W, 1 + W + G * GS)
    if lcfg.pool_key_len == 2:
        rows = pool_table_rows(mcfg.vocab_size, 2, lcfg.pool_hash_size)

    def post(state, logits, guesses, guess_valid, lst, prev, max_new,
             eos_id, temperature, top_p, cap):
        kv_len = state.kv_len
        new_results = jnp.argmax(logits[INP_ROWS], axis=-1).astype(jnp.int32)
        rng = state.rng

        if mode == "greedy":
            # ---- verification: greedy longest-prefix acceptance
            # (reference decoding.py:1071-1084)
            next_token = jnp.argmax(logits[OUT_ROW]).astype(jnp.int32)
            if G > 0:
                guess_results = (
                    jnp.argmax(logits[GUESS_ROWS], axis=-1)
                    .astype(jnp.int32).reshape(G, GS))
                correct = jnp.concatenate(
                    [jnp.full((G, 1), next_token, jnp.int32),
                     guess_results[:, : GS - 1]], axis=1)     # [G, GS]
                eq = (guesses == correct)
                m0 = jnp.sum(
                    jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
                # The reference's scan index stops at GS-1 even on a
                # full match (decoding.py:1077-1080), capping
                # acceptance at GS tokens/step.
                m = jnp.where(guess_valid, jnp.minimum(m0, GS - 1), -1)
                max_hit = jnp.maximum(jnp.max(m), 0)
                winner = jnp.argmax(m).astype(jnp.int32)
                hits = jnp.concatenate(
                    [next_token[None], guess_results[winner, : GS - 1]])
            else:
                max_hit = jnp.int32(0)
                winner = jnp.int32(0)
                hits = jnp.full((GS,), next_token, jnp.int32)
        else:
            # ---- verification: SpecInfer rejection sampling
            # (reference decoding.py:484-545)
            rng, k_verify = jax.random.split(rng)
            probs_next = jax.nn.softmax(warp_logits(
                logits[OUT_ROW], temperature, top_k, top_p,
                use_top_p=use_top_p))
            if G > 0:
                guess_probs = jax.nn.softmax(warp_logits(
                    logits[GUESS_ROWS], temperature, top_k, top_p,
                    use_top_p=use_top_p
                ), axis=-1).reshape(G, GS, -1)
                res = rejection_sample_verify(
                    probs_next, guess_probs, guesses, guess_valid,
                    k_verify)
                hits, max_hit, winner = res.hits, res.max_hit, res.winner
            else:
                tok = jax.random.categorical(
                    k_verify, jnp.log(jnp.maximum(probs_next, 1e-38))
                ).astype(jnp.int32)
                hits = jnp.full((GS,), tok, jnp.int32)
                max_hit = jnp.int32(0)
                winner = jnp.int32(0)

        # ---- EOS truncation (reference decoding.py:1167-1173).
        # ``eos_id`` is a [N_EOS] vector (pad slots = -1): any listed id
        # truncates. (The reference checks only eos_token_id[0] in the
        # hits walk while tracking all ids for loop exit — we apply all
        # ids consistently.)
        hit_pos = jnp.arange(GS, dtype=jnp.int32)
        is_eos = jnp.any(
            hits[:, None] == eos_id[None, :], axis=1) & (hit_pos <= max_hit)
        has_eos = jnp.any(is_eos)
        max_hit = jnp.where(
            has_eos, jnp.argmax(is_eos).astype(jnp.int32), max_hit)

        # ---- output append (fixed-size write; tail overwritten later)
        out_buf = jax.lax.dynamic_update_slice(
            state.out_buf, hits, (state.n_confirmed,))
        n_confirmed = state.n_confirmed + 1 + max_hit
        new_kv_len = kv_len + 1 + max_hit

        # ---- pool harvest (reference update_token_map,
        # decoding.py:37-78): key ``lst`` takes window column 0; key
        # L0[i-1] takes column i of the trajectory. With bigram keys
        # each column is keyed on the PAIR of tokens preceding it.
        key1 = jnp.concatenate([lst[None], state.window[: W - 1]])
        traj = state.window[W - 1:].reshape(N - 2, W)     # levels 1..N-2
        harvest_tups = jnp.concatenate(
            [traj.T, new_results[:, None]], axis=1)
        warmed_up = state.step_idx >= N - 2
        harvest_valid = jnp.full((W,), True) & warmed_up
        if lcfg.pool_key_len == 2:
            key0 = jnp.concatenate(
                [prev[None], lst[None], state.window[: W - 2]])
            harvest_keys = bigram_key(key0, key1, rows)
        else:
            harvest_keys = key1

        if lcfg.pool_from_prompt:
            # n-grams ending at each newly accepted token (reference
            # append_new_generated_pool, decoding.py:80-101, :1177).
            ends = state.n_confirmed + jnp.arange(GS, dtype=jnp.int32)
            starts = ends - GS
            gen_tups = out_buf[starts[:, None] + 1 + jnp.arange(GS)[None, :]]
            if lcfg.pool_key_len == 2:
                gen_keys = bigram_key(
                    out_buf[jnp.maximum(starts - 1, 0)],
                    out_buf[starts], rows)
                gen_valid = ((jnp.arange(GS) <= max_hit)
                             & (starts >= 1))
            else:
                gen_keys = out_buf[starts]
                gen_valid = ((jnp.arange(GS) <= max_hit)
                             & (starts >= 0))
            harvest_keys = jnp.concatenate([harvest_keys, gen_keys])
            harvest_tups = jnp.concatenate([harvest_tups, gen_tups])
            harvest_valid = jnp.concatenate([harvest_valid, gen_valid])

        pool = pool_update(
            state.pool, harvest_keys, harvest_tups, harvest_valid)

        # ---- window slide, ALWAYS_FWD_ONE semantics
        # (decoding.py:1119-1124): L0 <- L1[1:], Lk <- Lk+1, newest <-
        # new_results. On the flat layout: one static slice + concat.
        window = jnp.concatenate([state.window[W:], new_results])
        if not lcfg.always_fwd_one:
            # AFO=0 (reference decoding.py:562-573): every level
            # additionally advances by the accepted span — shift each
            # level segment left by max_hit and refill the vacated tail
            # with random confirmed-token copies (set_token()). On the
            # flat buffer: a gather with a traced offset per segment.
            seg = np.concatenate(
                [np.zeros(W - 1, np.int32)]
                + [np.full(W, 1 + lv, np.int32) for lv in range(N - 2)])
            j_in = np.concatenate(
                [np.arange(W - 1, dtype=np.int32)]
                + [np.arange(W, dtype=np.int32)] * (N - 2))
            seg_start = np.concatenate(
                [np.zeros(W - 1, np.int32)]
                + [np.full(W, (W - 1) + lv * W, np.int32)
                   for lv in range(N - 2)])
            lw = np.where(seg == 0, W - 1, W).astype(np.int32)
            shifted_j = j_in + max_hit
            keep = shifted_j < lw
            idx = seg_start + jnp.minimum(shifted_j, lw - 1)
            rng, k_ref = jax.random.split(rng)
            ridx = jax.random.randint(
                k_ref, (n_window,), 0, n_confirmed)
            window = jnp.where(keep, window[idx], out_buf[ridx])
        if mode == "sample":
            # Sampling loop filters EOS out of the newest level to avoid
            # numerical issues (reference filter_window,
            # decoding.py:131-135, applied :578-580 AFTER the slide);
            # replacement is a random copy from the confirmed tokens
            # (``copy_from``).
            rng, k_filt = jax.random.split(rng)
            ridx = jax.random.randint(k_filt, (W,), 0, n_confirmed)
            newest = window[-W:]
            hit_eos = jnp.any(
                newest[:, None] == eos_id[None, :], axis=1)
            window = window.at[-W:].set(
                jnp.where(hit_eos, out_buf[ridx], newest))

        finished = (
            state.finished
            | has_eos
            | (n_confirmed - state.init_len >= max_new)
            | (new_kv_len + S > cap)    # cache capacity safety stop
        )

        updates = dict(
            kv_len=new_kv_len,
            window=window,
            pool=pool,
            out_buf=out_buf,
            n_confirmed=n_confirmed,
            step_idx=state.step_idx + 1,
            finished=finished,
            rng=rng,
        )
        return updates, winner, max_hit

    return post


class StepFns(NamedTuple):
    init_state: Callable
    prefill_chunk: Callable
    prefill_all: Callable     # whole-prompt prefill, one jitted call
    prefill_from: Callable    # suffix-only prefill (prefix caching)
    decode_loop: Callable     # full greedy generation under lax.while_loop
    decode_step: Callable     # single greedy step (streaming / chat mode)
    sample_loop: Callable     # full sampling generation
    sample_step: Callable
    baseline_loop: Callable   # autoregressive greedy (parity tests, benches)
    baseline_step: Callable   # single AR step (baseline chat streaming,
                              # reference greedy_search_chat decoding.py:1266)


def build_step_fns(
    mcfg: llama.LlamaConfig,
    lcfg: LookaheadConfig,
    ecfg: EngineConfig,
    layout: Layout,
    top_k: int = 0,
    use_top_p: bool = True,
    mesh=None,
) -> StepFns:
    M = ecfg.max_seq_len
    S = layout.seq_len
    W = layout.window
    N = layout.level
    G = layout.guess_set_size
    GS = layout.guess_size
    n_window = layout.n_window
    C = ecfg.prefill_chunk

    shard_tokens = None
    if mesh is not None and ecfg.la > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard_tokens(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("la", None)))

    # pipeline stages: layer-stage sharding of the stacked params/caches
    pp = ecfg.pp if mesh is not None else 1
    pp_mesh = mesh if pp > 1 else None

    # Mistral-style sliding-window attention: a query at absolute position p
    # sees keys in (p - sw, p]. A window >= the cache capacity never binds.
    SW = mcfg.sliding_window or 0
    if SW >= M:
        SW = 0

    rope_cos, rope_sin = llama.rope_tables(mcfg, M)
    rel_pos = jnp.asarray(layout.rel_pos)
    spec_add = jnp.asarray(
        np.where(layout.spec_mask, 0.0, NEG_INF).astype(np.float32))
    col_ids = jnp.arange(M, dtype=jnp.int32)

    # Rows of the composite whose logits are consumed: row 0 (next token),
    # the newest window level and the verification branch (reference
    # out/inp/guess logits slicing, modeling_llama.py:1578-1606).
    logits_rows = jnp.asarray(np.concatenate([
        np.array([0], np.int64),
        np.arange(layout.inp_start, layout.inp_stop),
        np.arange(layout.guess_start, layout.seq_len),
    ]))

    # ------------------------------------------------------------------
    # Init
    # ------------------------------------------------------------------
    def init_state(k_cache, v_cache, pool: PoolState, out_buf, prompt_len, rng):
        """Window seeded at steady-state level sizes per the configured
        strategy (reference decoding.py:884-902; default ``copy_from``)."""
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
        return DecodeState(
            k_cache=k_cache,
            v_cache=v_cache,
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
    # Prefill
    # ------------------------------------------------------------------
    def prefill_chunk(params, state: DecodeState, tokens, start):
        """Process prompt tokens [start, start+C) into the KV cache. The
        caller feeds prompt[:-1]; the final prompt token is the first
        composite step's ``lst`` slot (matching the reference where prefill
        and the first lookahead forward are one call, decoding.py:937-939).
        With the Pallas engine the causal mask is fused into the kernel
        (the reference's flash path also covers prefill,
        modeling_llama.py:1177-1178) and KV blocks past the live context
        are skipped — no [C, M] dense mask is ever materialized."""
        positions = start + jnp.arange(C, dtype=jnp.int32)
        if lcfg.attention_impl == "pallas":
            mask = None
            attn_meta = {
                "kv_len": start, "level": N, "window": W, "guess_size": GS,
                "causal": True, "sliding_window": SW,
                "interpret": jax.default_backend() == "cpu",
            }
        else:
            vis = col_ids[None, :] <= positions[:, None]
            if SW:
                vis &= col_ids[None, :] > positions[:, None] - SW
            mask = jnp.where(vis, 0.0, NEG_INF)
            attn_meta = None
        _, k_cache, v_cache = llama.forward(
            params, mcfg, tokens, positions, state.k_cache, state.v_cache,
            start, mask, rope_cos, rope_sin, logits_rows=jnp.arange(0),
            attn_impl="pallas" if lcfg.attention_impl == "pallas" else "xla",
            attn_meta=attn_meta, pp=pp, mesh=pp_mesh,
            # dynamic-NTK: every prefill chunk uses the FULL prompt length
            # (HF prefills in one call whose rope table covers the prompt)
            rope_seq_len=state.init_len,
        )
        return state._replace(
            k_cache=k_cache, v_cache=v_cache,
            kv_len=jnp.minimum(start + C, state.init_len - 1),
        )

    def prefill_from(params, state: DecodeState, start0):
        """Prefill prompt[start0:-1] as ONE jitted call: a dynamic-trip
        ``fori_loop`` over C-sized chunks read straight from ``out_buf``.
        ``start0 > 0`` is the prefix-cache path: rows [0, start0) already
        live in the caches. The final chunk is overlap-aligned
        (start = n-C) so no write lands past the prompt region; a short
        prompt (n < C) pads within [0, C), whose tail slots stay masked
        until overwritten. Overlap-aligned chunks may REWRITE a few prefix
        rows — K/V are position-determined, so the rewrite is idempotent."""
        n = state.init_len - 1
        n_chunks = jnp.maximum(-(-jnp.maximum(n - start0, 0) // C), 0)

        def body(c, s):
            start = jnp.minimum(start0 + c * C, jnp.maximum(n - C, 0))
            tokens = jax.lax.dynamic_slice(s.out_buf, (start,), (C,))
            return prefill_chunk(params, s, tokens, start)

        state = jax.lax.fori_loop(0, n_chunks, body, state)
        return state._replace(kv_len=jnp.maximum(n, 0))

    def prefill_all(params, state: DecodeState):
        """Whole-prompt prefill (prefill_from at start 0)."""
        return prefill_from(params, state, jnp.int32(0))

    # ------------------------------------------------------------------
    # The composite lookahead step (shared by greedy & sampling modes)
    # ------------------------------------------------------------------
    def _make_decode_step(mode: str):
        assert mode in ("greedy", "sample")
        post = make_post_forward(mode, mcfg, lcfg, layout,
                                 top_k=top_k, use_top_p=use_top_p)

        def decode_step(params, state: DecodeState, max_new, eos_id,
                        temperature=1.0, top_p=1.0):
            kv_len = state.kv_len
            lst = state.out_buf[state.n_confirmed - 1]

            if lcfg.pool_key_len == 2:
                rows = pool_table_rows(
                    mcfg.vocab_size, 2, lcfg.pool_hash_size)
                prev = state.out_buf[
                    jnp.maximum(state.n_confirmed - 2, 0)]
                lookup_key = bigram_key(prev, lst, rows)
            else:
                prev = lst
                lookup_key = lst
            guesses, guess_valid = pool_lookup(
                state.pool, lookup_key)                   # [G,GS],[G]
            tokens = jnp.concatenate(
                [lst[None], state.window, guesses.reshape(-1)]
            ).astype(jnp.int32)
            positions = kv_len + rel_pos

            if lcfg.attention_impl == "pallas":
                # Composite mask fused into the kernel — no [S, M] dense
                # mask materialization at all (flash_attn_lade analog).
                mask = None
                attn_meta = {
                    "kv_len": kv_len, "level": N, "window": W,
                    "guess_size": GS, "sliding_window": SW,
                    "interpret": jax.default_backend() == "cpu",
                    # static within-composite mask: enables the kernel's
                    # rolled-operand path (no per-layer mask recomputation)
                    "spec_mask": jnp.asarray(layout.spec_mask),
                }
            else:
                # Mask over absolute cache slots: committed region visible
                # (bounded below by the sliding window when the model has
                # one), speculative block gets the static within-composite
                # mask, everything else -inf. (Replaces the reference's
                # per-step host-built dense mask, modeling_llama.py:115-207.)
                vis = (col_ids[None, :] < kv_len) & jnp.ones(
                    (S, 1), bool)
                if SW:
                    vis &= (col_ids[None, :]
                            > (kv_len + rel_pos)[:, None] - SW)
                base = jnp.where(vis, 0.0, NEG_INF)
                mask = jax.lax.dynamic_update_slice(
                    base, spec_add, (0, kv_len))
                attn_meta = None

            logits, k_cache, v_cache = llama.forward(
                params, mcfg, tokens, positions, state.k_cache,
                state.v_cache, kv_len, mask, rope_cos, rope_sin,
                logits_rows=logits_rows,
                attn_impl="pallas" if lcfg.attention_impl == "pallas" else "xla",
                attn_meta=attn_meta,
                shard_tokens=shard_tokens,
                pp=pp, mesh=pp_mesh,
                # dynamic-NTK: per-row keying (base(p+1) for the row at
                # position p) — exactly what HF incremental AR decode
                # produces, so lookahead stays token-exact vs the baseline
                rope_seq_len=positions + 1,
            )

            updates, winner, max_hit = post(
                state, logits, guesses, guess_valid, lst, prev,
                max_new, eos_id, temperature, top_p, jnp.int32(M))

            # ---- KV commit (reference decoding.py:1145-1163): the winning
            # n-gram's K/V move from the verification region to canonical
            # slots right after ``lst``'s slot. Fixed-size copy; slots
            # beyond max_hit are rewritten before ever becoming visible.
            if G > 0:
                src = kv_len + layout.guess_start + winner * GS

                def commit(cache):
                    # generic over plain [L, Hkv, M, D] buffers and
                    # quantized {"q": [L,Hkv,M,D], "s": [L,Hkv,M,1]} trees
                    def one(a):
                        sizes = a.shape[:2] + (GS,) + a.shape[3:]
                        blk = jax.lax.dynamic_slice(
                            a, (0, 0, src, 0), sizes)
                        return jax.lax.dynamic_update_slice(
                            a, blk, (0, 0, kv_len + 1, 0))
                    return jax.tree.map(one, cache)

                k_cache = commit(k_cache)
                v_cache = commit(v_cache)

            new_state = DecodeState(
                k_cache=k_cache,
                v_cache=v_cache,
                init_len=state.init_len,
                **updates,
            )
            # No-op once finished: required for batched (vmapped) decoding,
            # where the while_loop keeps executing until every lane is done.
            # (cond -> runtime branch single-sequence, select under vmap.)
            return jax.lax.cond(
                state.finished, lambda: state, lambda: new_state)

        return decode_step

    decode_step = _make_decode_step("greedy")
    sample_step = _make_decode_step("sample")

    def _loop(step):
        def loop(params, state: DecodeState, max_new, eos_id,
                 temperature=1.0, top_p=1.0):
            def cond(s):
                return ~s.finished

            def body(s):
                return step(params, s, max_new, eos_id, temperature, top_p)

            return jax.lax.while_loop(cond, body, state)
        return loop

    # ------------------------------------------------------------------
    # Autoregressive baseline (exactness tests and speedup benches): the
    # vanilla greedy loop the reference compares against (minimal.py
    # USE_LADE=0 path).
    # ------------------------------------------------------------------
    def baseline_step(params, s: DecodeState, max_new, eos_id,
                      temperature=1.0, top_p=1.0):
        kv_len = s.kv_len
        lst = s.out_buf[s.n_confirmed - 1]
        vis = col_ids[None, :] <= kv_len
        if SW:
            vis &= col_ids[None, :] > kv_len - SW
        mask = jnp.where(vis, 0.0, NEG_INF)
        logits, k_cache, v_cache = llama.forward(
            params, mcfg, lst[None], kv_len[None] + 0, s.k_cache,
            s.v_cache, kv_len, mask, rope_cos, rope_sin,
            pp=pp, mesh=pp_mesh,
            rope_seq_len=kv_len[None] + 1,   # per-row dynamic-NTK keying
        )
        nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        out_buf = jax.lax.dynamic_update_slice(
            s.out_buf, nxt[None], (s.n_confirmed,))
        n_confirmed = s.n_confirmed + 1
        finished = (
            s.finished
            | jnp.any(nxt == eos_id)
            | (n_confirmed - s.init_len >= max_new)
            | (kv_len + 2 > M)
        )
        new_state = s._replace(
            k_cache=k_cache, v_cache=v_cache, kv_len=kv_len + 1,
            out_buf=out_buf, n_confirmed=n_confirmed,
            step_idx=s.step_idx + 1, finished=finished,
        )
        return jax.lax.cond(s.finished, lambda: s, lambda: new_state)

    def baseline_loop(params, state: DecodeState, max_new, eos_id):
        def cond(s):
            return ~s.finished

        def body(s):
            return baseline_step(params, s, max_new, eos_id)

        return jax.lax.while_loop(cond, body, state)

    return StepFns(
        init_state=init_state,
        prefill_chunk=prefill_chunk,
        prefill_all=prefill_all,
        prefill_from=prefill_from,
        decode_loop=_loop(decode_step),
        decode_step=decode_step,
        sample_loop=_loop(sample_step),
        sample_step=sample_step,
        baseline_loop=baseline_loop,
        baseline_step=baseline_step,
    )
