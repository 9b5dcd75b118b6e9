"""Continuous batching over the paged (shared-pool) KV cache.

The flat ContinuousBatchingEngine (core/serving.py) stacks a full private
KV cache per lane — ~1.07 GB bf16 (~0.54 GB int8) per lane at
Llama-2-7B/2048 — which caps lane counts long before compute does. Here
every lane, prefix cache and conversation turn shares ONE physical page
pool (core/paged.py): admission allocates exactly the pages a request can
touch, prefix sharing is a refcount bump plus one copy-on-write of a
partial tail page, and when the pool is exhausted requests WAIT in the
queue (admission backpressure) instead of the device OOMing.

Scheduling is the fairness lane policy (the measured TTFT winner when
live requests ~= lanes, PARITY.md): every active lane advances each
step through ONE fused batched decode step (core/paged_step.py), with
``steps_per_sync`` steps per host round-trip, per-request streaming, and
greedy or SpecInfer-sampling verification. The reference has no serving
layer at all (batch==1 asserted, reference modeling_llama.py:1448; its
evals shard questions across processes, eval_mtbench.py:51-57)."""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, LookaheadConfig
from ..models import llama
from .engine import MAX_EOS_IDS, GenerationResult, _eos_vec
from .layout import build_layout
from .paged import (BlockAllocator, OutOfPages, copy_page, make_paged_pool,
                    pages_needed)
from .paged_step import PagedLaneState, build_paged_step_fns
from .pool import (PoolState, apply_host_fill, host_prompt_fill, pool_init,
                   pool_table_rows)
from .serving import Request


@dataclasses.dataclass(frozen=True)
class PagedPrefix:
    """Precomputed KV prefix living in the SHARED page pool.

    Unlike the flat engine's PrefixCache (a full engine-capacity buffer per
    prefix, core/engine.py), this holds only ``ceil(length / page_size)``
    refcounted pages: admitting a request that reuses it bumps refcounts on
    the full pages and copies at most one partial tail page. Call
    :meth:`PagedServingEngine.release_prefix` when done with it — page
    lifetime is explicit, not garbage-collected."""

    tokens: np.ndarray
    pages: tuple            # physical page ids covering [0, length)
    length: int
    pool: Optional[PoolState] = None   # carried warm n-gram pool


class PagedServingEngine:
    def __init__(
        self,
        model_cfg: llama.LlamaConfig,
        params,
        lookahead: Optional[LookaheadConfig] = None,
        engine: Optional[EngineConfig] = None,
        num_lanes: int = 4,
        page_size: int = 256,
        n_pages: Optional[int] = None,
        steps_per_sync: int = 4,
        sampling=None,
        log=None,
    ):
        """``n_pages`` is the data-page budget (the real memory knob; the
        per-lane trash pages are added on top). Default: flat-equivalent
        capacity ``num_lanes * ceil(max_seq_len / page_size)`` — savings
        come from setting the budget to the workload's actual token volume
        instead of lanes x max capacity."""
        self.mcfg = model_cfg
        self.params = params
        self.lcfg = lookahead or LookaheadConfig()
        self.ecfg = engine or EngineConfig()
        self.sampling = sampling
        self.log = log
        self.num_lanes = num_lanes
        self.page_size = page_size

        if (self.mcfg.rope_scaling is not None
                and self.mcfg.rope_scaling[0] == "dynamic"):
            raise ValueError(
                "paged serving does not support dynamic-NTK rope scaling "
                "(prefix sharing would key the rope base on the wrong "
                "length); use the flat LookaheadEngine")
        if self.ecfg.pp > 1 or self.ecfg.tp > 1 or self.ecfg.la > 1:
            raise ValueError(
                "paged serving is single-chip in this version; use the "
                "flat LookaheadEngine for pp/tp/la meshes")
        if self.lcfg.attention_impl == "auto":
            use_pallas = (jax.default_backend() == "tpu"
                          and page_size % 128 == 0)
            self.lcfg = dataclasses.replace(
                self.lcfg, attention_impl="pallas" if use_pallas else "xla")
        elif self.lcfg.attention_impl == "pallas":
            if page_size % 128 != 0:
                raise ValueError(
                    "the paged Pallas kernel needs page_size % 128 == 0 "
                    f"(got {page_size}); round it or use attention_impl="
                    "'xla'")
        self.layout = build_layout(self.lcfg)
        S = self.layout.seq_len
        M = self.ecfg.max_seq_len
        if M < S + 8:
            raise ValueError("max_seq_len too small for the composite step")
        if (self.mcfg.sliding_window is not None
                and S > self.mcfg.sliding_window):
            raise ValueError(
                "composite step size exceeds the model's sliding window")

        self._NB = -(-M // page_size)
        if n_pages is None:
            n_pages = num_lanes * self._NB
        self._total_pages = n_pages + num_lanes
        self.alloc = BlockAllocator(self._total_pages, reserved=num_lanes)

        top_k, use_top_p = 0, True
        if sampling is not None:
            top_k, use_top_p = sampling.top_k, sampling.top_p < 1.0
        self._fns = build_paged_step_fns(
            self.mcfg, self.lcfg, self.ecfg, self.layout, page_size,
            top_k=top_k, use_top_p=use_top_p)

        self._k_pool, self._v_pool = make_paged_pool(
            self.mcfg, self._total_pages, page_size,
            quant=self.ecfg.kv_quant)

        # idle batched lane states: finished lanes whose tables point every
        # logical page at the lane's own trash page
        B, NB = num_lanes, self._NB
        rows = pool_table_rows(self.mcfg.vocab_size, self.lcfg.pool_key_len,
                               self.lcfg.pool_hash_size)
        self._pool_rows = rows
        G, GS = self.layout.guess_set_size, self.layout.guess_size
        self._zero_pool = pool_init(rows, G, GS)
        zp = jax.tree.map(lambda x: jnp.stack([x] * B), self._zero_pool)
        self._batched = PagedLaneState(
            table=jnp.tile(jnp.arange(B, dtype=jnp.int32)[:, None], (1, NB)),
            cap=jnp.full((B,), S + 1, jnp.int32),
            trash=jnp.arange(B, dtype=jnp.int32) * page_size,
            kv_len=jnp.zeros((B,), jnp.int32),
            window=jnp.zeros((B, self.layout.n_window), jnp.int32),
            pool=zp,
            out_buf=jnp.zeros((B, M + GS), jnp.int32),
            n_confirmed=jnp.ones((B,), jnp.int32),
            init_len=jnp.ones((B,), jnp.int32),
            step_idx=jnp.zeros((B,), jnp.int32),
            finished=jnp.ones((B,), bool),
            rng=jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32)),
        )
        self._idle_lane = jax.tree.map(lambda x: x[0], self._batched)

        step_fn = (self._fns.decode_batch if sampling is None
                   else self._fns.sample_batch)

        def multi_step(params, k_pool, v_pool, states, max_new, eos,
                       temp, topp):
            def body(_, c):
                kp, vp, st = c
                return step_fn(params, kp, vp, st, max_new, eos, temp, topp)
            return jax.lax.fori_loop(
                0, steps_per_sync, body, (k_pool, v_pool, states))

        self._vstep = jax.jit(multi_step, donate_argnums=(1, 2, 3))

        def insert_lane(batched, lane_state, lane):
            return jax.tree.map(
                lambda b, s: jax.lax.dynamic_update_index_in_dim(
                    b, s, lane, axis=0),
                batched, lane_state)

        self._insert = jax.jit(insert_lane, donate_argnums=(0,))
        self._copy_page = jax.jit(
            lambda kp, vp, src, dst: copy_page((kp, vp), src, dst, page_size),
            donate_argnums=(0, 1))
        self._lane_pool = jax.jit(
            lambda pool, lane: jax.tree.map(lambda x: x[lane], pool))
        self._prepares: Dict = {}

        self._queue: Deque = deque()
        self._iqueue: Deque = deque()      # interactive fast-lane queue
        self._results: List[GenerationResult] = []
        self._meta: Dict[int, dict] = {}       # lane -> admission record
        self._max_new = np.zeros((B,), np.int32)
        self._eos = np.full((B, MAX_EOS_IDS), -1, np.int32)
        self._temp = np.ones((B,), np.float32)
        self._topp = np.ones((B,), np.float32)
        self._first_tok: Dict[int, float] = {}

    # ------------------------------------------------------------------
    @property
    def pages_free(self) -> int:
        return self.alloc.free_pages

    def memory_stats(self) -> dict:
        """Pool occupancy plus the flat-engine equivalent for comparison."""
        leaf_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves((self._k_pool, self._v_pool)))
        per_page = leaf_bytes // self._total_pages
        return {
            "page_size": self.page_size,
            "pages_total": self._total_pages - self.num_lanes,
            "pages_used": self.alloc.used_pages,
            "pages_free": self.alloc.free_pages,
            "pool_bytes": leaf_bytes,
            "bytes_per_page": per_page,
            "flat_equiv_bytes": per_page * self._NB * self.num_lanes,
        }

    # ------------------------------------------------------------------
    def _get_prepare(self, has_fill: bool, has_ppool: bool):
        key = (has_fill, has_ppool)
        fn = self._prepares.get(key)
        if fn is not None:
            return fn
        G, GS = self.layout.guess_set_size, self.layout.guess_size
        rows = self._pool_rows

        def call(params, k_pool, v_pool, batched, lane_idx, table, cap,
                 trash, out_buf, prompt_len, rng, fill, ppool, plen):
            pool = ppool if has_ppool else pool_init(rows, G, GS)
            lane = self._fns.init_lane(
                table, cap, trash, pool, out_buf, prompt_len, rng)
            if has_fill:
                lane = lane._replace(
                    pool=apply_host_fill(lane.pool, *fill, merge=True))
            pools, lane = self._fns.prefill_from(
                params, (k_pool, v_pool), lane, plen)
            # admission is ONE dispatch: prefill + insertion into the
            # batched lane states (each extra dispatch is a tunnel round
            # trip that lands straight in TTFT)
            batched = jax.tree.map(
                lambda b, s: jax.lax.dynamic_update_index_in_dim(
                    b, s, lane_idx, axis=0),
                batched, lane)
            return pools[0], pools[1], batched

        fn = jax.jit(call, donate_argnums=(1, 2, 3))
        self._prepares[key] = fn
        return fn

    def _host_fill(self, prompt: np.ndarray, prefix) -> Optional[tuple]:
        if not self.lcfg.pool_from_prompt:
            return None
        start = 0
        if prefix is not None and prefix.pool is not None:
            # warm pool carried: restrict the fill to the new suffix (plus
            # level-1 boundary context) — same rule as the flat engine's
            # _prefix_fill; merge semantics keep undisplaced warm entries
            start = max(0, prefix.length - self.lcfg.level)
        return host_prompt_fill(
            prompt[start:], self.lcfg.level, self.layout.guess_set_size,
            pad_to=self.ecfg.max_seq_len, key_len=self.lcfg.pool_key_len,
            table_rows=self._pool_rows)

    def _validate(self, req: Request):
        prompt = np.asarray(req.prompt, np.int32).reshape(-1)
        P = len(prompt)
        S = self.layout.seq_len
        M = self.ecfg.max_seq_len
        if req.max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        if P < 1:
            raise ValueError("empty prompt")
        if P - 1 + S > M:
            raise ValueError(
                f"prompt ({P}) + composite step ({S}) exceeds "
                f"max_seq_len ({M})")
        eos = np.asarray(_eos_vec(req.eos_token_id))
        if self.sampling is None and (req.temperature is not None
                                      or req.top_p is not None):
            raise ValueError(
                "request sets temperature/top_p but the engine was built "
                "without a SamplingConfig (greedy mode)")
        temp = topp = 1.0
        if self.sampling is not None:
            temp = (self.sampling.temperature if req.temperature is None
                    else req.temperature)
            topp = (self.sampling.top_p if req.top_p is None else req.top_p)
            dataclasses.replace(self.sampling, temperature=temp, top_p=topp)
        prefix = req.prefix
        if prefix is not None:
            if not isinstance(prefix, PagedPrefix):
                raise ValueError(
                    "paged serving needs a PagedPrefix (from "
                    "PagedServingEngine.precompute_prefix or a "
                    "return_prefix result), not a flat-engine PrefixCache")
            if (P < prefix.length
                    or not np.array_equal(prompt[:prefix.length],
                                          np.asarray(prefix.tokens))):
                raise ValueError(
                    "prompt does not start with the paged prefix")
        return prompt, eos, temp, topp

    def _fail(self, req: Request, err: Exception) -> None:
        res = GenerationResult(
            tokens=np.asarray(req.prompt, np.int32),
            prompt_len=len(req.prompt), steps=0)
        res.request_id = req.request_id
        res.error = str(err)
        self._results.append(res)

    # ------------------------------------------------------------------
    def submit(self, request: Request) -> None:
        """``request.interactive`` jumps the admission queue (latency
        class); page-allocation backpressure still applies."""
        q = self._iqueue if request.interactive else self._queue
        q.append((request, time.perf_counter()))

    def _admit(self) -> None:
        if not (self._queue or self._iqueue):
            return
        finished = np.asarray(self._batched.finished)
        BS = self.page_size
        S = self.layout.seq_len
        M = self.ecfg.max_seq_len
        for lane in range(self.num_lanes):
            src = self._iqueue if self._iqueue else self._queue
            if not src:
                break
            if lane in self._meta or not finished[lane]:
                continue
            req, t_submit = src[0]
            try:
                prompt, eos, temp, topp = self._validate(req)
            except ValueError as e:
                src.popleft()
                self._fail(req, e)
                continue
            prefix = req.prefix
            plen = prefix.length if prefix is not None else 0
            npages, first_page = pages_needed(
                len(prompt), req.max_new_tokens, S, BS, M, plen)
            if npages > self._total_pages - self.num_lanes:
                src.popleft()
                self._fail(req, OutOfPages(
                    f"request needs {npages} pages but the pool only has "
                    f"{self._total_pages - self.num_lanes}"))
                continue
            try:
                priv = self.alloc.alloc(npages)
            except OutOfPages:
                # admission backpressure: requests WAIT (FIFO within their
                # class) until pages free up — the paged replacement for
                # device OOM
                break
            src.popleft()

            table = np.full((self._NB,), lane, np.int32)   # trash default
            shared: List[int] = []
            if prefix is not None:
                full = plen // BS
                shared = list(prefix.pages[:full])
                if shared:
                    self.alloc.share(shared)
                    table[:full] = shared
                if plen % BS:
                    # copy-on-write of the partial tail page: the lane will
                    # write suffix rows into it
                    self._k_pool, self._v_pool = self._copy_page(
                        self._k_pool, self._v_pool,
                        jnp.int32(prefix.pages[full]), jnp.int32(priv[0]))
            table[first_page:first_page + npages] = priv
            cap = min((first_page + npages) * BS, M)

            out_buf = np.zeros((M + self.layout.guess_size,), np.int32)
            out_buf[:len(prompt)] = prompt
            fill = self._host_fill(prompt, prefix)
            ppool = prefix.pool if (prefix is not None
                                    and prefix.pool is not None) else None
            prep = self._get_prepare(fill is not None, ppool is not None)
            self._k_pool, self._v_pool, self._batched = prep(
                self.params, self._k_pool, self._v_pool, self._batched,
                jnp.int32(lane), jnp.asarray(table), jnp.int32(cap),
                jnp.int32(lane * BS), jnp.asarray(out_buf),
                jnp.int32(len(prompt)), jax.random.PRNGKey(req.seed),
                fill, ppool, jnp.int32(plen))
            self._max_new[lane] = req.max_new_tokens
            self._eos[lane] = eos
            self._temp[lane] = temp
            self._topp[lane] = topp
            self._first_tok.pop(lane, None)
            self._meta[lane] = dict(
                req=req, priv=priv, shared=shared,
                t0=time.perf_counter(), t_submit=t_submit,
                served=len(prompt) if req.on_tokens is not None else None)

    # ------------------------------------------------------------------
    def _observe(self):
        finished, n_confirmed, init_len, kv_len = jax.device_get(
            (self._batched.finished, self._batched.n_confirmed,
             self._batched.init_len, self._batched.kv_len))
        now = time.perf_counter()
        for lane in self._meta:
            if (lane not in self._first_tok
                    and n_confirmed[lane] > init_len[lane]):
                self._first_tok[lane] = now
        return (np.asarray(finished), np.asarray(n_confirmed),
                np.asarray(init_len), np.asarray(kv_len))

    def _emit_stream(self, n_confirmed, init_len):
        pending = []
        for lane, meta in self._meta.items():
            if meta["served"] is None:
                continue
            total = min(int(n_confirmed[lane]),
                        int(init_len[lane]) + meta["req"].max_new_tokens)
            if total > meta["served"]:
                pending.append((lane, meta, total))
        if not pending:
            return None
        out_buf = np.asarray(self._batched.out_buf)
        for lane, meta, total in pending:
            chunk = out_buf[lane, meta["served"]:total].copy()
            meta["req"].on_tokens(chunk)
            meta["served"] = total
        return out_buf

    def _harvest(self, finished, n_confirmed, init_len, kv_len,
                 out_buf=None) -> None:
        done = [l for l in list(self._meta) if finished[l]]
        if not done:
            return
        steps = np.asarray(self._batched.step_idx)
        if out_buf is None:
            out_buf = np.asarray(self._batched.out_buf)
        tables = None
        now = time.perf_counter()
        BS = self.page_size
        for lane in done:
            meta = self._meta.pop(lane)
            req = meta["req"]
            total = min(int(n_confirmed[lane]),
                        int(init_len[lane]) + req.max_new_tokens)
            res = GenerationResult(
                tokens=out_buf[lane, :total].copy(),
                prompt_len=int(init_len[lane]),
                steps=int(steps[lane]),
                wall_time_s=now - meta["t0"],
                ttft_s=self._first_tok.pop(lane, now) - meta["t_submit"],
                latency_s=now - meta["t_submit"],
            )
            res.request_id = req.request_id
            if getattr(req, "return_prefix", False):
                # conversation carry: the pages covering the confirmed KV
                # become the prefix (refcount bump — NOT a copy); the
                # remainder is freed with the lane
                kv = min(int(kv_len[lane]), total)
                n_px = -(-kv // BS)
                if tables is None:
                    tables = np.asarray(self._batched.table)
                px_pages = [int(p) for p in tables[lane, :n_px]]
                self.alloc.share(px_pages)
                res.prefix = PagedPrefix(
                    tokens=out_buf[lane, :kv].copy(),
                    pages=tuple(px_pages), length=kv,
                    pool=self._lane_pool(self._batched.pool, lane))
            self.alloc.release(meta["shared"] + meta["priv"])
            # reset the lane to idle-trash so its speculative writes can
            # never touch pages that get reallocated
            idle = self._idle_lane._replace(
                table=jnp.full((self._NB,), lane, jnp.int32),
                trash=jnp.int32(lane * BS))
            self._batched = self._insert(self._batched, idle, lane)
            self._results.append(res)
            if self.log is not None:
                self.log.append(res)

    # ------------------------------------------------------------------
    def step(self) -> bool:
        """Admit + ``steps_per_sync`` fused batched decode steps + harvest.
        Returns True while anything is active or queued."""
        self._admit()
        if not self._meta:
            return bool(self._queue or self._iqueue)
        self._k_pool, self._v_pool, self._batched = self._vstep(
            self.params, self._k_pool, self._v_pool, self._batched,
            jnp.asarray(self._max_new), jnp.asarray(self._eos),
            jnp.asarray(self._temp), jnp.asarray(self._topp))
        finished, n_confirmed, init_len, kv_len = self._observe()
        out_buf = self._emit_stream(n_confirmed, init_len)
        self._harvest(finished, n_confirmed, init_len, kv_len, out_buf)
        return bool(self._meta or self._queue or self._iqueue)

    def run(self, requests: Sequence[Request]) -> List[GenerationResult]:
        for r in requests:
            self.submit(r)
        while self.step():
            pass
        out, self._results = self._results, []
        return out

    # ------------------------------------------------------------------
    def generate(self, prompt_ids, max_new_tokens, eos_token_id=None,
                 seed: int = 0, prefix: Optional[PagedPrefix] = None,
                 return_prefix: bool = False) -> GenerationResult:
        """Single-request convenience driving the lane scheduler (greedy,
        or sampling when the engine was built with a SamplingConfig)."""
        req = Request(prompt=prompt_ids, max_new_tokens=max_new_tokens,
                      eos_token_id=eos_token_id, seed=seed, prefix=prefix,
                      return_prefix=return_prefix)
        out = self.run([req])
        res = out[0]
        if res.error is not None:
            raise ValueError(res.error)
        return res

    # ------------------------------------------------------------------
    def precompute_prefix(self, prefix_ids: Sequence[int]) -> PagedPrefix:
        """Prefill a shared prefix ONCE into freshly allocated pool pages.
        The result holds ``ceil(len/page_size)`` refcounted pages; release
        with :meth:`release_prefix` when no longer needed."""
        prefix = np.asarray(prefix_ids, np.int32).reshape(-1)
        P0 = len(prefix)
        M = self.ecfg.max_seq_len
        BS = self.page_size
        if P0 < 1:
            raise ValueError("empty prefix")
        if P0 + 1 + self.layout.seq_len > M:
            raise ValueError(
                f"prefix ({P0}) leaves no room for a suffix + composite "
                f"step within max_seq_len ({M})")
        n_px = -(-P0 // BS)
        pages = self.alloc.alloc(n_px)
        table = np.full((self._NB,), 0, np.int32)
        table[:n_px] = pages
        out_buf = np.zeros((M + self.layout.guess_size,), np.int32)
        out_buf[:P0] = prefix
        if "precompute" not in self._prepares:
            G, GS = self.layout.guess_set_size, self.layout.guess_size
            rows = self._pool_rows

            def call(params, k_pool, v_pool, table, cap, trash, out_buf,
                     prompt_len, rng):
                pool = pool_init(rows, G, GS)
                lane = self._fns.init_lane(
                    table, cap, trash, pool, out_buf, prompt_len, rng)
                pools, _ = self._fns.prefill_from(
                    params, (k_pool, v_pool), lane, jnp.int32(0))
                return pools

            self._prepares["precompute"] = jax.jit(
                call, donate_argnums=(1, 2))
        # prompt_len = P0+1 makes the prefill cover [0, P0) — every prefix
        # row lands in its page (flat-engine precompute trick); padded
        # rows go to lane 0's trash page (garbage-by-design)
        self._k_pool, self._v_pool = self._prepares["precompute"](
            self.params, self._k_pool, self._v_pool,
            jnp.asarray(table), jnp.int32(min(n_px * BS, M)),
            jnp.int32(0), jnp.asarray(out_buf), jnp.int32(P0 + 1),
            jax.random.PRNGKey(0))
        return PagedPrefix(tokens=prefix, pages=tuple(int(p) for p in pages),
                           length=P0)

    def release_prefix(self, prefix: PagedPrefix) -> None:
        """Return the prefix's page references to the pool."""
        self.alloc.release(list(prefix.pages))
