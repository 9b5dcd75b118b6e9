"""Lookahead hyper-parameter autotuning.

The reference ships static guidance only ("7B: LEVEL=5, WIN=7, GUESS=7",
reference README.md:147-151, chatbot.py:11) — the right W/N/G depends on
model size, hardware and workload repetitiveness. ``autotune`` measures a
candidate grid on a sample prompt and returns the fastest configuration;
``save_tune_artifact`` persists the report in the exact schema bench.py
consumes (data/tune_realistic.json), so a tuned config is reproducible with
one command:

    python scripts/tune_realistic.py --grid small        # thin CLI wrapper

COST: each candidate changes the composite layout, so it compiles its own
decode loop — 2-6 minutes per candidate on a remote-tunnel TPU cold, ~20 s
warm via the persistent compile cache (``autotune`` enables it by default;
the cache makes re-tuning across processes cheap). The candidates cannot
share one compilation: W/N/G are shape parameters of the whole jitted loop.
This is a deploy-time tool; persist the winner alongside the model
checkpoint.

Candidates are (level, window, guess) triples or dicts of LookaheadConfig
fields (adding e.g. ``pool_key_len`` / ``attention_impl`` to the sweep).
The default grid covers the reference's recommended L4-L7 x W x G
neighborhood (README.md:147-151, minimal.py:8-9, chatbot.py:11) plus the
mid-band winners measured on v5e (data/tune_realistic*.json).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import sys
import time
from typing import List, Optional, Sequence, Tuple, Union

from ..config import EngineConfig, LookaheadConfig
from ..core.engine import LookaheadEngine

# Reference-derived starting points (README.md:147-151; minimal.py:8-9;
# chatbot.py:11) plus smaller points for little models / chips.
DEFAULT_CANDIDATES: List[Tuple[int, int, int]] = [
    (4, 5, 5),
    (5, 7, 7),
    (5, 15, 15),
    (7, 20, 20),
]

# The L4-L7 x W x G neighborhood that produced every measured mid-band
# winner (scripts/tune_realistic.py sweeps, data/tune_realistic*.json:
# L5/W4/G10, L5/W5/G10, L5/W7/G7 all live inside it).
REALISTIC_GRID: List[Tuple[int, int, int]] = sorted(set(
    itertools.product((4, 5, 6, 7), (4, 5, 7, 10), (5, 7, 10, 15))
) | set(DEFAULT_CANDIDATES))


@dataclasses.dataclass
class TuneResult:
    config: LookaheadConfig
    tokens_per_sec: float
    compression_ratio: float


Candidate = Union[Tuple[int, int, int], dict]


def _as_lcfg(cand: Candidate, pool_from_prompt: bool,
             pool_key_len: int) -> LookaheadConfig:
    if isinstance(cand, dict):
        kw = dict(cand)
        kw.setdefault("pool_from_prompt", pool_from_prompt)
        kw.setdefault("pool_key_len", pool_key_len)
        return LookaheadConfig(**kw)
    level, window, guess = cand
    return LookaheadConfig(
        level=level, window_size=window, guess_set_size=guess,
        pool_from_prompt=pool_from_prompt, pool_key_len=pool_key_len)


def enable_compile_cache(path: str = "~/.cache/jax_lade") -> None:
    """Persistent compile cache: candidate loops recompile in ~20 s instead
    of minutes on re-tuning runs. Safe to call repeatedly. A cache dir the
    caller already configured is left alone — repointing the process-global
    cache would redirect every later compile in their process."""
    import jax
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser(path))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - older jax knob names
        pass


def autotune(
    model_cfg,
    params,
    prompt_ids: Sequence[int],
    max_new_tokens: int = 128,
    candidates: Optional[Sequence[Candidate]] = None,
    engine_cfg: Optional[EngineConfig] = None,
    pool_from_prompt: bool = True,
    seed: int = 0,
    pool_key_len: int = 1,
    budget_s: float = 0.0,
    compile_cache: bool = True,
    progress=None,
) -> Tuple[LookaheadConfig, List[TuneResult]]:
    """Measure each candidate; return the fastest LookaheadConfig and the
    full report sorted best-first. ``budget_s`` > 0 stops the sweep (never
    mid-candidate) when the wall budget is exhausted; ``progress`` is an
    optional callback(candidate_lcfg, TuneResult-or-None)."""
    engine_cfg = engine_cfg or EngineConfig()
    grid = candidates if candidates is not None else DEFAULT_CANDIDATES
    if compile_cache:
        enable_compile_cache()
    t0 = time.time()
    report: List[TuneResult] = []
    for i, cand in enumerate(grid):
        if budget_s and time.time() - t0 > budget_s:
            print(f"autotune: budget exhausted after {i}/{len(grid)} "
                  "candidates; winner is of the measured subset only",
                  file=sys.stderr, flush=True)
            break
        try:
            # ValueError = infeasible (config validation or capacity);
            # a typo'd dict FIELD raises TypeError and must propagate
            lcfg = _as_lcfg(cand, pool_from_prompt, pool_key_len)
            eng = LookaheadEngine(model_cfg, params, lcfg, engine_cfg)
            eng.generate(prompt_ids, 8, seed=seed)       # compile + warm
            # median of 3 full runs; generate() itself records wall time
            runs = [eng.generate(prompt_ids, max_new_tokens, seed=seed)
                    for _ in range(3)]
        except ValueError:
            if progress is not None:
                progress(cand, None)
            continue   # infeasible candidate (config or prompt vs capacity)
        runs.sort(key=lambda r: r.tokens_per_sec)
        r = runs[1]
        res = TuneResult(
            config=lcfg,
            tokens_per_sec=r.tokens_per_sec,
            compression_ratio=r.compression_ratio)
        report.append(res)
        if progress is not None:
            progress(cand, res)
    if not report:
        raise ValueError("no feasible candidates for this engine config")
    report.sort(key=lambda t: -t.tokens_per_sec)
    return report[0].config, report


def measure_ar_baseline(model_cfg, params, prompt_ids, max_new_tokens=128,
                        engine_cfg=None, seed=0) -> float:
    """Median AR tok/s on the same weights/engine config — the honest
    denominator for speedup_vs_ar in the persisted artifact."""
    eng = LookaheadEngine(
        model_cfg, params,
        LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                        pool_from_prompt=True),
        engine_cfg or EngineConfig())
    eng.generate_baseline(prompt_ids, 8, seed=seed)
    runs = [eng.generate_baseline(prompt_ids, max_new_tokens, seed=seed)
            for _ in range(3)]
    runs.sort(key=lambda r: r.tokens_per_sec)
    return runs[1].tokens_per_sec


def save_tune_artifact(path: str, report: Sequence[TuneResult],
                       ar_tokens_per_sec: float = 0.0, **meta) -> dict:
    """Persist an autotune report in the schema bench.py consumes
    (``results`` sorted best-first; each row carries the LookaheadConfig
    fields bench.py reads back: level/window_size/guess_set_size plus
    pool_key_len/attention_impl when non-default)."""
    rows = []
    for r in sorted(report, key=lambda t: -t.tokens_per_sec):
        row = {
            "level": r.config.level,
            "window_size": r.config.window_size,
            "guess_set_size": r.config.guess_set_size,
            "pool_key_len": r.config.pool_key_len,
            "tok_per_sec": round(r.tokens_per_sec, 1),
            "compression_ratio": round(r.compression_ratio, 2),
        }
        if r.config.attention_impl != "auto":
            row["attention_impl"] = r.config.attention_impl
        if ar_tokens_per_sec:
            row["speedup_vs_ar"] = round(
                r.tokens_per_sec / ar_tokens_per_sec, 3)
        rows.append(row)
    out = dict(meta)
    if ar_tokens_per_sec:
        out["ar_tok_per_sec"] = round(ar_tokens_per_sec, 1)
    out["n_candidates_measured"] = len(rows)
    out["results"] = rows
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out
