"""Lookahead hyper-parameter autotuning.

The reference ships static guidance only ("7B: LEVEL=5, WIN=7, GUESS=7",
reference README.md:147-151, chatbot.py:11) — the right W/N/G depends on
model size, hardware and workload repetitiveness. ``autotune`` measures a
candidate grid on a sample prompt and returns the fastest configuration.

COST: each (level, window, guess) point changes the composite layout, so it
compiles its own decode loop — 2-6 minutes per candidate on a remote-tunnel
TPU cold, ~20 s warm via the persistent compile cache (enable
``jax.config.update("jax_compilation_cache_dir", ...)`` before calling, as
bench.py does; the cache makes re-tuning across processes cheap). The
candidates cannot share one compilation: W/N/G are shape parameters of the
whole jitted loop. This is a deploy-time tool; persist the winner alongside
the model checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ..config import EngineConfig, LookaheadConfig
from ..core.engine import LookaheadEngine

# Reference-derived starting grid (README.md:147-151; minimal.py:8-9;
# chatbot.py:11) plus smaller points for little models / chips.
DEFAULT_CANDIDATES: List[Tuple[int, int, int]] = [
    (4, 5, 5),
    (5, 7, 7),
    (5, 15, 15),
    (7, 20, 20),
]


@dataclasses.dataclass
class TuneResult:
    config: LookaheadConfig
    tokens_per_sec: float
    compression_ratio: float


def autotune(
    model_cfg,
    params,
    prompt_ids: Sequence[int],
    max_new_tokens: int = 128,
    candidates: Optional[Sequence[Tuple[int, int, int]]] = None,
    engine_cfg: Optional[EngineConfig] = None,
    pool_from_prompt: bool = True,
    seed: int = 0,
    pool_key_len: int = 1,
) -> Tuple[LookaheadConfig, List[TuneResult]]:
    """Measure each (level, window, guess) candidate; return the fastest
    LookaheadConfig and the full report sorted best-first."""
    engine_cfg = engine_cfg or EngineConfig()
    grid = candidates if candidates is not None else DEFAULT_CANDIDATES
    report: List[TuneResult] = []
    for (level, window, guess) in grid:
        try:
            lcfg = LookaheadConfig(
                level=level, window_size=window, guess_set_size=guess,
                pool_from_prompt=pool_from_prompt,
                pool_key_len=pool_key_len)
            eng = LookaheadEngine(model_cfg, params, lcfg, engine_cfg)
            eng.generate(prompt_ids, 8, seed=seed)       # compile + warm
            # median of 3 full runs; generate() itself records wall time
            runs = [eng.generate(prompt_ids, max_new_tokens, seed=seed)
                    for _ in range(3)]
        except ValueError:
            continue   # infeasible candidate (config or prompt vs capacity)
        runs.sort(key=lambda r: r.tokens_per_sec)
        r = runs[1]
        report.append(TuneResult(
            config=lcfg,
            tokens_per_sec=r.tokens_per_sec,
            compression_ratio=r.compression_ratio))
    if not report:
        raise ValueError("no feasible candidates for this engine config")
    report.sort(key=lambda t: -t.tokens_per_sec)
    return report[0].config, report
