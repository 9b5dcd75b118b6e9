"""Acceleration accounting & logging.

Parity surface for the reference's CONFIG_MAP["log"] accumulator,
``log_history`` and ``save_log`` (reference: lade/utils.py:74-87,
lade/decoding.py:1231-1235) — per-generate [generated, steps, compression]
records plus an aggregate summary, saved as JSON instead of torch.save.
"""

from __future__ import annotations

import json
from typing import List, Optional


class DecodeLog:
    def __init__(self, debug: bool = False):
        self.records: List[list] = []   # [generated, steps, ratio]
        # DEBUG=1 per-generate banner (reference decoding.py:1231-1234)
        self.debug = debug

    def append(self, result) -> None:
        gen, steps = result.num_generated, result.steps
        self.records.append([gen, steps, round(gen / max(steps, 1), 2)])
        if self.debug:
            print(
                "\n==========================ACCELERATION===REPORT======================================\n"
                f"Generated tokens: {gen} Total steps: {steps} "
                f"Compression ratio: {round(gen / max(steps, 1), 2)}\n"
                "======================================================================================")

    def log_history(self, clear: bool = False) -> Optional[str]:
        """Aggregate summary (reference utils.py:74-83)."""
        if not self.records:
            return None
        gen = sum(r[0] for r in self.records)
        steps = sum(r[1] for r in self.records)
        msg = (
            "\n==========================ACCELERATION===SUMMARY======================================\n"
            f"Generated tokens: {gen} Total steps: {steps} "
            f"Compression ratio: {round(gen / max(steps, 1), 2)}\n"
            "======================================================================================"
        )
        if clear:
            self.records.clear()
        return msg

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.records, f)

    @classmethod
    def load(cls, path: str) -> "DecodeLog":
        log = cls()
        with open(path) as f:
            log.records = json.load(f)
        return log
