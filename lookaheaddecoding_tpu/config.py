"""Configuration objects for the TPU-native lookahead decoding engine.

Mirrors the knob surface of the reference implementation's ``CONFIG_MAP``
(reference: lade/utils.py:13-38, lade/decoding.py:854-862) but as typed,
immutable dataclasses instead of a process-global mutable dict.

Reference keys -> fields:
  WINDOW_SIZE      -> LookaheadConfig.window_size
  LEVEL            -> LookaheadConfig.level
  GUESS_SET_SIZE   -> LookaheadConfig.guess_set_size
  ALWAYS_FWD_ONE   -> always 1 (the reference asserts this, decoding.py:873)
  POOL_FROM_PROMPT -> LookaheadConfig.pool_from_prompt
  USE_FLASH        -> LookaheadConfig.attention_impl == "pallas"
  DIST_WORKERS     -> parallel.mesh / sharding config (device mesh, not ranks)
  DEBUG            -> utils.logging verbosity
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class LookaheadConfig:
    """Lookahead decoding hyper-parameters (W / N / G in the paper).

    The reference's tuning guidance (README.md:151, minimal.py:8-9):
      7B model, 1 GPU:   level=5, window_size=7,  guess_set_size=7
      TinyLlama demo:    level=7, window_size=20, guess_set_size=20
      A100 chat:         level=5, window_size=15, guess_set_size=15
    """

    level: int = 5            # N: trajectory depth; n-gram size is level-1
    window_size: int = 7      # W: lookahead window width
    guess_set_size: int = 7   # G: max candidate n-grams verified per step & LRU cap
    pool_from_prompt: bool = False  # seed the n-gram pool from the prompt tokens
    # ALWAYS_FWD_ONE (reference decoding.py:556-573 sampling, :1119-1130
    # greedy): True (reference default; its greedy loop asserts it,
    # decoding.py:873) slides the window one position per step; False
    # additionally advances every level by the step's accepted span
    # (max_hit), refilling the vacated tail with random confirmed-token
    # copies (the reference's set_token(), :570-573). Window content only
    # ever *proposes* tokens, so either setting is token-exact.
    always_fwd_one: bool = True
    # Window seeding strategy (reference decoding.py:884-900 — the reference
    # defines random_set / copy_from / order_copy_from / copy_from_last and
    # uses copy_from):
    window_init: str = "copy_from"
    # N-gram pool key context length (beyond-reference extension): 1 keys
    # candidates on the last confirmed token (reference semantics,
    # decoding.py:37-78); 2 keys on the last TWO tokens (hashed), which
    # disambiguates continuations whose next token depends on more context
    # and sharply raises acceptance on such text.
    pool_key_len: int = 1
    # Hash-table rows for pool_key_len=2 (0 = 4x vocab, capped at 262144).
    pool_hash_size: int = 0
    # Attention implementation for the composite step:
    #   "xla"    - dense additive mask built in-graph (reference eager path analog)
    #   "pallas" - fused kernel computing the composite mask in-kernel
    #              (analog of the reference's flash_attn_lade CUDA fork)
    #   "auto"   - pallas on TPU wherever the kernel tiles (it matches the
    #              dense path at short context and wins ~20% end-to-end at
    #              long context); xla on CPU (the kernel would only run in
    #              slow interpret mode there) and for non-tiling capacities
    attention_impl: str = "auto"

    def __post_init__(self):
        if self.level < 3:
            raise ValueError("level must be >= 3 (need at least 2 window levels)")
        if self.window_size < 2:
            raise ValueError("window_size must be >= 2")
        if self.guess_set_size < 0:
            # The reference supports GUESS_SET_SIZE == -1 (unbounded set). A
            # device-resident pool needs a static bound; callers should map -1
            # to an explicit large cap instead.
            raise ValueError(
                "guess_set_size must be >= 0; the reference's unbounded (-1) "
                "mode must be mapped to an explicit cap for a device-resident pool"
            )

    @property
    def guess_size(self) -> int:
        """Length of each candidate n-gram (reference GUESS_SIZE = LEVEL-1)."""
        return self.level - 1


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Sampling parameters. The reference supports exactly the
    Temperature/TopK/TopP warper set (decoding.py:375-377)."""

    temperature: float = 1.0
    top_k: int = 0            # 0 = disabled
    top_p: float = 1.0        # 1.0 = disabled

    def __post_init__(self):
        # HF warpers reject temperature <= 0; a zero temperature would
        # produce inf/NaN logits (use engine.generate for greedy decoding)
        if not self.temperature > 0:
            raise ValueError(
                "temperature must be > 0 (use generate() for greedy)")
        if not 0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")

    @property
    def is_greedy(self) -> bool:
        return False  # greedy mode is selected by the engine API, not here


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Engine-level settings: buffer sizes, dtypes, parallelism."""

    max_seq_len: int = 2048          # KV cache capacity (prompt + generated + spec)
    prefill_chunk: int = 256         # prefill processed in fixed-size chunks
    dtype: str = "bfloat16"          # activation / weight compute dtype
    kv_quant: Optional[str] = None   # None | "int8": quantized KV cache
    # Fuse qkv and gate/up projections into single wide matmuls at engine
    # init (single-chip, unquantized params only). Off by default: measured
    # neutral on v5e (XLA schedules the split matmuls equally well).
    fuse_projections: bool = False
    # Mesh axis sizes; product must equal len(jax.devices()) when used.
    tp: int = 1                      # tensor-parallel axis over ICI
    la: int = 1                      # lookahead-parallel axis (speculative tokens)
    dp: int = 1                      # data/request parallel axis
    pp: int = 1                      # pipeline stages (layer-stage sharding)
    donate_state: bool = True        # donate decode state buffers across steps
