"""Decode-state pytree threaded through the jitted lookahead loop.

Everything the reference keeps as host Python objects per step — the window
``past_tokens`` lists (decoding.py:902), the ``token_map`` pool dict (:911),
the growing ``all_old_tokens`` list (:879), the KV tuple cache and the
``steps``/EOS bookkeeping — lives here as fixed-shape device arrays so the
whole generation loop runs inside one ``lax.while_loop`` with zero host
round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from .pool import PoolState


class DecodeState(NamedTuple):
    k_cache: jax.Array      # [L, M, Hkv, D]
    v_cache: jax.Array      # [L, M, Hkv, D]
    kv_len: jax.Array       # scalar int32: committed cache slots
    window: jax.Array       # [n_window] int32 flattened lookahead levels
    pool: PoolState
    out_buf: jax.Array      # [M + GS] int32: prompt + confirmed tokens
    n_confirmed: jax.Array  # scalar int32 (includes the prompt)
    init_len: jax.Array     # scalar int32: prompt length
    step_idx: jax.Array     # scalar int32: decode steps taken
    finished: jax.Array     # scalar bool
    rng: jax.Array          # PRNGKey (sampling / window reseeding)
