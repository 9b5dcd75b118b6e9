"""Static composite-step layout for lookahead decoding.

The reference rebuilds the composite input (window levels + verification
n-grams), its position ids and its dense attention mask with host Python
every step (reference: lade/models/modeling_llama.py:1471-1511 for the
assembly, :115-207 for the mask). On TPU we instead fix ONE static layout at
engine-build time; every per-step quantity is either a compile-time constant
derived here or pure index arithmetic against the dynamic scalar ``kv_len``.

Composite index space (steady state, one jitted shape for the whole run):

    idx 0                      : the last confirmed token ("lst")
    idx [1, W)                 : window level 0   (W-1 tokens)
    idx [l*W, (l+1)*W), l=1..N-2 : window level l (W tokens each)
    idx [(N-1)*W, (N-1)*W + G*(N-1)) : G candidate n-grams, (N-1) tokens each

    S = (N-1)*W + G*(N-1) total query tokens per step.

This matches the reference's steady-state geometry exactly: after its warm-up
(decoding.py:1038-1066) the reference's level sizes are [W-1, W, ..., W] and
the composite is [lst] + levels + guesses. We run this single shape from step
0 (window levels are seeded with prompt copies and refreshed by the normal
slide rule for the first N-2 steps) — the content of the speculative window
never affects which tokens are *accepted*, so output exactness vs. the
autoregressive baseline is preserved while avoiding the reference's N-2
shape-changing warm-up forwards.

Relative positions (reference modeling_llama.py:1493-1503, steady state where
``offset = len(level0)+1-len(level_l) = 0``):

    pos(lst)            = P          (P = current last confirmed position)
    pos(L0[j])          = P + 1 + j
    pos(Ll[j])  (l>=1)  = P + l + j
    pos(guess g, tok i) = P + 1 + i

Attention visibility inside the composite block (reference
j_make_causal_mask_multilevel, modeling_llama.py:115-207, steady state): see
``_build_spec_mask``. All composite tokens additionally see every committed
KV slot (< kv_len).
"""

from __future__ import annotations

import dataclasses
import numpy as np

from ..config import LookaheadConfig


@dataclasses.dataclass(frozen=True)
class Layout:
    """Compile-time geometry of the composite lookahead step."""

    level: int                 # N
    window: int                # W
    guess_set_size: int        # G
    guess_size: int            # N-1, tokens per candidate n-gram
    n_window: int              # (W-1) + (N-2)*W tokens of window levels
    n_guess_tokens: int        # G * (N-1)
    seq_len: int               # S: total composite query tokens
    rel_pos: np.ndarray        # [S] int32, position offsets relative to lst
    spec_mask: np.ndarray      # [S, S] bool, within-composite visibility
    # Static slices into the composite index space:
    window_start: int          # == 1
    inp_start: int             # start of the newest level (N-2)
    inp_stop: int              # inp_start + W
    guess_start: int           # start of the flattened guess region

    @property
    def window_slice(self) -> slice:
        return slice(1, 1 + self.n_window)

    @property
    def inp_slice(self) -> slice:
        """Rows whose argmax forms the next window level (reference
        ``inp_logits``, modeling_llama.py:1591/1606)."""
        return slice(self.inp_start, self.inp_stop)

    @property
    def guess_slice(self) -> slice:
        """Rows of the verification branch (reference ``guess_logits``)."""
        return slice(self.guess_start, self.seq_len)


def build_layout(cfg: LookaheadConfig) -> Layout:
    n, w, g = cfg.level, cfg.window_size, cfg.guess_set_size
    gs = cfg.guess_size
    n_window = (w - 1) + (n - 2) * w
    n_guess_tokens = g * gs
    s = 1 + n_window + n_guess_tokens
    assert s == (n - 1) * w + g * gs

    rel = np.zeros((s,), dtype=np.int32)
    # level 0: idx [1, W) -> +1+j
    rel[1:w] = 1 + np.arange(w - 1)
    # level l: idx [l*W, (l+1)*W) -> +l+j
    for lvl in range(1, n - 1):
        rel[lvl * w:(lvl + 1) * w] = lvl + np.arange(w)
    # guesses: token i of every n-gram -> +1+i
    gstart = (n - 1) * w
    rel[gstart:] = 1 + np.tile(np.arange(gs), g)

    return Layout(
        level=n,
        window=w,
        guess_set_size=g,
        guess_size=gs,
        n_window=n_window,
        n_guess_tokens=n_guess_tokens,
        seq_len=s,
        rel_pos=rel,
        spec_mask=_build_spec_mask(n, w, g),
        window_start=1,
        inp_start=(n - 2) * w,
        inp_stop=(n - 1) * w,
        guess_start=gstart,
    )


def _build_spec_mask(n: int, w: int, g: int) -> np.ndarray:
    """Within-composite visibility, matching the reference mask builder
    (modeling_llama.py:115-207) in the steady state:

    - "block 0" = [lst] + level0 (W entries): causal among themselves.
    - level l>=1, column j: sees block-0 entries 0..j (i.e. lst and
      L0[0..j-1]) plus column j of every level 1..l-1, plus itself
      (modeling_llama.py:198-203).
    - guess n-gram token i: sees lst (modeling_llama.py:184) and the earlier
      tokens of its own n-gram plus itself (the per-n-gram lower-triangular
      blocks, modeling_llama.py:143-181).
    """
    gs = n - 1
    s = (n - 1) * w + g * gs
    m = np.zeros((s, s), dtype=bool)

    # Block 0 (lst + L0): causal. Indices 0..W-1.
    for i in range(w):
        m[i, : i + 1] = True

    # Deeper levels.
    for lvl in range(1, n - 1):
        base = lvl * w
        for j in range(w):
            q = base + j
            m[q, : j + 1] = True                      # block-0 causal part
            for r in range(1, lvl):                   # diagonals of levels 1..l-1
                m[q, r * w + j] = True
            m[q, q] = True                            # self
    # Guesses.
    gstart = (n - 1) * w
    for gg in range(g):
        for i in range(gs):
            q = gstart + gg * gs + i
            m[q, 0] = True                            # sees lst
            m[q, gstart + gg * gs: q + 1] = True      # own n-gram prefix + self
    return m
