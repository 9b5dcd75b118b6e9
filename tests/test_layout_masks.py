"""Golden-mask parity tests.

``ref_mask``/``ref_positions`` below independently re-implement the
*semantics* of the reference's mask builder and position-id assembly
(reference: lade/models/modeling_llama.py:115-207 j_make_causal_mask_multilevel,
:1488-1503 position ids) from the written spec, in plain numpy. The layout
module's index-arithmetic construction must agree exactly in the steady
state the engine runs."""

import numpy as np
import pytest

from lookaheaddecoding_tpu.config import LookaheadConfig
from lookaheaddecoding_tpu.core.layout import build_layout

NEG = float("-inf")


def ref_mask(level_sizes, n_guess, guess_size):
    """Reference semantics, steady state (past length handled separately):
    a [tgt, tgt] additive mask over [1 extra+levels, guesses]."""
    lguess = n_guess * guess_size
    tgt = 1 + sum(level_sizes) + lguess
    m = np.full((tgt, tgt), NEG)
    T = level_sizes[-1]
    level_offset = tgt - (sum(level_sizes) + 1) - lguess   # == 0 here
    dist_offset = 1 + level_sizes[0] - T
    all_offset = level_offset + dist_offset
    assert level_offset >= 0 and dist_offset >= 0

    if lguess:
        # per-n-gram lower-triangular mini masks at the bottom-right
        for g in range(n_guess):
            for i in range(guess_size):
                for j in range(i + 1):
                    m[tgt - lguess + g * guess_size + i,
                      tgt - lguess + g * guess_size + j] = 0
        # guess rows attend the confirmed prefix
        m[tgt - lguess:, : level_offset + 1] = 0

    if all_offset > 0:
        for i in range(all_offset):
            m[i, : i + 1] = 0
        m[all_offset: tgt - lguess, :all_offset] = 0

    for ll in range(len(level_sizes)):
        if ll > 0:
            assert level_sizes[ll] == T
        r0 = all_offset + T * ll
        for j in range(T):
            for c in range(j + 1):
                m[r0 + j, all_offset + c] = 0
        for row in range(1, ll + 1):
            for j in range(T):
                m[r0 + j, all_offset + T * row + j] = 0
    return m


def ref_positions(level_sizes, n_guess, guess_size, lst_id):
    """Reference modeling_llama.py:1488-1503."""
    ids = [lst_id]
    for ll, sz in enumerate(level_sizes):
        if ll == 0:
            ids += list(range(lst_id + 1, lst_id + 1 + sz))
        else:
            off = level_sizes[0] + 1 - sz
            ids += list(range(lst_id + ll + off, lst_id + ll + off + sz))
    ids += list(range(lst_id + 1, lst_id + 1 + guess_size)) * n_guess
    return np.array(ids)


@pytest.mark.parametrize("level,window,guess", [
    (3, 2, 1), (4, 5, 4), (5, 7, 7), (5, 15, 15), (7, 20, 20), (4, 6, 0),
])
def test_spec_mask_matches_reference_semantics(level, window, guess):
    lay = build_layout(LookaheadConfig(level=level, window_size=window,
                                       guess_set_size=max(guess, 1)))
    if guess == 0:
        lay = build_layout(LookaheadConfig(level=level, window_size=window,
                                           guess_set_size=0))
    level_sizes = [window - 1] + [window] * (level - 2)
    ref = ref_mask(level_sizes, guess, level - 1)
    mine = np.where(lay.spec_mask, 0.0, NEG)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("level,window,guess,lst", [
    (4, 5, 4, 17), (5, 7, 7, 0), (7, 20, 20, 123),
])
def test_rel_pos_matches_reference_semantics(level, window, guess, lst):
    lay = build_layout(LookaheadConfig(level=level, window_size=window,
                                       guess_set_size=guess))
    level_sizes = [window - 1] + [window] * (level - 2)
    ref = ref_positions(level_sizes, guess, level - 1, lst)
    np.testing.assert_array_equal(lst + lay.rel_pos, ref)


def test_layout_shapes():
    lay = build_layout(LookaheadConfig(level=5, window_size=7, guess_set_size=7))
    assert lay.seq_len == 4 * 7 + 7 * 4
    assert lay.guess_start == 4 * 7
    assert lay.inp_start == 3 * 7 and lay.inp_stop == 4 * 7
    # every query sees itself; mask is lower-triangular (no forward peeking)
    assert lay.spec_mask.diagonal().all()
    assert not np.triu(lay.spec_mask, 1).any()
