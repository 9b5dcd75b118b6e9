"""Logit warpers and SpecInfer-style multi-candidate rejection sampling.

The reference supports exactly the Temperature / TopK / TopP warper set
(reference: lade/decoding.py:375-377) and verifies candidate n-grams with a
SpecInfer-derived accept/reject loop that preserves the target model's
sampling distribution (decoding.py:484-540). Here both are traced device
code: the warpers are vectorized over logit rows, and the acceptance loop is
a ``lax.scan`` over n-gram positions with a ``fori_loop`` over candidates.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def warp_logits(
    logits: jax.Array,          # [..., V] fp32
    temperature: jax.Array,     # dynamic scalar
    top_k: int,                 # static; 0 disables
    top_p: jax.Array,           # dynamic scalar; 1.0 disables
    use_top_p: bool = True,     # static: False elides the vocab sort
) -> jax.Array:
    """HF warper-equivalent chain: temperature, then top-k, then top-p
    (the order transformers applies them).

    The nucleus filter needs a full-vocab sort per row, which dominates the
    sampling step when traced unconditionally — callers whose SamplingConfig
    has top_p == 1.0 pass ``use_top_p=False`` to skip it at compile time."""
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if not use_top_p:
        return logits
    # top-p (nucleus): keep the smallest prefix of descending-prob tokens
    # whose cumulative probability reaches top_p (crossing token kept, HF
    # TopPLogitsWarper semantics, min_tokens_to_keep=1).
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = (cum_before < top_p) | (top_p >= 1.0)
    keep = jnp.take_along_axis(
        keep_sorted, jnp.argsort(order, axis=-1), axis=-1)
    return jnp.where(keep, logits, NEG_INF)


class AcceptResult(NamedTuple):
    hits: jax.Array       # [GS] int32 accepted tokens (+ trailing residual)
    max_hit: jax.Array    # scalar int32: len(hits)-1
    winner: jax.Array     # scalar int32: candidate whose KV block to commit


def rejection_sample_verify(
    probs_next: jax.Array,     # [V] fp32: warped softmax of the next-token row
    guess_probs: jax.Array,    # [G, GS, V] fp32: warped softmax per guess row
    guess_tokens: jax.Array,   # [G, GS] int32 candidate n-grams
    guess_valid: jax.Array,    # [G] bool
    rng: jax.Array,
) -> AcceptResult:
    """SpecInfer-style verification (reference decoding.py:484-540).

    Per n-gram position: walk candidates, accept a draft token with
    probability min(1, p_target(draft)) (the lookahead "draft" proposes with
    probability 1 since the pool is argmax-built); on reject, zero the token
    out and renormalize; on accept, continue from the accepted row's warped
    distribution; when no candidate survives, sample the residual and stop.
    Output distribution equals the target model's regardless of candidate
    order (the SpecInfer invariant), so pool slot order is immaterial.
    """
    G, GS = guess_tokens.shape
    k_u, k_res = jax.random.split(rng)
    uniforms = jax.random.uniform(k_u, (GS, G))
    res_keys = jax.random.split(k_res, GS)

    def position_step(carry, i):
        probs, cand_mask, alive, count, winner = carry

        def inner(g, st):
            probs, accepted, acc_g = st
            draft = guess_tokens[g, i]
            active = (~accepted) & cand_mask[g] & guess_valid[g]
            p_acc = jnp.minimum(1.0, probs[draft])
            take = active & (uniforms[i, g] < p_acc)
            # reject: zero out + renormalize (maintains the residual)
            rejected = active & ~take
            probs = jnp.where(rejected, probs.at[draft].set(0.0), probs)
            probs = jnp.where(rejected, probs / jnp.maximum(probs.sum(), 1e-38),
                              probs)
            accepted = accepted | take
            acc_g = jnp.where(take, g, acc_g)
            return probs, accepted, acc_g

        probs, accepted, acc_g = jax.lax.fori_loop(
            0, G, inner, (probs, jnp.zeros((), bool), jnp.int32(0)))
        accepted = accepted & alive

        draft_tok = guess_tokens[acc_g, i]
        residual = jax.random.categorical(
            res_keys[i], jnp.log(jnp.maximum(probs, 1e-38)))
        tok = jnp.where(accepted, draft_tok, residual).astype(jnp.int32)
        emitted = alive
        # on accept: narrow candidates to those agreeing at position i and
        # continue from the accepted row's distribution
        cand_mask = cand_mask & (guess_tokens[:, i] == draft_tok)
        next_probs = jnp.where(accepted, guess_probs[acc_g, i], probs)
        winner = jnp.where(accepted, acc_g, winner)
        count = count + emitted.astype(jnp.int32)
        alive = alive & accepted
        return (next_probs, cand_mask, alive, count, winner), (tok, emitted)

    init = (
        probs_next,
        jnp.ones((G,), bool) if G else jnp.zeros((0,), bool),
        jnp.ones((), bool),
        jnp.int32(0),
        jnp.int32(0),
    )
    (probs, cand_mask, alive, count, winner), (toks, emitted) = jax.lax.scan(
        position_step, init, jnp.arange(GS))
    hits = jnp.where(emitted, toks, 0).astype(jnp.int32)
    max_hit = count - 1
    return AcceptResult(hits=hits, max_hit=max_hit, winner=winner)


def sample_token(logits_row: jax.Array, temperature, top_k: int, top_p,
                 rng) -> jax.Array:
    """Single-token warped sampling (warm-up / guess-free steps; reference
    decoding.py:461-462)."""
    warped = warp_logits(logits_row, temperature, top_k, top_p)
    return jax.random.categorical(rng, warped).astype(jnp.int32)
