"""Train a small LLaMA on synthetic partially-predictable text, on-device.

Purpose: a *learned* benchmark model for zero-egress environments. The
corpus is an order-2 Markov chain with Zipfian sparse transitions, so a
trained model predicts the next token correctly ~50-70% of the time —
the partial-predictability regime where lookahead decoding's window/pool
actually earn their compression (reference reports 1.5-2.3x end-to-end,
README.md:90), unlike a deterministic-cycle model that saturates the
GUESS_SIZE cap.

    python applications/train_synthetic.py --steps 1500 \
        --out ~/.cache/lade_synth_ckpt

The checkpoint is then consumed by bench_learned.py.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_markov_sampler(vocab: int, seed: int = 0, branch: int = 4,
                        det_frac: float = 0.3, order: int = 1,
                        active_vocab: int = 0):
    """Markov-chain corpus with directly learnable transition tables.

    order=1: each token has ``branch`` successors ([0.55,0.25,0.13,0.07]);
    ``det_frac`` of tokens are fully deterministic. Greedy decoding of a
    well-trained model is then itself deterministic — compression saturates.

    order=2: successors depend on the PAIR of previous tokens (explicit
    [V, V, branch] table over a small ``active_vocab``). The n-gram pool
    keys on a single token, so candidates collide across different
    second-order contexts and verification misses at realistic rates — the
    mid-compression regime. (Tables are explicit, NOT hashed: a hashed
    context function is modular arithmetic the model would have to grok.)
    """
    rng = np.random.RandomState(seed)
    av = active_vocab or vocab
    p = np.array([0.55, 0.25, 0.13, 0.07][:branch])
    p = p / p.sum()
    if order == 1:
        succ = rng.randint(0, av, size=(av, branch))
        deterministic = rng.rand(av) < det_frac

        def sample(batch, length, rng):
            out = np.empty((batch, length), np.int64)
            out[:, 0] = rng.randint(0, av, size=batch)
            for t in range(1, length):
                prev = out[:, t - 1]
                choice = rng.choice(branch, size=batch, p=p)
                choice = np.where(deterministic[prev], 0, choice)
                out[:, t] = succ[prev, choice]
            return out
    else:
        succ = rng.randint(0, av, size=(av, av, branch))
        deterministic = rng.rand(av, av) < det_frac

        def sample(batch, length, rng):
            out = np.empty((batch, length), np.int64)
            out[:, 0] = rng.randint(0, av, size=batch)
            out[:, 1] = rng.randint(0, av, size=batch)
            for t in range(2, length):
                a, b = out[:, t - 2], out[:, t - 1]
                choice = rng.choice(branch, size=batch, p=p)
                choice = np.where(deterministic[a, b], 0, choice)
                out[:, t] = succ[a, b, choice]
            return out

    return sample


def model_config(dtype=None):
    import jax.numpy as jnp
    import lookaheaddecoding_tpu as lt

    return lt.LlamaConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1280,
        num_hidden_layers=6, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=2048, dtype=dtype or jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=129)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default=os.path.expanduser(
        "~/.cache/lade_synth_ckpt"))
    ap.add_argument("--order", type=int, default=1, choices=(1, 2))
    ap.add_argument("--active-vocab", type=int, default=128,
                    help="token range actually used by the order-2 corpus")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.training.train_step import (
        init_opt_state, make_train_step)
    from lookaheaddecoding_tpu.utils.checkpoint import save_params

    mcfg = model_config(dtype=jnp.float32)   # train fp32, serve bf16
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.02)
    step = make_train_step(mcfg, seq_len=args.seq_len + 1,
                           learning_rate=args.lr)
    opt = init_opt_state(params)
    sampler = make_markov_sampler(
        mcfg.vocab_size, order=args.order,
        active_vocab=args.active_vocab if args.order == 2 else 0)
    rng = np.random.RandomState(1)

    t0 = time.time()
    for i in range(args.steps):
        batch = jnp.asarray(sampler(args.batch, args.seq_len, rng))
        params, opt, loss = step(params, opt, batch)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim > 1 else x, params)
    cfg_out = model_config()
    save_params(args.out, cfg_out, bf16)
    print(f"saved checkpoint to {args.out}.npz")


if __name__ == "__main__":
    main()
