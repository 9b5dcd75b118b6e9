"""Sharded next-token training step.

The reference is inference-only (SURVEY.md §5: no checkpoint/training
subsystem), but this framework uses a training step for two first-class
purposes: (1) the multi-chip sharding dry-run compiles the full dp x tp
training step over a mesh, and (2) benchmark models can be fitted on-device
to synthetic corpora when no pretrained weights are reachable (zero-egress
environments).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..parallel.sharding import param_specs


def next_token_loss(params, cfg: llama.LlamaConfig, batch: jax.Array,
                    rope_cos, rope_sin) -> jax.Array:
    """Mean causal cross-entropy over [B, T] token batches."""
    logits = llama.forward_train(params, cfg, batch[:, :-1], rope_cos, rope_sin)
    targets = batch[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(
    cfg: llama.LlamaConfig,
    seq_len: int,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 1e-3,
    optimizer: str = "adam",
) -> Callable:
    """Returns jitted ``train_step(params, opt_state, batch) ->
    (params, opt_state, loss)``. Adam by default (plain SGD stalls on
    transformer attention patterns); ``optimizer="sgd"`` keeps the
    dependency-free momentum variant. When ``mesh`` is given, parameters
    follow the tensor-parallel layout of parallel/sharding.py and the batch
    is sharded over ``dp`` — XLA lowers the cross-shard grads to ICI
    collectives."""
    rope_cos, rope_sin = llama.rope_tables(cfg, seq_len)
    if optimizer == "adam":
        import optax
        tx = optax.adam(learning_rate)

        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(next_token_loss)(
                params, cfg, batch, rope_cos, rope_sin)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
    else:
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(next_token_loss)(
                params, cfg, batch, rope_cos, rope_sin)
            new_m = jax.tree.map(
                lambda m, g: 0.9 * m + g.astype(m.dtype), opt_state, grads)
            new_params = jax.tree.map(
                lambda p, m: (p - learning_rate * m.astype(jnp.float32)
                              ).astype(p.dtype),
                params, new_m)
            return new_params, new_m, loss

    if mesh is None:
        return jax.jit(step)

    batch_shard = NamedSharding(mesh, P("dp", None))
    jitted = {}   # has_lm_head -> compiled step (jit built ONCE per variant)

    def sharded_step(params, opt_state, batch):
        if jax.process_count() > 1 and not isinstance(batch, jax.Array):
            # multi-controller runtime: a host numpy batch is this process's
            # LOCAL shard of the dp axis (standard data-loader convention);
            # assemble the global array before dispatch
            batch = jax.make_array_from_process_local_data(batch_shard, batch)
        key = "lm_head" in params
        fn = jitted.get(key)
        if fn is None:
            ps = jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                param_specs(cfg, params),
                is_leaf=lambda s: isinstance(s, P))
            # optimizer state shardings are inherited from the (sharded)
            # state arrays themselves — adam's mu/nu mirror the params
            fn = jax.jit(
                step,
                in_shardings=(ps, None, batch_shard),
                out_shardings=(ps, None, NamedSharding(mesh, P())),
            )
            jitted[key] = fn
        return fn(params, opt_state, batch)

    return sharded_step


def init_opt_state(params, optimizer: str = "adam",
                   learning_rate: float = 1e-3):
    if optimizer == "adam":
        import optax
        return optax.adam(learning_rate).init(params)
    return jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
