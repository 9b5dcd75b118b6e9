"""Worker process for the multi-host execution test (test_multihost.py).

Launched N times with distinct ``--proc-id``; each process owns 2 forced CPU
devices and joins a real multi-controller JAX runtime via
``jax.distributed.initialize`` (gloo collectives — the CPU stand-in for DCN;
the reference's analog is its per-GPU NCCL process group launch,
reference run_mtbench.sh:33-35, lade/utils.py:28-33).

Phase 1: greedy lookahead generation with the tensor-parallel axis SPANNING
the two processes (cross-process collectives inside the jitted decode loop).
Phase 2: one data-parallel training step on ``make_multihost_mesh`` — the
hybrid ICI x DCN mesh — so the cross-host gradient psum really executes.

Writes results as JSON for the parent test to compare across ranks and
against a single-process reference.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nproc, process_id=args.proc_id)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import lookaheaddecoding_tpu as lt
    from lookaheaddecoding_tpu.parallel.sharding import (
        make_mesh, make_multihost_mesh, shard_params)
    from lookaheaddecoding_tpu.training.train_step import (
        init_opt_state, make_train_step)

    mcfg = lt.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.02)

    out = {"proc_id": args.proc_id,
           "process_count": jax.process_count(),
           "global_devices": jax.device_count()}

    # ---- phase 1: decode with tp spanning both processes
    mesh = make_mesh(tp=jax.device_count())
    eng = lt.LookaheadEngine(
        mcfg, shard_params(params, mesh, mcfg),
        lt.LookaheadConfig(level=4, window_size=5, guess_set_size=5,
                           pool_from_prompt=True),
        lt.EngineConfig(max_seq_len=256, prefill_chunk=64), mesh=mesh)
    r = eng.generate(list(range(1, 17)), 32)
    out["tokens"] = r.tokens.tolist()
    out["steps"] = r.steps

    # ---- phase 2: hybrid DCN mesh training step (dp across processes)
    mesh2 = make_multihost_mesh(dp_hosts=args.nproc, tp=2)
    step = make_train_step(mcfg, seq_len=32, mesh=mesh2, learning_rate=1e-3)
    opt_state = init_opt_state(params)
    batch = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (4, 33), 0, 128), np.int32)
    params2, opt_state, loss = step(params, opt_state, batch)
    _, _, loss2 = step(params2, opt_state, batch)
    out["loss"] = float(loss)
    out["loss_after_step"] = float(loss2)

    with open(args.out, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
