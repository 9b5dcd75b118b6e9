"""la-axis scaling at the TUNED mid-band composites + GSPMD collective
inventory (VERDICT r4 items 3 & 8).

Round 4 measured la=2 -> 1.51x faster steps only at S=240 (the demo-sized
composite); the tuned realistic layouts are S=40-56, where the per-step
collective latency may dominate the row-sharding win. This script measures
decode-step time on the 8-virtual-device CPU mesh for la in {1,2,4} at
L5/W4/G6 (S=40), L5/W4/G10 (S=56) and L7/W20/G20 (S=240, the round-4
reference point), and inventories the collectives GSPMD inserted into each
compiled step (op kind, dtype, shape count) for the la and tp=8 programs.

Honest scope note (recorded in the artifact): CPU-mesh wall times rank the
partitionings but say nothing about TPU ICI latency, and the CPU backend
runs collectives synchronously — whether a real TPU overlaps them with the
composite forward is a compiler scheduling property this one-chip
environment cannot measure. What the HLO inventory DOES establish is what
traffic exists to overlap.

Usage: python scripts/la_midband_probe.py   (forces the CPU mesh)
Writes data/la_midband.json.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import lookaheaddecoding_tpu as lt  # noqa: E402
from lookaheaddecoding_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, shard_params)

LAYOUTS = {
    "tuned_S40_L5W4G6": dict(level=5, window_size=4, guess_set_size=6),
    "tuned_S56_L5W4G10": dict(level=5, window_size=4, guess_set_size=10),
    "demo_S240_L7W20G20": dict(level=7, window_size=20, guess_set_size=20),
}
REPS = 30


def log(*a):
    print("[la]", *a, flush=True)


def model():
    # ~60M arch (the round-4 measurement rig): big enough that the
    # composite matmuls dominate python dispatch on CPU
    mcfg = lt.LlamaConfig(
        vocab_size=8192, hidden_size=512, intermediate_size=1408,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=1024, dtype=jnp.float32)
    params = lt.init_params(mcfg, jax.random.PRNGKey(0), scale=0.05)
    return mcfg, params


def collective_inventory(hlo_text):
    """Count GSPMD-inserted collectives by kind in optimized HLO."""
    inv = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        # match op instances like '%all-reduce.12 = f32[...]'
        hits = re.findall(rf"= \S+ {kind}\(", hlo_text)
        hits += re.findall(rf"{kind}-start", hlo_text)
        if hits:
            inv[kind] = len(hits)
    return inv


def time_steps(eng, state, reps=REPS):
    step = eng._step
    # warm (compile) + advance past warm-up
    for _ in range(3):
        state = step(eng.params, state, jnp.int32(10_000),
                     jnp.full((4,), -1, jnp.int32))
    jax.block_until_ready(state.kv_len)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = step(eng.params, state, jnp.int32(10_000),
                     jnp.full((4,), -1, jnp.int32))
        jax.block_until_ready(state.kv_len)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def build(mcfg, params, lcfg_kw, la, tp=1):
    lcfg = lt.LookaheadConfig(attention_impl="xla", pool_from_prompt=True,
                              **lcfg_kw)
    ecfg = lt.EngineConfig(max_seq_len=1024, prefill_chunk=64,
                           dtype="float32", la=la, tp=tp)
    mesh = None
    p = params
    if la > 1 or tp > 1:
        # dp deliberately 1: extra replicas would multiply total CPU work
        # on the shared-core virtual devices and corrupt the ranking — the
        # la=N mesh uses exactly N devices (the round-4 method)
        mesh = make_mesh(dp=1, la=la, tp=tp)
        p = shard_params(params, mesh, mcfg)
    return lt.LookaheadEngine(mcfg, p, lcfg, ecfg, mesh=mesh)


def main():
    mcfg, params = model()
    prompt = list(np.random.RandomState(0).randint(0, 8192, size=200))
    out = {"arch": "60M (512h/1408i/8L)", "backend": "cpu x8 virtual",
           "scope_note": "CPU-mesh medians rank partitionings only; TPU "
                         "ICI latency and async overlap are not measurable "
                         "on one chip — the HLO inventory shows the "
                         "traffic GSPMD inserted",
           "layouts": {}}
    for name, kw in LAYOUTS.items():
        rec = {}
        base_ms = None
        for la in (1, 2, 4):
            eng = build(mcfg, params, kw, la)
            state = eng._prepare(prompt, seed=0)
            ms = time_steps(eng, state)
            rec[f"la{la}_step_ms"] = round(ms, 3)
            if la == 1:
                base_ms = ms
            else:
                rec[f"la{la}_speedup"] = round(base_ms / ms, 2)
            if la == 2:
                hlo = eng._step.lower(
                    eng.params, state, jnp.int32(100),
                    jnp.full((4,), -1, jnp.int32)).compile().as_text()
                rec["la2_collectives"] = collective_inventory(hlo)
            log(name, f"la={la}: {ms:.2f} ms")
        out["layouts"][name] = rec

    # tp=8 collective inventory at the tuned mid-band layout (the designed
    # multi-chip route when la is latency-bound)
    eng = build(mcfg, params, LAYOUTS["tuned_S40_L5W4G6"], la=1, tp=8)
    state = eng._prepare(prompt, seed=0)
    hlo = eng._step.lower(
        eng.params, state, jnp.int32(100),
        jnp.full((4,), -1, jnp.int32)).compile().as_text()
    out["tp8_collectives_S40"] = collective_inventory(hlo)
    out["tp8_step_ms_S40"] = round(time_steps(eng, state), 3)
    log("tp8 S40:", out["tp8_step_ms_S40"], "ms",
        out["tp8_collectives_S40"])

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "la_midband.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log("wrote", path)
    log(json.dumps(out["layouts"], indent=1))


if __name__ == "__main__":
    main()
