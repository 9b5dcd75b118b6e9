"""Llama-2-70B INT4 flagship geometry evidence (VERDICT r4 item 2).

A real 70B run needs 8+ chips; this environment has one. What CAN be done
here — and is — is the full AOT pipeline at EXACT 70B shapes: abstract
int4-quantized parameters (jax.eval_shape over the real quantization code,
so packed-nibble/pad/scale shapes are exactly what the engine would see),
Megatron tp / pp x tp shardings attached, and the engine's fused greedy
generate .lower().compile()'d over an 8-device mesh, recording
compiled.memory_analysis() per-chip figures plus analytic HBM accounting
and a throughput projection from the measured single-chip v5e constants
(PARITY.md: the 7B int4 path is VPU-unpack-bound at 47.7 AR / 161.2 LADE
tok/s; both scale with streamed bytes).

Caveat recorded in the artifact: the compile backend is the virtual
8-device CPU mesh (the same rig dryrun_multichip validates sharding on),
so TEMP buffer sizes reflect CPU buffer assignment; argument/output sizes
(weights, KV — the terms that decide fit) are backend-independent.

Usage: python scripts/llama70b_plan.py   (forces the 8-device CPU mesh)
Writes data/llama70b_int4_plan.json.
"""

import json
import os
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
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from lookaheaddecoding_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, param_specs)

CFG70 = lt.LlamaConfig(
    vocab_size=32000, hidden_size=8192, intermediate_size=28672,
    num_hidden_layers=80, num_attention_heads=64, num_key_value_heads=8,
    max_position_embeddings=4096, rope_theta=10000.0, dtype=jnp.bfloat16)
M = 2048
LCFG = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                          pool_from_prompt=True, attention_impl="xla")

# measured single-chip v5e constants (PARITY.md / BENCH_r04): the int4
# decode path is VPU-unpack-bound, not HBM-bound
MEASURED_7B_INT4 = {"ar_tok_s": 47.7, "lade_tok_s": 161.2,
                    "weight_gb": 3.74}
V5E_HBM_GB = 16.0
V5E_BW_GBS = 819.0


def log(*a):
    print("[70b]", *a, flush=True)


def abstract_int4_params(cfg):
    """Exact int4 param tree shapes via eval_shape over the real
    quantization pipeline — zero bytes materialized."""
    def build(key):
        p = lt.init_params(cfg, key)
        return lt.quantize_params(p, bits=4, quantize_lm_head=True,
                                  lm_head_bits=8)
    return jax.eval_shape(build, jax.random.PRNGKey(0))


def attach_shardings(abstract, mesh, cfg):
    """NamedShardings from the Megatron spec tree onto every array leaf
    (quantized dicts get their weight's spec on q/q4/scale alike — the
    out-channel axis is the sharded one in all of them)."""
    specs = param_specs(cfg, abstract)

    def apply(spec, leaf_tree):
        def one(leaf):
            # per-leaf adaptation of the weight's spec: quantized dicts
            # carry [L, 1, N] scales and zero-size pad sentinels alongside
            # the packed values — drop any sharded axis whose size doesn't
            # divide (GSPMD would reject it; the dropped axes replicate)
            axes = list(tuple(spec))[: leaf.ndim]
            axes += [None] * (leaf.ndim - len(axes))
            for i, ax in enumerate(axes):
                if ax is None:
                    continue
                n = int(np.prod([mesh.shape[a] for a in
                                 (ax if isinstance(ax, tuple) else (ax,))]))
                if leaf.shape[i] % n:
                    axes[i] = None
            return jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype,
                sharding=NamedSharding(mesh, P(*axes)))
        return jax.tree.map(one, leaf_tree)

    return jax.tree.map(apply, specs, abstract,
                        is_leaf=lambda x: isinstance(x, P))


def tree_bytes(abstract):
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(abstract))


def plan_geometry(name, mesh, ecfg, abstract, cfg):
    log(f"--- {name}: lowering engine fused greedy generate at 70B/int4")
    sharded_abs = attach_shardings(abstract, mesh, cfg)
    eng = lt.LookaheadEngine(cfg, sharded_abs, LCFG, ecfg, mesh=mesh)
    S = eng.layout.seq_len
    out_buf = jnp.zeros((M + eng.layout.guess_size,), jnp.int32)
    t0 = time.time()
    lowered = eng._fused_greedy.lower(
        sharded_abs, out_buf, jnp.int32(512), jax.random.PRNGKey(0), None,
        jnp.int32(256), jnp.full((4,), -1, jnp.int32))
    t_lower = time.time() - t0
    log(f"lowered in {t_lower:.1f}s; compiling...")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    rec = {
        "mesh": {k: int(v) for k, v in mesh.shape.items()},
        "composite_s": S,
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "memory_analysis_per_device": {
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 2**30, 3),
            "generated_code_mb": round(
                ma.generated_code_size_in_bytes / 2**20, 2),
        },
    }
    # live per-chip HBM = arguments + temps - aliased (donated state
    # aliases into outputs)
    live = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            - ma.alias_size_in_bytes + ma.output_size_in_bytes)
    rec["per_chip_live_gb_upper_bound"] = round(live / 2**30, 3)
    rec["fits_16gb_chip"] = bool(live / 2**30 < V5E_HBM_GB)
    log(f"{name}: args {rec['memory_analysis_per_device']['argument_gb']} GB"
        f" temps {rec['memory_analysis_per_device']['temp_gb']} GB"
        f" -> live/chip <= {rec['per_chip_live_gb_upper_bound']} GB "
        f"(compile {t_compile:.0f}s)")
    return rec


def main():
    import dataclasses as dc
    abstract = abstract_int4_params(CFG70)
    wbytes = tree_bytes(abstract)
    kv_bytes = (CFG70.num_hidden_layers * CFG70.num_key_value_heads * M
                * CFG70.head_dim * 2 * 2)     # bf16 K+V
    out = {
        "model": "Llama-2-70B geometry (80L / 8192H / 28672I / 64q-8kv GQA)",
        "quant": "int4 weight-only (int8 lm_head), exact engine layout via "
                 "eval_shape over quantize_params",
        "max_seq_len": M,
        "weights_total_gb": round(wbytes / 2**30, 2),
        "kv_total_gb_bf16": round(kv_bytes / 2**30, 2),
        "analytic_per_chip": {
            "tp8_weights_gb": round(wbytes / 8 / 2**30, 2),
            "tp8_kv_gb": round(kv_bytes / 8 / 2**30, 2),
            "min_chips_weights_only_16gb": int(
                np.ceil(wbytes / 2**30 / (V5E_HBM_GB * 0.85))),
        },
        "compile_backend": "virtual 8-device CPU mesh (temp sizes are "
                           "CPU buffer assignment; argument/output sizes "
                           "are backend-independent)",
    }

    # pp geometry compiles with f32 activations: the CPU XLA backend's
    # AllReducePromotion pass hard-aborts on the pp stage-psum at bf16 (a
    # backend bug this plan cannot route around; real TPU backends promote
    # bf16 all-reduces natively). Weight argument sizes are unaffected
    # except embed/norms (bf16 -> f32, noted in the record).
    cfg_f32 = dc.replace(CFG70, dtype=jnp.float32)
    abstract_f32 = abstract_int4_params(cfg_f32)
    geoms = {
        "tp8": (make_mesh(tp=8),
                lt.EngineConfig(max_seq_len=M, prefill_chunk=256, tp=8),
                abstract, CFG70, None),
        "pp2_tp4": (make_mesh(pp=2, tp=4),
                    lt.EngineConfig(max_seq_len=M, prefill_chunk=256,
                                    pp=2, tp=4),
                    abstract_f32, cfg_f32,
                    "compiled with f32 activations (CPU-XLA bf16 "
                    "all-reduce promotion crash; embed/norm args 2x)"),
    }
    out["geometries"] = {}
    for name, (mesh, ecfg, abs_tree, cfg, note) in geoms.items():
        try:
            rec = plan_geometry(name, mesh, ecfg, abs_tree, cfg)
            if note:
                rec["note"] = note
            out["geometries"][name] = rec
        except Exception as e:  # noqa: BLE001 — record honestly
            out["geometries"][name] = {"error": str(e)[:500]}
            log(f"{name} FAILED: {str(e)[:200]}")

    # throughput projection from measured single-chip constants: the int4
    # path is VPU-unpack-bound (PARITY.md), so tok/s scales inversely with
    # per-chip streamed weight bytes; tp=8 splits the bytes 8 ways
    per_chip_gb = wbytes / 8 / 2**30
    scale = MEASURED_7B_INT4["weight_gb"] / per_chip_gb
    out["projection_tp8_v5e"] = {
        "basis": "measured 7B int4 single-chip v5e (VPU-bound): "
                 f"{MEASURED_7B_INT4['ar_tok_s']} AR / "
                 f"{MEASURED_7B_INT4['lade_tok_s']} LADE tok/s at "
                 f"{MEASURED_7B_INT4['weight_gb']} GB weights; scaling "
                 "1/bytes-per-chip, collectives not modeled",
        "ar_tok_s": round(MEASURED_7B_INT4["ar_tok_s"] * scale, 1),
        "lade_tok_s": round(MEASURED_7B_INT4["lade_tok_s"] * scale, 1),
        "lade_vs_ar": round(MEASURED_7B_INT4["lade_tok_s"]
                            / MEASURED_7B_INT4["ar_tok_s"], 2),
        "north_star_1p8x": "speedup multiple carries over from the "
                           "measured 7B ratio (3.38x >= 1.8x target); "
                           "wall-clock numbers await multi-chip hardware",
        "ideal_hbm_bound_ar_tok_s": round(
            V5E_BW_GBS / (wbytes / 8 / 2**30), 1),
    }

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "llama70b_int4_plan.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log("wrote", path)
    log(json.dumps(out["projection_tp8_v5e"], indent=1))


if __name__ == "__main__":
    main()
