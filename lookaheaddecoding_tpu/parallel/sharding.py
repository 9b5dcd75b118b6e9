"""Mesh construction and sharding specs.

The reference's distributed story is NCCL object-collectives driven from the
host (reference: lade/lade_distributed.py, decoding.py:1088-1107,
utils.py:28-33) plus external DeepSpeed TP / accelerate PP integrations
(eval_mtbench.py:219-263). Here parallelism is expressed the TPU-native way:
a ``jax.sharding.Mesh`` with named axes and ``NamedSharding`` annotations on
the parameter/activation pytrees; XLA inserts the ICI collectives.

Axes:
  dp - data/request parallel (batch axis)
  tp - tensor parallel (attention heads / MLP hidden / vocab)
  la - lookahead parallel: shards the speculative-token axis of the
       composite step (the reference's own DIST_WORKERS mode,
       decoding.py:956-986); wired into the engine via a sharding
       constraint on the composite token axis (core/step.py, EngineConfig.la)
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig


def make_mesh(dp: int = 1, tp: int = 1, la: int = 1, pp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * pp * tp * la
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, pp, la, tp)
    return Mesh(arr, ("dp", "pp", "la", "tp"))


def make_multihost_mesh(dp_hosts: int = 1, tp: int = 1, la: int = 1,
                        pp: int = 1) -> Mesh:
    """Pod-slice mesh: request/data parallelism rides the slow DCN axis
    between hosts while pp/tp/la collectives stay on intra-slice ICI (the
    standard TPU layout; replaces the reference's per-GPU NCCL process
    groups, lade_distributed.py + utils.py:28-33). Requires a multi-host
    JAX runtime (jax.process_count() > 1).

    On TPU pods the host boundary is the slice boundary and
    ``create_hybrid_device_mesh`` reads it from ``slice_index``; CPU
    multi-process runtimes (the gloo-backed test rig) have no slices, so
    there the mesh is assembled by grouping devices on ``process_index`` —
    the DCN boundary IS the process boundary."""
    from jax.experimental import mesh_utils

    try:
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, pp, la, tp),
            dcn_mesh_shape=(dp_hosts, 1, 1, 1),
        )
    except ValueError:
        all_devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
        n = dp_hosts * pp * la * tp
        if len(all_devs) < n:
            raise ValueError(
                f"need {n} devices for dp_hosts={dp_hosts} pp={pp} "
                f"la={la} tp={tp}, have {len(all_devs)}")
        devs = np.asarray(all_devs[:n]).reshape(dp_hosts, pp, la, tp)
    return Mesh(devs, ("dp", "pp", "la", "tp"))


_LAYER_SPECS = {
    # leading axis is the stacked layer axis: sharded over "pp" (pipeline
    # stages; size-1 axis = fully replicated when pp is unused)
    "input_norm": P("pp", None),
    "post_norm": P("pp", None),
    "wq": P("pp", None, "tp"),
    "wk": P("pp", None, "tp"),
    "wv": P("pp", None, "tp"),
    "wo": P("pp", "tp", None),
    "w_gate": P("pp", None, "tp"),
    "w_up": P("pp", None, "tp"),
    "w_down": P("pp", "tp", None),
    # Qwen2-style qkv biases (column-parallel like their weights)
    "bq": P("pp", "tp"),
    "bk": P("pp", "tp"),
    "bv": P("pp", "tp"),
    "bqkv": P("pp", "tp"),
    # fused layouts (models/llama.py:fuse_params)
    "wqkv": P("pp", None, "tp"),
    "w_gate_up": P("pp", None, "tp"),
}


def param_specs(cfg: LlamaConfig, params=None) -> Dict:
    """Megatron-style tensor-parallel layout over the ``tp`` axis:
    column-parallel QKV/gate/up (output features sharded), row-parallel
    o/down (input features sharded), vocab-sharded embed & lm_head. When
    ``params`` is given, the spec tree matches its exact key set (bias /
    fused / tied-embedding variants)."""
    layer_keys = (params["layers"].keys() if params is not None
                  else ("input_norm", "post_norm", "wq", "wk", "wv", "wo",
                        "w_gate", "w_up", "w_down"))
    specs = {
        "embed": P("tp", None),
        "layers": {k: _LAYER_SPECS[k] for k in layer_keys},
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
    }
    if params is not None and "lm_head" not in params:
        del specs["lm_head"]
    return specs


def shard_params(params, mesh: Mesh, cfg: LlamaConfig):
    specs = param_specs(cfg, params)
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)), specs, params,
        is_leaf=lambda s: isinstance(s, P),
    )


def kv_cache_spec() -> P:
    """KV cache [L, Hkv, M, D] (KV-head-major): layer axis over pp,
    KV-head axis over tp."""
    return P("pp", "tp", None, None)
