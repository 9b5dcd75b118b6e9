"""Parameter checkpoint save/load.

The reference has no checkpoint subsystem (weights always come from the HF
hub, reference utils.py:94-95; SURVEY.md §5 "Checkpoint / resume: none").
Here converted / quantized parameter pytrees can be persisted so the
(CPU-heavy) HF conversion and quantization run once.

Format: a single .npz of path-flattened arrays plus a tiny JSON config
sidecar — dependency-free and layout-stable.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig

_SEP = "::"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def _norm_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_params(path: str, cfg: LlamaConfig, params) -> None:
    path = _norm_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(params)
    # np.savez cannot represent ml_dtypes (bfloat16 degrades to raw void);
    # store such arrays bit-cast to a same-width integer type and record the
    # real dtype in the config sidecar.
    dtypes = {}
    store = {}
    for k, v in flat.items():
        name = str(v.dtype)
        if v.dtype.kind == "V" or name not in np.sctypeDict:
            dtypes[k] = name
            store[k] = v.view(np.uint16 if v.dtype.itemsize == 2 else
                              np.uint8)
        else:
            store[k] = v
    np.savez(path, **store)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["dtype"] = jnp.dtype(cfg.dtype).name
    cfg_dict["_array_dtypes"] = dtypes
    with open(path + ".config.json", "w") as f:
        json.dump(cfg_dict, f, indent=2)


def load_params(path: str) -> Tuple[LlamaConfig, Dict]:
    path = _norm_path(path)
    with open(path + ".config.json") as f:
        cfg_dict = json.load(f)
    dtypes = cfg_dict.pop("_array_dtypes", {})
    cfg_dict["dtype"] = jnp.dtype(cfg_dict["dtype"]).type
    if cfg_dict.get("rope_scaling") is not None:
        # ("llama3"/"yarn", (params...)) nests a tuple that json round-trips
        # as a list — restore tuples recursively so the config is hashable
        kind, params = cfg_dict["rope_scaling"]
        if isinstance(params, list):
            params = tuple(params)
        cfg_dict["rope_scaling"] = (kind, params)
    cfg = LlamaConfig(**cfg_dict)
    with np.load(path) as z:
        flat = {}
        for k in z.files:
            arr = z[k]
            if k in dtypes:
                arr = arr.view(jnp.dtype(dtypes[k]))
            flat[k] = arr
    return cfg, _unflatten(flat)
