"""HF checkpoint -> stacked-pytree converter.

Replaces the reference's approach of monkey-patching HF's live classes
(reference: lade/utils.py:40-56 ``inject_module``/``augment_llama``) — we own
the model, so loading is a one-time weight conversion into the stacked
parameter layout of models/llama.py. Works from either an in-memory
``transformers`` torch model (CPU) or a state-dict of numpy arrays.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig


def convert_hf_state_dict(state: Dict[str, "np.ndarray"], cfg: LlamaConfig) -> Dict:
    """``state`` maps HF parameter names to numpy arrays (fp32/fp16/bf16)."""

    def get(name):
        return np.asarray(state[name])

    L = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype=cfg.dtype)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=cfg.dtype),
        "layers": {
            "input_norm": stack("model.layers.{}.input_layernorm.weight"),
            "post_norm": stack("model.layers.{}.post_attention_layernorm.weight"),
            # HF linear weights are [out, in]; we store [in, out].
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", transpose=True),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", transpose=True),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", transpose=True),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", transpose=True),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight", transpose=True),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight", transpose=True),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight", transpose=True),
        },
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=cfg.dtype),
    }
    if cfg.attention_bias:
        # Qwen2-style qkv biases (same HF key naming)
        params["layers"]["bq"] = stack("model.layers.{}.self_attn.q_proj.bias")
        params["layers"]["bk"] = stack("model.layers.{}.self_attn.k_proj.bias")
        params["layers"]["bv"] = stack("model.layers.{}.self_attn.v_proj.bias")
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=cfg.dtype)
    return params


def convert_hf_model(hf_model, dtype=jnp.bfloat16):
    """Convert a live ``transformers`` causal-LM with the LLaMA layer naming
    (LlamaForCausalLM, MistralForCausalLM, Qwen2ForCausalLM share it).

    Returns (LlamaConfig, params pytree). Torch is imported lazily so the
    engine has no torch dependency.
    """
    cfg = LlamaConfig.from_hf(hf_model.config, dtype=dtype)
    state = {
        k: v.detach().to("cpu").float().numpy()
        for k, v in hf_model.state_dict().items()
    }
    if cfg.tie_word_embeddings and "lm_head.weight" in state:
        del state["lm_head.weight"]
    return cfg, convert_hf_state_dict(state, cfg)


def load_pretrained(model_path: str, dtype=jnp.bfloat16):
    """Load an HF hub / local LlamaForCausalLM checkpoint and convert.

    Analog of the reference's ``get_model`` (lade/utils.py:89-102) minus the
    monkey-patching: returns (LlamaConfig, params, tokenizer).
    """
    import torch  # noqa: F401 (CPU-only load)
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path)
    hf = AutoModelForCausalLM.from_pretrained(model_path, dtype="float32")
    cfg, params = convert_hf_model(hf, dtype=dtype)
    del hf
    return cfg, params, tok
