"""LLaMA-family decoder in pure functional JAX, built TPU-first.

Capability parity with the reference's forked HF stack
(reference: lade/models/modeling_llama.py:213-1255 — RMSNorm :213, rotary
embedding with linear / dynamic-NTK scaling :233-318, SwiGLU MLP :349,
grouped-query attention via repeat_kv :383, decoder layer :811, full model
:1018), re-designed rather than translated:

- Parameters are a pytree of stacked per-layer arrays; the layer stack runs
  under ``jax.lax.scan`` so the whole forward traces once regardless of depth.
- The KV cache is a preallocated ``[L, n_kv_heads, max_seq, head_dim]``
  buffer updated in-place with ``lax.dynamic_update_slice`` (the reference
  concatenates python tuples per layer per step, modeling_llama.py:513-516).
  KV-head-major layout: both the XLA dense path and the fused Pallas kernel
  consume the cache per KV head, so the hot loop never transposes the cache
  — only the S-token per-step writes are transposed.
- Attention takes an additive ``[S, max_seq]`` mask over absolute cache
  slots; the composite lookahead mask is pure index arithmetic against the
  dynamic scalar ``kv_len`` (see core/layout.py) instead of the reference's
  per-step host-built dense mask.
- bfloat16 weights/activations, fp32 for RMSNorm statistics, rotary tables,
  attention logits and softmax (MXU-friendly, numerically safe).

Supports the model family the reference supports (LlamaForCausalLM
checkpoints: Llama-2, CodeLlama, TinyLlama) including GQA and the
linear / dynamic-NTK rope_scaling options.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    # rope_scaling: None, ("linear", factor), ("dynamic", factor) —
    # reference modeling_llama.py:269-318 — or, beyond the reference
    # (its pinned transformers 4.36 predates both), the static
    # init-time transforms used by current deployments:
    #   ("llama3", (factor, low_freq_factor, high_freq_factor,
    #               original_max_position_embeddings))
    #   ("yarn",   (factor, beta_fast, beta_slow,
    #               original_max_position_embeddings,
    #               attention_factor, truncate))
    # Params are flat float tuples so the frozen config stays hashable
    # (it is a jit static argument). yarn's attention_factor is resolved
    # to a concrete float at config build (mscale rules in from_hf).
    rope_scaling: Optional[Tuple[str, Any]] = None
    tie_word_embeddings: bool = False
    # qkv projection biases (Qwen2-style checkpoints; plain LLaMA has none)
    attention_bias: bool = False
    # Mistral/Qwen2 sliding-window attention width (None = full attention):
    # a query at position p attends keys in (p - sw, p]. Applied by both
    # attention paths (dense masks in core/step.py; in-kernel bound +
    # below-window block skipping in ops/lookahead_attention.py). The
    # composite step must fit inside the window (engine-enforced).
    sliding_window: Optional[int] = None
    # Gemma-family knobs: tanh-approx GeGLU MLP, (1 + weight) RMSNorm,
    # sqrt(hidden) embedding scaling, decoupled head_dim
    hidden_act: str = "silu"          # "silu" | "gelu_pytorch_tanh" | "gelu"
    rms_norm_offset: float = 0.0      # effective norm weight = offset + w
    scale_embeddings: bool = False    # x *= sqrt(hidden_size) after embed
    head_dim_override: Optional[int] = None
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf_config, dtype=jnp.bfloat16) -> "LlamaConfig":
        """Build from a transformers LlamaConfig."""
        scaling = None
        rs = getattr(hf_config, "rope_scaling", None)
        if rs:
            kind = rs.get("type", rs.get("rope_type", "linear"))
            # "default" appears in some configs as an explicit no-op
            if kind == "default":
                scaling = None
            elif kind in ("linear", "dynamic"):
                scaling = (kind, float(rs["factor"]))
            elif kind == "llama3":
                scaling = ("llama3", (
                    float(rs["factor"]),
                    float(rs["low_freq_factor"]),
                    float(rs["high_freq_factor"]),
                    float(rs["original_max_position_embeddings"]),
                ))
            elif kind == "yarn":
                factor = float(rs["factor"])
                att = rs.get("attention_factor")
                if att is None:
                    # paper-default mscale; the mscale/mscale_all_dim pair
                    # (DeepSeek-style checkpoints) folds into one concrete
                    # scalar here so runtime carries only a float
                    def _mscale(scale, m=1.0):
                        return (1.0 if scale <= 1.0
                                else 0.1 * m * math.log(scale) + 1.0)
                    ms, msad = rs.get("mscale"), rs.get("mscale_all_dim")
                    if ms and msad:
                        att = _mscale(factor, ms) / _mscale(factor, msad)
                    else:
                        att = _mscale(factor)
                scaling = ("yarn", (
                    factor,
                    float(rs.get("beta_fast") or 32.0),
                    float(rs.get("beta_slow") or 1.0),
                    float(rs.get("original_max_position_embeddings")
                          or hf_config.max_position_embeddings),
                    float(att),
                    1.0 if rs.get("truncate", True) else 0.0,
                ))
            else:
                # fail loud: silently ignoring longrope/unknown scaling
                # would produce plausible-but-wrong generations
                raise NotImplementedError(
                    f"rope_scaling type '{kind}' is not implemented "
                    "(supported: linear, dynamic, llama3, yarn)")
        model_type = getattr(hf_config, "model_type", "")
        is_gemma = model_type == "gemma"
        hidden_act = "silu"
        if is_gemma:
            # Gemma's effective activation (HF GemmaMLP: hidden_activation
            # with a gelu_pytorch_tanh default, falling back to hidden_act)
            hidden_act = (getattr(hf_config, "hidden_activation", None)
                          or getattr(hf_config, "hidden_act", None)
                          or "gelu_pytorch_tanh")
        head_dim = getattr(hf_config, "head_dim", None)
        if (head_dim is not None and head_dim
                == hf_config.hidden_size // hf_config.num_attention_heads):
            head_dim = None               # standard coupling; no override
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_key_value_heads=getattr(
                hf_config, "num_key_value_heads", hf_config.num_attention_heads
            ),
            rms_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            max_position_embeddings=hf_config.max_position_embeddings,
            rope_scaling=scaling,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
            attention_bias=bool(
                getattr(hf_config, "attention_bias", False)
                or model_type == "qwen2"),
            sliding_window=getattr(hf_config, "sliding_window", None),
            hidden_act=hidden_act,
            rms_norm_offset=1.0 if is_gemma else 0.0,
            scale_embeddings=is_gemma,
            head_dim_override=head_dim,
            dtype=dtype,
        )


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------
# Pytree structure (all per-layer tensors stacked on a leading L axis):
# {
#   "embed":    [V, H]
#   "layers": {
#     "input_norm":  [L, H]
#     "post_norm":   [L, H]
#     "wq": [L, H, Hq*D]   "wk": [L, H, Hkv*D]   "wv": [L, H, Hkv*D]
#     "wo": [L, Hq*D, H]
#     "w_gate": [L, H, I]  "w_up": [L, H, I]     "w_down": [L, I, H]
#   }
#   "final_norm": [H]
#   "lm_head":    [H, V]   (absent when tie_word_embeddings)
# }


def init_params(cfg: LlamaConfig, key: jax.Array, scale: float = 0.02) -> Dict:
    """Random-normal initialization (for tests and synthetic benchmarks)."""
    h, hq, hkv, d = (
        cfg.hidden_size,
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    L, I, V = cfg.num_hidden_layers, cfg.intermediate_size, cfg.vocab_size
    ks = jax.random.split(key, 10)

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    params = {
        "embed": nrm(ks[0], (V, h)),
        "layers": {
            # effective norm weight = rms_norm_offset + stored weight -> 1
            "input_norm": jnp.full((L, h), 1.0 - cfg.rms_norm_offset, cfg.dtype),
            "post_norm": jnp.full((L, h), 1.0 - cfg.rms_norm_offset, cfg.dtype),
            "wq": nrm(ks[1], (L, h, hq * d)),
            "wk": nrm(ks[2], (L, h, hkv * d)),
            "wv": nrm(ks[3], (L, h, hkv * d)),
            "wo": nrm(ks[4], (L, hq * d, h)),
            "w_gate": nrm(ks[5], (L, h, I)),
            "w_up": nrm(ks[6], (L, h, I)),
            "w_down": nrm(ks[7], (L, I, h)),
        },
        "final_norm": jnp.full((h,), 1.0 - cfg.rms_norm_offset, cfg.dtype),
    }
    if cfg.attention_bias:
        params["layers"]["bq"] = jnp.zeros((L, hq * d), cfg.dtype)
        params["layers"]["bk"] = jnp.zeros((L, hkv * d), cfg.dtype)
        params["layers"]["bv"] = jnp.zeros((L, hkv * d), cfg.dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm(ks[8], (h, V))
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             offset: float = 0.0) -> jax.Array:
    """fp32-statistics RMSNorm (reference LlamaRMSNorm, modeling_llama.py:213).
    ``offset`` = 1.0 gives the Gemma convention (effective weight 1 + w)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * (offset + weight.astype(jnp.float32))).astype(x.dtype)


def act_fn(cfg: "LlamaConfig"):
    """Gate activation: SwiGLU for LLaMA-family, GeGLU for Gemma."""
    if cfg.hidden_act == "silu":
        return jax.nn.silu
    if cfg.hidden_act == "gelu_pytorch_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if cfg.hidden_act == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise NotImplementedError(f"hidden_act '{cfg.hidden_act}'")


def rope_inv_freq(cfg: LlamaConfig, seq_len: Optional[int] = None) -> np.ndarray:
    """Inverse frequencies with linear / dynamic-NTK scaling
    (reference modeling_llama.py:269-318), plus the static llama3 / yarn
    init-time transforms (beyond the reference; HF-parity-tested against
    transformers' rope init)."""
    d = cfg.head_dim
    base = cfg.rope_theta
    kind = cfg.rope_scaling[0] if cfg.rope_scaling is not None else None
    if kind == "dynamic":
        factor = cfg.rope_scaling[1]
        max_pos = cfg.max_position_embeddings
        if seq_len is not None and seq_len > max_pos:
            base = base * ((factor * seq_len / max_pos) - (factor - 1)) ** (d / (d - 2))
    inv = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))
    if kind == "llama3":
        # Llama-3.1 wavelength-banded scaling: frequencies whose wavelength
        # exceeds the pretraining context are interpolated by `factor`,
        # short wavelengths are kept, the band between is blended linearly
        # in rotations-per-original-context space.
        factor, low_ff, high_ff, old_ctx = cfg.rope_scaling[1]
        wavelen = 2.0 * np.pi / inv
        rotations = old_ctx / wavelen          # turns over the old context
        blend = (rotations - low_ff) / (high_ff - low_ff)
        inv = np.where(
            wavelen > old_ctx / low_ff, inv / factor,          # long: scale
            np.where(wavelen < old_ctx / high_ff, inv,         # short: keep
                     ((1.0 - blend) / factor + blend) * inv))  # band: blend
    elif kind == "yarn":
        # YaRN (arXiv:2309.00071): per-dimension blend between interpolated
        # (inv/factor) and extrapolated (inv) frequencies over a ramp whose
        # bounds come from the beta_fast/beta_slow rotation counts.
        factor, beta_fast, beta_slow, old_ctx, _att, trunc = cfg.rope_scaling[1]

        def corr_dim(n_rot):
            return (d * np.log(old_ctx / (n_rot * 2.0 * np.pi))
                    ) / (2.0 * np.log(cfg.rope_theta))

        low, high = corr_dim(beta_fast), corr_dim(beta_slow)
        if trunc:
            low, high = np.floor(low), np.ceil(high)
        low, high = max(low, 0.0), min(high, d - 1.0)
        if high == low:
            high += 0.001                      # ramp singularity guard
        ramp = np.clip((np.arange(d // 2, dtype=np.float64) - low)
                       / (high - low), 0.0, 1.0)
        extrap = 1.0 - ramp                    # 1 = keep original freq
        inv = inv / factor * (1.0 - extrap) + inv * extrap
    return inv.astype(np.float32)


def rope_attention_factor(cfg: LlamaConfig) -> float:
    """Post-scaling applied to cos/sin (YaRN's "attention temperature",
    folded into the tables exactly like HF multiplies its cached cos/sin).
    1.0 for every other scaling kind."""
    if cfg.rope_scaling is not None and cfg.rope_scaling[0] == "yarn":
        return float(cfg.rope_scaling[1][4])
    return 1.0


def rope_rows_dynamic(cfg: LlamaConfig, positions: jax.Array,
                      seq_len=None) -> Tuple[jax.Array, jax.Array]:
    """Dynamic-NTK cos/sin rows computed IN-GRAPH from the live context
    length, matching HF *runtime* semantics: the base is rescaled only once
    the context outgrows ``max_position_embeddings``, so short contexts use
    the unscaled base (reference modeling_llama.py:288-311). Modern HF keys
    the recompute on ``max(position_ids) + 1``, which this follows; the
    clamp to ``max_position_embeddings`` makes the scale factor exactly 1
    (base unscaled) below the threshold.

    ``seq_len`` selects the keying mode (all are HF semantics — HF's own
    table depends on its call pattern):

    - ``None`` (default): one-call keying, ``max(positions) + 1`` — what a
      full forward over the whole sequence produces in HF.
    - scalar: explicit context length — chunked prefill passes the full
      prompt length, because HF prefills in one call whose table covers the
      whole prompt; K written to the cache keeps the rotation current at
      write time, exactly like HF's grown-cache reuse.
    - ``[T]`` vector (``positions + 1``): per-row keying — what HF's
      *incremental* decode produces, where the token at position p is
      processed at step p with a table grown to p+1 and its K is never
      re-rotated. Position-determined, so the lookahead composite can
      reproduce the AR baseline token-exactly; the decode step uses this.

    positions: [T] int32. Returns ([T, head_dim], [T, head_dim]) fp32."""
    d = cfg.head_dim
    factor = cfg.rope_scaling[1]
    mp = float(cfg.max_position_embeddings)
    if seq_len is None:
        seq_len = jnp.max(positions) + 1
    t = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(seq_len, jnp.float32), positions.shape),
        mp)                                                       # [T]
    base = cfg.rope_theta * (
        (factor * t / mp) - (factor - 1.0)) ** (d / (d - 2.0))    # [T]
    exp = jnp.arange(0, d, 2, dtype=jnp.float32) / d              # [d/2]
    inv = base[:, None] ** -exp[None, :]                          # [T, d/2]
    freqs = positions.astype(jnp.float32)[:, None] * inv
    emb = jnp.concatenate([freqs, freqs], axis=-1)                # [T, d]
    return jnp.cos(emb), jnp.sin(emb)


def rope_tables(cfg: LlamaConfig, max_len: int) -> Tuple[jax.Array, jax.Array]:
    """Precomputed [max_len, head_dim] fp32 cos/sin tables. For
    ``("dynamic", f)`` configs these tables are NOT used at runtime —
    ``forward`` computes rows in-graph via :func:`rope_rows_dynamic` so the
    base tracks the live context length like HF does (a table baked at
    ``max_len`` would wrongly scale *short* contexts whenever
    ``max_len > max_position_embeddings``)."""
    inv = rope_inv_freq(cfg, seq_len=max_len)
    t = np.arange(max_len, dtype=np.float32)
    if cfg.rope_scaling is not None and cfg.rope_scaling[0] == "linear":
        t = t / cfg.rope_scaling[1]
    freqs = np.outer(t, inv)                       # [max_len, d/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [max_len, d]
    att = rope_attention_factor(cfg)
    return (jnp.asarray(np.cos(emb) * att),
            jnp.asarray(np.sin(emb) * att))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [T, n_heads, d]; cos/sin: [T, d] gathered for these positions.
    Same rotate-half convention as the reference (modeling_llama.py:321-347)."""
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    out = xf * cos[:, None, :] + rot * sin[:, None, :]
    return out.astype(x.dtype)


def attention_xla(
    q: jax.Array,          # [T, Hq, D]
    k,                     # [Hkv, M, D] array, or quantized {"q", "s"}
    v,                     # same
    mask: jax.Array,       # [T, M] additive fp32 (0 or -inf)
) -> jax.Array:
    """Dense masked attention over the whole cache buffer. fp32 logits and
    softmax. GQA handled by reshaping q to [Hkv, rep, T, D]. The cache is
    KV-head-major ([Hkv, M, D]) so no per-step cache transpose is needed.

    Quantized KV: per-slot-per-head scales are factored OUT of the dots —
    ``scores = (q . k_int) * s_k[m]`` and ``out = (probs * s_v[m]) . v_int``
    — so the int8 buffers feed the MXU directly and no dequantized copy of
    the cache is ever materialized."""
    k, ks = (k["q"], k["s"]) if isinstance(k, dict) else (k, None)
    v, vs = (v["q"], v["s"]) if isinstance(v, dict) else (v, None)
    t, hq, d = q.shape
    hkv, m, _ = k.shape
    rep = hq // hkv
    # Native-dtype MXU operands with fp32 accumulation: bf16 inputs run the
    # MXU at full rate (an fp32 pre-cast would cut it ~8x); the contraction
    # still accumulates in fp32 via preferred_element_type, and all
    # softmax/scaling math below stays fp32.
    qh = q.transpose(1, 0, 2).reshape(hkv, rep * t, d)
    scores = jnp.einsum(
        "gtd,gmd->gtm", qh, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    if ks is not None:
        scores = scores * ks[:, :, 0][:, None, :]          # [Hkv, 1, M]
    scores = scores.reshape(hkv, rep, t, m) + mask[None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if vs is not None:
        probs = probs * vs[:, :, 0][:, None, None, :]      # [Hkv, 1, 1, M]
    p_dtype = q.dtype if v.dtype == jnp.int8 else v.dtype
    out = jnp.einsum(
        "grtm,gmd->grtd", probs.astype(p_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.transpose(2, 0, 1, 3).reshape(t, hq * d)


def kv_cache_write(cache, new: jax.Array, start) :
    """Write [T, Hkv, D] values at cache slots [start, start+T) of a
    KV-head-major [Hkv, M, D] buffer. Plain bf16 buffers use a
    dynamic_update_slice; quantized buffers quantize per-slot-per-head
    (symmetric int8) and update values + scales."""
    if not isinstance(cache, dict):
        return jax.lax.dynamic_update_slice(
            cache, new.transpose(1, 0, 2), (0, start, 0))
    nf = new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(nf), axis=-1, keepdims=True)    # [T, Hkv, 1]
    s = jnp.maximum(amax / 127.0, 1e-8)
    qv = jnp.clip(jnp.round(nf / s), -127, 127).astype(jnp.int8)
    return {
        "q": jax.lax.dynamic_update_slice(
            cache["q"], qv.transpose(1, 0, 2), (0, start, 0)),
        "s": jax.lax.dynamic_update_slice(
            cache["s"], s.transpose(1, 0, 2).astype(jnp.float32),
            (0, start, 0)),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def fuse_params(params: Dict, qkv: bool = True,
                gate_up: bool = True) -> Dict:
    """Fuse per-layer qkv and/or gate/up projections into single wide
    matmuls (fewer, larger MXU ops — wins most for the int4 kernel's
    per-call overhead; measured on v5e the gate_up fusion into one
    [K, 2*inter] program is a clear win for int4 while the qkv fusion
    loses slightly, hence the independent flags). Engine-side transform;
    checkpoints and the HF converter keep the unfused layout. Works for
    plain arrays and quantized dicts (output-channel concat commutes with
    per-output-channel quantization); mesh-sharded trees stay unfused."""
    lp = params["layers"]

    def cat(ws):
        if not isinstance(ws[0], dict):
            if any(isinstance(w, dict) for w in ws):
                return None   # mixed — leave unfused
            return jnp.concatenate(ws, axis=-1)
        qkey = "q" if "q" in ws[0] else "q4"
        if not all(isinstance(w, dict) and qkey in w for w in ws):
            return None
        out = {qkey: jnp.concatenate([w[qkey] for w in ws], axis=-1),
               "scale": jnp.concatenate([w["scale"] for w in ws], axis=-1)}
        if all("q4_pad" in w for w in ws):
            # zero-element pad sentinel (ops/quant.py): same K -> same pad
            # rows; the concat doubles as a shape-equality assertion
            out["q4_pad"] = jnp.concatenate(
                [w["q4_pad"] for w in ws], axis=-1)
        return out

    new_lp = dict(lp)
    if qkv and "wqkv" not in lp:
        wqkv = cat([lp["wq"], lp["wk"], lp["wv"]])
        if wqkv is not None:
            for k in ("wq", "wk", "wv", "bq", "bk", "bv"):
                new_lp.pop(k, None)
            new_lp["wqkv"] = wqkv
            if "bq" in lp:
                new_lp["bqkv"] = jnp.concatenate(
                    [lp["bq"], lp["bk"], lp["bv"]], axis=-1)
    if gate_up and "w_gate_up" not in lp:
        w_gate_up = cat([lp["w_gate"], lp["w_up"]])
        if w_gate_up is not None:
            for k in ("w_gate", "w_up"):
                new_lp.pop(k, None)
            new_lp["w_gate_up"] = w_gate_up
    return {**params, "layers": new_lp}


def forward(
    params: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,        # [T] int32 composite / prefill chunk
    positions: jax.Array,     # [T] int32 absolute positions
    k_cache: jax.Array,       # [L, Hkv, M, D]
    v_cache: jax.Array,       # [L, Hkv, M, D]
    write_start: jax.Array,   # scalar int32: cache slot of tokens[0]
    mask: Optional[jax.Array],  # [T, M] additive fp32 (None for fused attn)
    rope_cos: jax.Array,      # [M, D] fp32
    rope_sin: jax.Array,      # [M, D] fp32
    logits_rows: Optional[jax.Array] = None,  # static row gather before lm_head
    attn_impl: str = "xla",
    attn_meta: Optional[Dict] = None,  # pallas: kv_len + W/N/GS + interpret
    shard_tokens=None,   # callable x->x: sharding constraint on the token axis
    pp: int = 1,         # pipeline stages (layer-stage sharding over "pp")
    mesh=None,           # required when pp > 1
    rope_seq_len=None,   # traced live-context length for dynamic-NTK RoPE
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One forward over the layer stack. Tokens are written into the cache at
    slots [write_start, write_start+T) in every layer; attention then reads
    the full buffer — under the additive ``mask`` (attn_impl="xla") or with
    the composite mask fused into the Pallas kernel (attn_impl="pallas",
    the flash_attn_lade analog). Returns (logits, k_cache, v_cache).

    ``pp > 1`` runs the stack pipeline-parallel: the stacked [L, ...] layer
    params and KV caches are sharded over the "pp" mesh axis (layer-stage
    sharding, the TPU-native form of the reference's accelerate
    device_map="balanced" --use-pp mode, eval_mtbench.py:219-231); the
    hidden state flows stage-to-stage via ``lax.ppermute`` inside a
    partial-manual ``shard_map`` (tp/la stay GSPMD-auto inside)."""
    h = cfg.hidden_size
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    t = tokens.shape[0]

    x = jnp.take(params["embed"], tokens, axis=0)          # [T, H]
    if cfg.scale_embeddings:
        # Gemma scales embeddings by sqrt(hidden); HF casts the scalar to
        # model dtype before multiplying — matched for bitwise parity
        x = x * jnp.asarray(math.sqrt(h), cfg.dtype)
    if shard_tokens is not None:
        # Lookahead parallelism: split the composite/speculative token axis
        # over the "la" mesh axis (the TPU-native form of the reference's
        # DIST_WORKERS window/guess sharding, decoding.py:956-986) — XLA
        # partitions the per-token matmuls and inserts the ICI collectives
        # the reference performs by hand (:1043-1107).
        x = shard_tokens(x)
    if cfg.rope_scaling is not None and cfg.rope_scaling[0] == "dynamic":
        # dynamic NTK: the base depends on the LIVE context length, so the
        # rows are computed in-graph (cheap: [T, d] transcendentals) instead
        # of gathered from a table baked at engine capacity
        cos, sin = rope_rows_dynamic(cfg, positions, rope_seq_len)
    else:
        cos = jnp.take(rope_cos, positions, axis=0)        # [T, D]
        sin = jnp.take(rope_sin, positions, axis=0)

    lp = params["layers"]
    act = act_fn(cfg)
    from ..ops.quant import qmatmul

    def make_layer_fn(cos, sin, mask, write_start, kv_len):
        # factory so the pp path can rebind the traced closure values to the
        # shard_map-passed (replicated) arguments
        if attn_meta is not None:
            meta = dict(attn_meta, kv_len=kv_len)
        else:
            meta = None

        def layer_fn(x, scanned):
            p, kc, vc = scanned
            y = rms_norm(x, p["input_norm"], cfg.rms_norm_eps,
                         cfg.rms_norm_offset)
            if "wqkv" in p:      # fused projections (fuse_params)
                qkv = qmatmul(y, p["wqkv"])
                if cfg.attention_bias:
                    qkv = qkv + p["bqkv"]
                q = qkv[:, : hq * d]
                k = qkv[:, hq * d: (hq + hkv) * d]
                vv = qkv[:, (hq + hkv) * d:]
            else:
                q = qmatmul(y, p["wq"])
                k = qmatmul(y, p["wk"])
                vv = qmatmul(y, p["wv"])
                if cfg.attention_bias:
                    q, k, vv = q + p["bq"], k + p["bk"], vv + p["bv"]
            if os.environ.get("LADE_QKV_BARRIER", "1") != "0":
                # Layout firewall (default on; LADE_QKV_BARRIER=0 disables):
                # without it XLA's layout assignment propagates the
                # RoPE/attention reshape preference backward through the
                # q/k/v dots and materializes TRANSPOSED copies of the
                # whole stacked projection weights as program temps —
                # 3 x 1 GiB at Llama-7B MHA, the difference between the
                # 13.5 GB bf16 7B fitting a 16 GB chip (temp 0.33 GiB)
                # and OOMing (temp 3.26 GiB). Measured perf-neutral at
                # 1.1B (LADE 865.5 vs 865.4 tok/s, AR 301.3 vs 300.8).
                q, k, vv = jax.lax.optimization_barrier((q, k, vv))
            q = q.reshape(t, hq, d)
            k = k.reshape(t, hkv, d)
            vv = vv.reshape(t, hkv, d)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kc = kv_cache_write(kc, k, write_start)
            vc = kv_cache_write(vc, vv, write_start)
            if attn_impl == "pallas":
                from ..ops.lookahead_attention import lookahead_attention
                attn = lookahead_attention(
                    q, kc, vc, meta["kv_len"],
                    level=meta["level"], window=meta["window"],
                    guess_size=meta["guess_size"],
                    causal=meta.get("causal", False),
                    sliding_window=meta.get("sliding_window", 0),
                    interpret=meta.get("interpret", False),
                    spec_mask=meta.get("spec_mask"))
            else:
                attn = attention_xla(q, kc, vc, mask)      # [T, Hq*D]
            x = x + qmatmul(attn.astype(cfg.dtype), p["wo"])
            y = rms_norm(x, p["post_norm"], cfg.rms_norm_eps,
                         cfg.rms_norm_offset)
            inter = cfg.intermediate_size
            if "w_gate_up" in p:
                gu = qmatmul(y, p["w_gate_up"])
                gate_in, up = gu[:, :inter], gu[:, inter:]
            else:
                gate_in, up = qmatmul(y, p["w_gate"]), qmatmul(y, p["w_up"])
            gate = act(gate_in.astype(jnp.float32)).astype(cfg.dtype)
            x = x + qmatmul(gate * up, p["w_down"])
            return x, (kc, vc)

        return layer_fn

    kv_len_meta = attn_meta["kv_len"] if attn_meta is not None else None

    if pp > 1:
        if mesh is None:
            raise ValueError("pp > 1 requires a mesh with a 'pp' axis")
        from jax.sharding import PartitionSpec as P

        def pp_stack(lp, kc, vc, x, cos, sin, mask, write_start, kv_len):
            layer_fn = make_layer_fn(cos, sin, mask, write_start, kv_len)
            stage = jax.lax.axis_index("pp")

            def body(i, carry):
                x, kc, vc = carry

                def run(c):
                    xx, kk, vv = c
                    xx, (kk, vv) = jax.lax.scan(layer_fn, xx, (lp, kk, vv))
                    return (xx, kk, vv)

                x, kc, vc = jax.lax.cond(
                    stage == i, run, lambda c: c, (x, kc, vc))
                # hand the hidden state to the next stage (one hop of ICI)
                x = jax.lax.ppermute(
                    x, "pp", [(j, (j + 1) % pp) for j in range(pp)])
                return (x, kc, vc)

            x, kc, vc = jax.lax.fori_loop(0, pp, body, (x, kc, vc))
            # after pp hops the fully-processed state has wrapped to stage 0;
            # replicate it (other stages hold partially-processed leftovers)
            x = jax.lax.psum(jnp.where(stage == 0, x, jnp.zeros_like(x)), "pp")
            return x, kc, vc

        x, k_cache, v_cache = jax.shard_map(
            pp_stack, mesh=mesh,
            in_specs=(P("pp"), P("pp"), P("pp"), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P("pp"), P("pp")),
            axis_names={"pp"}, check_vma=False,
        )(lp, k_cache, v_cache, x, cos, sin, mask, write_start, kv_len_meta)
    else:
        layer_fn = make_layer_fn(cos, sin, mask, write_start, kv_len_meta)
        x, (k_cache, v_cache) = jax.lax.scan(
            layer_fn, x, (lp, k_cache, v_cache))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                 cfg.rms_norm_offset)
    if logits_rows is not None:
        x = jnp.take(x, logits_rows, axis=0)
    head = params.get("lm_head")
    if head is None:
        logits = (x @ params["embed"].T).astype(jnp.float32)
    else:
        from ..ops.quant import qmatmul as _qm
        logits = _qm(x, head).astype(jnp.float32)
    return logits, k_cache, v_cache


def forward_paged(
    params: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,        # [B, T] int32 composite / prefill chunk
    positions: jax.Array,     # [B, T] int32 absolute positions per lane
    k_pool,                   # [L, Hkv, P, D] shared pool (or int8 dict)
    v_pool,
    tables: jax.Array,        # [B, NB] logical -> physical page table
    write_start: jax.Array,   # [B] logical cache slot of tokens[b, 0]
    page_size: int,
    mask: Optional[jax.Array],  # [B, T, NB*page_size] additive fp32, or None
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    logits_rows: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    attn_meta: Optional[Dict] = None,   # pallas: kv_lens [B] + W/N/GS etc.
    write_limit: Optional[jax.Array] = None,  # [B]: rows at logical slots
    trash_slot: Optional[jax.Array] = None,   # >= limit write to the lane's
                                              # trash page (prefill padding)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lane-batched forward over the SHARED paged KV pool (core/paged.py).

    The flat :func:`forward` threads one sequence's private [L, Hkv, M, D]
    buffers through the layer scan; here B lanes write disjoint physical
    slots of one pool (K/V scatters through each lane's page table) and
    attention reads each lane's logical view — gathered contiguously on the
    XLA path, read in place via the page-table index map in the Pallas path
    (ops/lookahead_attention.py:paged_lookahead_attention). This cannot be
    a ``vmap`` of :func:`forward`: vmapping a mutated shared operand would
    give every lane its own full-pool copy with no way to merge the writes.

    Same math as :func:`forward` otherwise (the reference equivalent is its
    single-sequence composite forward, modeling_llama.py:1381-1608, which
    asserts batch==1 at :1448 — batching is beyond-reference). pp and
    dynamic-NTK rope are not supported on the paged path (the serving
    engine rejects them at build). Returns (logits [B, R, V], k_pool,
    v_pool)."""
    h = cfg.hidden_size
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    b, t = tokens.shape
    from ..core.paged import paged_gather, paged_write, phys_slots

    x = jnp.take(params["embed"], tokens, axis=0)          # [B, T, H]
    if cfg.scale_embeddings:
        x = x * jnp.asarray(math.sqrt(h), cfg.dtype)
    cos = jnp.take(rope_cos, positions, axis=0)            # [B, T, D]
    sin = jnp.take(rope_sin, positions, axis=0)

    slots = phys_slots(tables, write_start, t, page_size)  # [B, T]
    if write_limit is not None:
        # prefill tail padding: rows past the prompt must not touch real
        # slots (their logical pages may not even be allocated); the lane's
        # reserved trash page absorbs them
        m = write_start[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        slots = jnp.where(m >= write_limit[:, None],
                          trash_slot[:, None] + m % page_size, slots)
    slots_flat = slots.reshape(b * t)

    lp = params["layers"]
    act = act_fn(cfg)
    from ..ops.quant import qmatmul

    def mm(y, w):                     # [B, T, K] @ [K, N] via 2-D qmatmul
        out = qmatmul(y.reshape(b * t, -1), w)
        return out.reshape(b, t, -1)

    def rope3(z, n_heads):            # [B, T, n*d] -> rotated [B, T, n, d]
        zf = z.reshape(b, t, n_heads, d).astype(jnp.float32)
        z1, z2 = zf[..., : d // 2], zf[..., d // 2:]
        rot = jnp.concatenate([-z2, z1], axis=-1)
        out = zf * cos[:, :, None, :] + rot * sin[:, :, None, :]
        return out.astype(z.dtype)

    def layer_fn(x, scanned):
        p, kc, vc = scanned
        y = rms_norm(x, p["input_norm"], cfg.rms_norm_eps,
                     cfg.rms_norm_offset)
        if "wqkv" in p:
            qkv = mm(y, p["wqkv"])
            if cfg.attention_bias:
                qkv = qkv + p["bqkv"]
            q = qkv[..., : hq * d]
            k = qkv[..., hq * d: (hq + hkv) * d]
            vv = qkv[..., (hq + hkv) * d:]
        else:
            q = mm(y, p["wq"])
            k = mm(y, p["wk"])
            vv = mm(y, p["wv"])
            if cfg.attention_bias:
                q, k, vv = q + p["bq"], k + p["bk"], vv + p["bv"]
        if os.environ.get("LADE_QKV_BARRIER", "1") != "0":
            # same layout firewall as the flat forward (see forward())
            q, k, vv = jax.lax.optimization_barrier((q, k, vv))
        q = rope3(q, hq)                                   # [B, T, Hq, D]
        k = rope3(k, hkv)
        vv = vv.reshape(b, t, hkv, d)
        kc = paged_write(kc, slots_flat, k.reshape(b * t, hkv, d))
        vc = paged_write(vc, slots_flat, vv.reshape(b * t, hkv, d))
        if attn_impl == "pallas":
            from ..ops.lookahead_attention import paged_lookahead_attention
            attn = paged_lookahead_attention(
                q, kc, vc, attn_meta["kv_lens"], tables,
                level=attn_meta["level"], window=attn_meta["window"],
                guess_size=attn_meta["guess_size"], page_size=page_size,
                causal=attn_meta.get("causal", False),
                sliding_window=attn_meta.get("sliding_window", 0),
                interpret=attn_meta.get("interpret", False))
        else:
            kv = paged_gather(kc, tables, page_size)   # [B, Hkv, Mlog, D]
            vl = paged_gather(vc, tables, page_size)
            attn = jax.vmap(attention_xla)(q, kv, vl, mask)  # [B, T, Hq*D]
        x = x + mm(attn.astype(cfg.dtype), p["wo"])
        y = rms_norm(x, p["post_norm"], cfg.rms_norm_eps,
                     cfg.rms_norm_offset)
        inter = cfg.intermediate_size
        if "w_gate_up" in p:
            gu = mm(y, p["w_gate_up"])
            gate_in, up = gu[..., :inter], gu[..., inter:]
        else:
            gate_in, up = mm(y, p["w_gate"]), mm(y, p["w_up"])
        gate = act(gate_in.astype(jnp.float32)).astype(cfg.dtype)
        x = x + mm(gate * up, p["w_down"])
        return x, (kc, vc)

    x, (k_pool, v_pool) = jax.lax.scan(layer_fn, x, (lp, k_pool, v_pool))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                 cfg.rms_norm_offset)
    if logits_rows is not None:
        x = jnp.take(x, logits_rows, axis=1)
    head = params.get("lm_head")
    if x.shape[1] == 0:          # prefill: no logits consumed
        logits = jnp.zeros((b, 0, cfg.vocab_size), jnp.float32)
    elif head is None:
        logits = (x @ params["embed"].T).astype(jnp.float32)
    else:
        r = x.shape[1]
        logits = qmatmul(x.reshape(b * r, h), head).astype(
            jnp.float32).reshape(b, r, cfg.vocab_size)
    return logits, k_pool, v_pool


def forward_train(
    params: Dict,
    cfg: LlamaConfig,
    tokens: jax.Array,        # [B, T] int32
    rope_cos: jax.Array,      # [>=T, D] fp32
    rope_sin: jax.Array,
) -> jax.Array:
    """Batched causal forward without KV cache (training / teacher forcing).
    Same math as ``forward``; used by the training step and the multi-chip
    dry run. Returns [B, T, V] fp32 logits."""
    h = cfg.hidden_size
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    b, t = tokens.shape
    rep = hq // hkv

    x = jnp.take(params["embed"], tokens, axis=0)          # [B, T, H]
    if cfg.scale_embeddings:
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size), cfg.dtype)
    cos = rope_cos[:t]
    sin = rope_sin[:t]
    causal = jnp.tril(jnp.ones((t, t), bool))

    def att_rope(y, w, n_heads):
        z = (y @ w).reshape(b, t, n_heads, d)
        zf = z.astype(jnp.float32)
        z1, z2 = zf[..., : d // 2], zf[..., d // 2:]
        rot = jnp.concatenate([-z2, z1], axis=-1)
        out = zf * cos[None, :, None, :] + rot * sin[None, :, None, :]
        return out.astype(z.dtype)

    def layer_fn(x, p):
        y = rms_norm(x, p["input_norm"], cfg.rms_norm_eps,
                     cfg.rms_norm_offset)
        q = att_rope(y, p["wq"], hq).reshape(b, t, hkv, rep, d)
        k = att_rope(y, p["wk"], hkv)
        vv = (y @ p["wv"]).reshape(b, t, hkv, d)
        scores = jnp.einsum(
            "bqgrd,bkgd->bgrqk", q.astype(jnp.float32),
            k.astype(jnp.float32), preferred_element_type=jnp.float32,
        ) / math.sqrt(d)
        scores = jnp.where(causal[None, None, None, :, :], scores, NEG_INF_F32)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum(
            "bgrqk,bkgd->bqgrd", probs, vv.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(b, t, hq * d)
        x = x + (attn.astype(cfg.dtype) @ p["wo"])
        y = rms_norm(x, p["post_norm"], cfg.rms_norm_eps,
                     cfg.rms_norm_offset)
        gate = act_fn(cfg)((y @ p["w_gate"]).astype(jnp.float32)).astype(cfg.dtype)
        x = x + ((gate * (y @ p["w_up"])) @ p["w_down"])
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                 cfg.rms_norm_offset)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return (x @ head).astype(jnp.float32)


NEG_INF_F32 = jnp.float32(-1e30)


def make_kv_cache(cfg: LlamaConfig, max_seq: int, quant: Optional[str] = None):
    """Preallocated KV-head-major cache buffers [L, Hkv, M, D];
    ``quant="int8"`` stores values as int8 with per-slot-per-head fp32
    scales (half/quarter the decode-time HBM traffic of the bf16 cache as
    context grows)."""
    shape = (cfg.num_hidden_layers, cfg.num_key_value_heads, max_seq, cfg.head_dim)
    if quant is None:
        return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)
    if quant != "int8":
        raise ValueError(f"unsupported kv quantization: {quant}")
    sshape = shape[:-1] + (1,)
    mk = lambda: {"q": jnp.zeros(shape, jnp.int8),
                  "s": jnp.full(sshape, 1e-8, jnp.float32)}
    return mk(), mk()
