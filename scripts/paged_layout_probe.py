"""Compile-only probe (DESIGN 15 "known headroom"): do AUTO layouts on the
paged vstep's donated carry remove the pool-sized layout-change copies?
Measured 2026-08-20: default = 8.50 GB args + 3.46 GB temps; AUTO = 9.26 +
2.50 (XLA pads arguments instead) — ~1 GB net, not adopted.
Usage: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/paged_layout_probe.py
"""
import os, sys
import numpy as np
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout
import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.paged_step import build_paged_step_fns
from lookaheaddecoding_tpu.core.paged import make_paged_pool
from lookaheaddecoding_tpu.core.layout import build_layout

# 7B arch, int8 KV, 8 lanes, S=56 — the measured configuration
mcfg = lt.LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      max_position_embeddings=2048)
lcfg = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                          pool_from_prompt=True, attention_impl="pallas")
ecfg = lt.EngineConfig(max_seq_len=2048, prefill_chunk=256, kv_quant="int8")
lay = build_layout(lcfg)
fns = build_paged_step_fns(mcfg, lcfg, ecfg, lay, page_size=256)

B, NB = 8, 8
TOT = 24 + B
abs_params = jax.eval_shape(
    lambda k: lt.quantize_params(lt.init_params(mcfg, k), bits=8,
                                 quantize_lm_head=True), jax.random.PRNGKey(0))
kp_abs, vp_abs = jax.eval_shape(
    lambda: make_paged_pool(mcfg, TOT, 256, quant="int8"))
from lookaheaddecoding_tpu.core.paged_step import PagedLaneState
from lookaheaddecoding_tpu.core.pool import PoolState
G, GS = lay.guess_set_size, lay.guess_size
sds = jax.ShapeDtypeStruct
states = PagedLaneState(
    table=sds((B, NB), jnp.int32), cap=sds((B,), jnp.int32),
    trash=sds((B,), jnp.int32), kv_len=sds((B,), jnp.int32),
    window=sds((B, lay.n_window), jnp.int32),
    pool=PoolState(values=sds((B, 32001, G, GS), jnp.int32),
                   age=sds((B, 32001, G), jnp.int32),
                   clock=sds((B,), jnp.int32)),
    out_buf=sds((B, 2048 + GS), jnp.int32),
    n_confirmed=sds((B,), jnp.int32), init_len=sds((B,), jnp.int32),
    step_idx=sds((B,), jnp.int32), finished=sds((B,), bool),
    rng=sds((B, 2), jnp.uint32))
args = (abs_params, kp_abs, vp_abs, states,
        sds((B,), jnp.int32), sds((B, 4), jnp.int32),
        sds((B,), jnp.float32), sds((B,), jnp.float32))

def multi_step(params, kp, vp, st, max_new, eos, temp, topp):
    def body(_, c):
        return fns.decode_batch(params, c[0], c[1], c[2], max_new, eos, temp, topp)
    return jax.lax.fori_loop(0, 4, body, (kp, vp, st))

def report(tag, jitted):
    c = jitted.lower(*args).compile()
    ma = c.memory_analysis()
    gb = 2.0**30
    print(f"{tag}: args {ma.argument_size_in_bytes/gb:.2f} temp "
          f"{ma.temp_size_in_bytes/gb:.2f} alias {ma.alias_size_in_bytes/gb:.2f} GB", flush=True)
    return c

report("default-layouts", jax.jit(multi_step, donate_argnums=(1, 2, 3)))
auto = Format(layout=Layout.AUTO)
fmt = (None, jax.tree.map(lambda _: auto, kp_abs),
       jax.tree.map(lambda _: auto, vp_abs), None, None, None, None, None)
fmt_all = (None,
           jax.tree.map(lambda _: auto, kp_abs),
           jax.tree.map(lambda _: auto, vp_abs),
           jax.tree.map(lambda _: auto, states),
           None, None, None, None)
out_all = (jax.tree.map(lambda _: auto, kp_abs),
           jax.tree.map(lambda _: auto, vp_abs),
           jax.tree.map(lambda _: auto, states))
c2 = report("auto-carry-layouts", jax.jit(multi_step, donate_argnums=(1, 2, 3),
                                          in_shardings=fmt_all,
                                          out_shardings=out_all))
try:
    print("chosen input formats (pool):", [str(f) for f in c2.input_formats[0][1:3]][:1][:400], flush=True)
except Exception as e:
    print("format introspection:", e, flush=True)
