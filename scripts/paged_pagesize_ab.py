"""Page-size A/B for paged serving at the 1.1B arch (writes nothing;
the committed data/paged_pagesize_ab.json records the 2026-08-20 run).
Usage: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/paged_pagesize_ab.py
"""
import os, sys, time
import numpy as np
import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_lade"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import bench
import lookaheaddecoding_tpu as lt
from lookaheaddecoding_tpu.core.serving import ContinuousBatchingEngine, Request
from lookaheaddecoding_tpu.core.paged import pages_needed

mcfg, params, nxt = bench.build_predictable_model(seed=0)
prompt = bench.make_prompt(nxt)
lc5 = lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7, pool_from_prompt=True)
ecp = lt.EngineConfig(max_seq_len=1024, prefill_chunk=128, kv_quant="int8")
reqs = [Request(prompt=prompt, max_new_tokens=128, seed=i, request_id=i) for i in range(8)]

def run_srv(server):
    server.run([Request(prompt=prompt, max_new_tokens=8, seed=0)])
    t0 = time.time(); rs = server.run(list(reqs)); dt = time.time() - t0
    toks = sum(r.num_generated for r in rs)
    assert all(r.error is None for r in rs)
    return round(toks / dt, 1)

for page in (256, 512, 1024):
    per_req, _ = pages_needed(len(prompt), 128, 56, page, 1024)
    srv = lt.PagedServingEngine(mcfg, params, lc5, ecp, num_lanes=4,
                                page_size=page, n_pages=4*(per_req+1), steps_per_sync=4)
    print(f"paged page={page}: {run_srv(srv)} tok/s", flush=True)
    del srv
# xla paged path for contrast
srv = lt.PagedServingEngine(mcfg, params,
    lt.LookaheadConfig(level=5, window_size=7, guess_set_size=7,
                       pool_from_prompt=True, attention_impl="xla"),
    ecp, num_lanes=4, page_size=256, n_pages=8, steps_per_sync=4)
print(f"paged page=256 XLA-gather: {run_srv(srv)} tok/s", flush=True)
del srv
flat = ContinuousBatchingEngine(lt.LookaheadEngine(mcfg, params, lc5, ecp),
                                num_lanes=4, steps_per_sync=4, objective="fairness")
print(f"flat fairness: {run_srv(flat)} tok/s", flush=True)
