"""Test configuration: force an 8-virtual-device CPU platform.

The container's sitecustomize registers a remote TPU ("axon") backend and
pins jax_platforms to it; tests must run locally and exercise multi-device
sharding, so we override the platform and force 8 host devices BEFORE any
backend is initialized. This is the TPU-native answer to "test distributed
without a cluster" (SURVEY.md §4).

Set LADE_TEST_TPU=1 to run tests against the REAL chip instead (used by
scripts/tpu_campaign_r3.sh to record per-round hardware evidence for the
compiled-Mosaic paths that interpret mode can only emulate). NOTE: run
single-chip-suitable files only (the campaign picks
test_lookahead_attention.py and test_e2e_greedy.py) — the sharding tests
require 8 devices and do not self-skip.
"""

import os
import sys

if os.environ.get("LADE_TEST_TPU") == "1":
    import jax  # noqa: E402  (leave the axon platform pin in place)

    # remote-TPU compiles are minutes cold / seconds warm: share bench.py's
    # persistent cache so hardware test runs fit a sane budget
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_lade"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    # Tests assert token-exactness on random near-tie fp32 models. On TPU
    # the DEFAULT precision computes fp32 matmuls as bf16 passes, whose
    # shape-dependent rounding flips argmax ties between the composite and
    # AR forwards (observed in the round-3 hardware run). HIGHEST restores
    # true-f32 MXU passes, matching the CPU semantics the suite was
    # calibrated on. Production engines are bf16 and unaffected.
    jax.config.update("jax_default_matmul_precision", "highest")
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
