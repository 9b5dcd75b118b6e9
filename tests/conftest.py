"""Test configuration: force an 8-virtual-device CPU platform.

The container's sitecustomize registers a remote TPU ("axon") backend and
pins jax_platforms to it; tests must run locally and exercise multi-device
sharding, so we override the platform and force 8 host devices BEFORE any
backend is initialized. This is the TPU-native answer to "test distributed
without a cluster" (SURVEY.md §4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
