"""Test harness: force an 8-device virtual CPU mesh.

The environment's sitecustomize registers a remote TPU ('axon') backend and
sets jax_platforms='axon,cpu' in every process; eager test ops would each pay
a tunnel round-trip. Tests must run on host CPU — override the config *after*
import (env vars alone are clobbered by the site hook), which is also where
multi-chip sharding paths are validated via
--xla_force_host_platform_device_count, the JAX-standard pattern for testing
pjit/shard_map without hardware.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the solver jits are large and identical across
# test runs; caching them cuts suite time dramatically
from moshpp_tpu.utils.cache import setup_jax_cache  # noqa: E402

setup_jax_cache()  # host-keyed: a stale cross-machine entry can hard-abort
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same deterministic stream no matter
    # which tests ran before it (a shared stream made results order-dependent)
    return np.random.default_rng(42)
