"""Test config: force an 8-device virtual CPU platform so multi-chip
sharding tests run anywhere (SURVEY.md §4's strategy).

Environment gotcha: the axon TPU plugin (loaded by sitecustomize)
calls jax.config.update("jax_platforms", "axon,cpu") at interpreter
start, which overrides the JAX_PLATFORMS env var — forcing CPU must go
through jax.config AFTER importing jax. XLA_FLAGS still must be set
before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: helps if any compile is slow/remote
jax.config.update("jax_compilation_cache_dir", "/tmp/anvtpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
