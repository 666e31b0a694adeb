"""Test harness: force an 8-device virtual CPU platform.

The ambient environment routes JAX at a tunneled TPU via a sitecustomize hook
that sets jax_platforms="axon,cpu" at interpreter startup — tests must run on
a virtual 8-device CPU mesh instead (deterministic f32 math; multi-chip
sharding validated without hardware), so we override the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
