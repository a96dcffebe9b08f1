"""Test harness: force an 8-device CPU mesh so sharding tests run anywhere.

Must set env vars before jax import (SURVEY.md §4: jax CPU backend is the
fake backend; 8 virtual devices stand in for a pod slice).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: the TPU platform plugin in this environment overrides the
# JAX_PLATFORMS env var, so the CPU backend must be forced via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
