"""Test environment: force CPU with 8 virtual devices (mesh tests without
TPU hardware) and enable x64 so float64 parity tests against the NumPy
oracles are exact."""

import os

# Must be set before jax import.  The environment pre-sets
# JAX_PLATFORMS=axon (the TPU tunnel); tests must run on 8 fake CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from pmf_tpu.data.synthetic import synth_ratings, synth_splits


@pytest.fixture(scope="session")
def small_ratings():
    """Small synthetic dataset: 120 users x 80 items, ~1500 ratings."""
    return synth_ratings(120, 80, 1500, seed=7)


@pytest.fixture(scope="session")
def small_splits():
    return synth_splits(150, 90, 2500, seed=11)
