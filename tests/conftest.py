"""Test harness: force CPU JAX with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the JAX analogue of the reference's
configs/trainer/ddp_sim.yaml CPU-DDP simulator)."""

import os

# Force, don't setdefault: the image exports JAX_PLATFORMS=axon (the real TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# belt-and-braces: works as long as no backend has been initialized yet
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() >= 8, "xla_force_host_platform_device_count not applied"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
