"""Test harness: force CPU JAX with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the JAX analogue of the reference's
configs/trainer/ddp_sim.yaml CPU-DDP simulator)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
