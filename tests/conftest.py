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
# (and REQUIRED here — the image's sitecustomize force-sets
# jax_platforms="axon,cpu" via jax.config in every interpreter, which
# overrides the JAX_PLATFORMS env var)
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the GAN train-step tests are multi-minute XLA:CPU
# compiles; cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() >= 8, "xla_force_host_platform_device_count not applied"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
