"""Device mesh + sharding rules (L: distributed).

The reference's distributed story is Lightning DDP over NCCL
(configs/trainer/ddp.yaml; SURVEY.md section 2.7). The TPU-native equivalent:
a 1-D `data` mesh over ICI; batches sharded on `data`, parameters replicated.
Gradient all-reduce is inserted by XLA from the sharded global-mean loss —
there is no hand-written collective. Multi-host scale-out extends the same
mesh across slices (DCN) with per-host data feeding.

`make_mesh` also honors `--xla_force_host_platform_device_count` CPU devices,
which is the test-time DDP simulator (the analogue of
configs/trainer/ddp_sim.yaml)."""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input pytrees."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch onto the mesh, sharded along the batch dimension.
    Batch size must be divisible by the mesh size."""
    n = mesh.devices.size
    for k, v in batch.items():
        if v is not None and hasattr(v, "shape") and v.shape and v.shape[0] % n:
            raise ValueError(
                f"batch dim {v.shape[0]} of `{k}` is not divisible by the "
                f"{n}-device mesh; set data.batch_size to a multiple of the "
                f"device count (or num_devices to a divisor of the batch)"
            )
    sharding = data_sharding(mesh, axis_name)
    return {
        k: (jax.device_put(v, sharding) if v is not None and hasattr(v, "shape") else v)
        for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)
