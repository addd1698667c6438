"""Device mesh + sharding rules (L: distributed).

The reference's distributed story is Lightning DDP over NCCL
(configs/trainer/ddp.yaml; SURVEY.md section 2.7). The TPU-native equivalent:
a 1-D `data` mesh over ICI; batches sharded on `data`, parameters replicated.
Gradient all-reduce is inserted by XLA from the sharded global-mean loss —
there is no hand-written collective.

Multi-host scale-out (the reference's multi-node `ddp.yaml` role): the same
1-D mesh simply spans every process's devices (`jax.devices()` is globally
ordered by process). Each host feeds only its own shard of the global batch —
`DataLoader(shard_id=jax.process_index(), num_shards=jax.process_count())`
yields the process-local slice, and `shard_batch` assembles the global sharded
array with `jax.make_array_from_process_local_data`, so no host ever
materializes (or transfers) another host's data. Gradient all-reduce then
rides ICI within a slice and DCN across slices, both inserted by XLA.

`make_mesh` also honors `--xla_force_host_platform_device_count` CPU devices,
which is the test-time DDP simulator (the analogue of
configs/trainer/ddp_sim.yaml); `tests/test_multihost.py` runs the real
2-process path over `jax.distributed` on CPU."""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over all (global) devices.

    `jax.devices()` returns every device in the job, ordered by process, so in
    a multi-host run the mesh rows line up with each host's local batch slice.
    `num_devices` trims the mesh (single-process debugging only — trimming is
    not meaningful once the mesh must span all processes)."""
    devices = jax.devices()
    if num_devices is not None:
        if jax.process_count() > 1 and num_devices != len(devices):
            raise ValueError(
                "num_devices trimming is a single-process debug knob; a "
                "multi-process mesh must span all global devices"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input pytrees."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch onto the mesh, sharded along the batch dimension.

    Single-process: `batch` is the full global batch (divisible by mesh size).
    Multi-process: `batch` is this process's local slice (1/process_count of
    the global batch, divisible by the local device count); the global array
    is assembled per-shard with `jax.make_array_from_process_local_data` —
    no cross-host data movement."""
    multihost = jax.process_count() > 1
    n = jax.local_device_count() if multihost else mesh.devices.size
    for k, v in batch.items():
        if v is not None and hasattr(v, "shape") and v.shape and v.shape[0] % n:
            raise ValueError(
                f"batch dim {v.shape[0]} of `{k}` is not divisible by the "
                f"{n}-device {'local slice' if multihost else 'mesh'}; set "
                f"data.batch_size to a multiple of the device count"
            )
    sharding = data_sharding(mesh, axis_name)
    if multihost:
        put = lambda v: jax.make_array_from_process_local_data(sharding, np.asarray(v))
    else:
        put = lambda v: jax.device_put(v, sharding)
    return {
        k: (put(v) if v is not None and hasattr(v, "shape") else v)
        for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params/optimizer state) across the mesh.

    Multi-process: every process holds an identical host copy (same init seed
    / same restored checkpoint), so the fully-replicated global array is built
    from process-local data without any cross-host transfer."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda v: jax.make_array_from_process_local_data(sharding, np.asarray(v)),
            state,
        )
    return jax.device_put(state, sharding)
