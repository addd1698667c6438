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


def make_hybrid_mesh(num_slices: int, axis_names=("dcn_data", "data")) -> Mesh:
    """2-D data mesh for multi-slice pods: slices on the outer (DCN) axis,
    per-slice devices on the inner (ICI) axis.

    Batches shard over BOTH axes (`hybrid_data_sharding`), so the gradient
    all-reduce XLA inserts becomes a hierarchical reduction: intra-slice over
    ICI first, then one small cross-slice hop over DCN — the layout the
    scaling playbook prescribes for data parallelism across slices. On real
    multi-slice hardware the device order uses `mesh_utils`'s DCN-aware
    assignment; on a single slice (or the CPU ddp_sim harness) it reduces to
    a reshape of the global device list, which preserves process-contiguity
    so multi-host input feeding keeps working."""
    devices = jax.devices()
    if len(devices) % num_slices:
        raise ValueError(f"{len(devices)} devices not divisible by {num_slices} slices")
    per_slice = len(devices) // num_slices
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (num_slices, 1), devices=devices,
        )
    except Exception:  # no slice_index metadata (CPU harness / one slice)
        arr = np.asarray(devices).reshape(num_slices, per_slice)
    return Mesh(arr, axis_names)


def hybrid_data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over every mesh axis (dcn x ici)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input pytrees: the batch shards over every
    mesh axis whose name contains "data" (the 1-D `data` mesh, both axes of
    a hybrid `dcn_data x data` mesh, and only the data axis of a
    `data x model` tensor-parallel mesh)."""
    axes = tuple(a for a in mesh.axis_names if "data" in str(a)) or (axis_name,)
    return NamedSharding(mesh, P(axes))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch onto the mesh, sharded along the batch dimension.

    Single-process: `batch` is the full global batch (divisible by mesh size).
    Multi-process: `batch` is this process's local slice (1/process_count of
    the global batch, divisible by the local device count); the global array
    is assembled per-shard with `jax.make_array_from_process_local_data` —
    no cross-host data movement."""
    multihost = jax.process_count() > 1
    data_axes = [a for a in mesh.axis_names if "data" in str(a)]
    mesh_data_size = int(np.prod([mesh.shape[a] for a in data_axes])) if data_axes \
        else mesh.devices.size
    n = jax.local_device_count() if multihost else mesh_data_size
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
