"""Orbax checkpointing: full training state + minimal inference checkpoints.

Capability parity with the reference's Lightning checkpoint story
(configs/callbacks/model_checkpoint.yaml + save_hyperparameters: the
checkpoint alone reconstructs the whole object graph, reference
model/optispeech.py:26, README.md:83). Here a checkpoint directory holds the
orbax param/state trees plus `config.json`, so
`OptiSpeech.load_from_checkpoint(path)` is a one-call restore. Training
checkpoints add both optimizer states, step counters, and the RNG key
(SURVEY.md section 5 checkpoint/resume).
"""

import json
import os
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ExperimentConfig, from_dict, to_dict


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


@jax.jit
def _concat_flat(xs):
    """Ravel + concatenate a list of same-dtype device arrays into ONE flat
    buffer. jit caches one trace per list structure — the train state's
    structure is fixed across saves, so this compiles once."""
    import jax.numpy as jnp

    return jnp.concatenate([jnp.ravel(x) for x in xs]) if len(xs) > 1 else jnp.ravel(xs[0])


def snapshot_device(tree):
    """Pack every array leaf of `tree` into per-dtype flat DEVICE buffers.

    Dispatch is async, so this returns almost immediately; the packed buffers
    are NEW arrays, so a subsequent donating train step cannot invalidate the
    snapshot. `fetch_snapshot` later pulls each buffer with a single
    device->host transfer.

    Why: on the tunneled TPU every device_get is a serial ~51 ms round trip
    (training_profile.md), so `jax.device_get(state)` over the ~1200-leaf
    train state costs ~60 s of pure fixed latency before any bytes move.
    Packing turns that into one transfer per dtype (typically 3: f32 bulk,
    i32 counters, u32 rng) whose cost is bandwidth, not round trips.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: dict = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            groups.setdefault(np.dtype(x.dtype), []).append(i)
    buffers = {dt: _concat_flat([leaves[i] for i in idxs]) for dt, idxs in groups.items()}
    return {"treedef": treedef, "leaves": leaves, "groups": groups, "buffers": buffers}


def fetch_snapshot(snap) -> Any:
    """Materialize a `snapshot_device` result on host: ONE np.asarray per
    dtype buffer, then split/reshape back into the original pytree."""
    leaves = list(snap["leaves"])
    for dt, idxs in snap["groups"].items():
        buf = np.asarray(snap["buffers"][dt])  # one D2H transfer
        off = 0
        for i in idxs:
            shape = snap["leaves"][i].shape
            n = int(np.prod(shape)) if shape else 1
            leaves[i] = buf[off:off + n].reshape(shape)
            off += n
    return jax.tree_util.tree_unflatten(snap["treedef"], leaves)


def packed_device_get(tree) -> Any:
    """device_get a large pytree with few large transfers instead of one
    serial round trip per leaf. Falls back to jax.device_get when arrays are
    not fully addressable from this process (multi-host: each process only
    sees its local shard of a jit output, so the packed concat cannot run
    single-process there — replicated leaves remain locally readable the
    old way)."""
    if jax.process_count() > 1:
        return jax.device_get(tree)
    try:
        return fetch_snapshot(snapshot_device(tree))
    except Exception:  # sharding/oddball-leaf edge cases: correctness first
        return jax.device_get(tree)


def save_inference_checkpoint(path: str, cfg: ExperimentConfig, params, speakers=None):
    path = _abs(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"config": to_dict(cfg), "speakers": speakers or []}, f, indent=2)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "params"), packed_device_get(params), force=True)


def load_inference_checkpoint(path: str):
    path = _abs(path)
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    cfg = from_dict(ExperimentConfig, meta["config"])
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    return cfg, params, meta


class TrainCheckpointManager:
    """Rolling training checkpoints (keep-N, async-capable)."""

    def __init__(self, directory: str, keep: int = 10):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        # enable_async_checkpointing=False: orbax must be DURABLE when save()
        # returns — the trainer's own background thread provides the async
        # overlap (single-process), and the multi-host fit-exit barrier
        # (trainer.py) asserts "checkpoint durable" the moment process 0
        # reaches it. Orbax's internal async thread would outlive both.
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=False,
            ),
        )
        self._worker: threading.Thread | None = None
        self._worker_error: BaseException | None = None

    def _join_worker(self):
        if self._worker is not None:
            self._worker.join()
            self._worker = None
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err

    def save(self, step: int, state: Any, cfg: ExperimentConfig,
             loader_state: dict | None = None, wait: bool = False):
        """Checkpoint `state` with minimal training-loop stall.

        Single-process: the state is packed into per-dtype device buffers
        (async dispatch — the snapshot survives subsequent donated train
        steps) and the D2H fetch + orbax write run on a background thread, so
        the trainer blocks for milliseconds instead of the ~60 s that a
        per-leaf device_get of the ~1200-leaf state costs through the tunnel
        (VERDICT r4 weak 6). Saves are serialized: a new save joins the
        previous one first; `wait=True` (or `wait()`) blocks until durable.

        Multi-host: synchronous per-leaf fetch of the locally-addressable
        replicated leaves, as before (a jit-packed concat cannot run on one
        process of a multi-process mesh).
        """
        self._join_worker()
        is_main = jax.process_index() == 0
        if is_main:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump({"config": to_dict(cfg)}, f, indent=2)
        if loader_state is not None and is_main:
            # data-iterator position (epoch, batch pos) so resume is
            # step-deterministic (SURVEY.md §5; Lightning's loader state).
            # One file per retained step: resuming from ANY kept checkpoint
            # (not just the latest) restores its exact iterator position.
            with open(self._loader_state_path(step), "w") as f:
                json.dump({"step": step, "loader": loader_state}, f)
        if jax.process_count() > 1:
            # EVERY process must call manager.save: orbax's CheckpointManager
            # coordinates multi-process saves internally
            # (checkpoint_manager.py::save -> multihost.sync_global_processes,
            # a cross-process collective barrier). A process-0-only call
            # blocks forever in that barrier — observed as a permanent
            # 2-process deadlock in tests/test_multihost_ckpt.py (stack:
            # manager.save -> sync_global_processes -> gloo allgather that
            # the non-saving process never joins). Host-side file writes
            # above stay process-0-only; orbax routes the actual tensor
            # writes to its primary host.
            self.manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
            if is_main:
                self._prune_loader_states(keep_step=step)
            return
        try:
            snap = snapshot_device(state)
        except Exception:
            self.manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
            self._prune_loader_states(keep_step=step)
            return

        def _work():
            try:
                host = fetch_snapshot(snap)
                self.manager.save(step, args=ocp.args.StandardSave(host))
                self._prune_loader_states(keep_step=step)
            except BaseException as e:  # surfaced at the next join
                self._worker_error = e

        self._worker = threading.Thread(target=_work, name=f"ckpt-save-{step}", daemon=True)
        self._worker.start()
        if wait:
            self._join_worker()

    def _loader_state_path(self, step: int) -> str:
        return os.path.join(self.directory, f"loader_state-{step}.json")

    def _prune_loader_states(self, keep_step: int | None = None):
        # the just-saved step may not be listed yet under async checkpointing
        kept = set(self.manager.all_steps()) | ({keep_step} if keep_step is not None else set())
        for name in os.listdir(self.directory):
            if name.startswith("loader_state-") and name.endswith(".json"):
                try:
                    step = int(name[len("loader_state-"):-len(".json")])
                except ValueError:
                    continue
                if step not in kept:
                    try:
                        os.remove(os.path.join(self.directory, name))
                    except OSError:
                        pass

    def loader_state(self, step: int) -> dict | None:
        """The data-iterator state saved alongside checkpoint `step` (None if
        that save carried no loader state)."""
        path = self._loader_state_path(step)
        if not os.path.exists(path):
            # pre-round-3 layout: single loader_state.json for the latest save
            legacy = os.path.join(self.directory, "loader_state.json")
            if not os.path.exists(legacy):
                return None
            with open(legacy) as f:
                meta = json.load(f)
            return meta["loader"] if meta.get("step") == step else None
        with open(path) as f:
            meta = json.load(f)
        return meta["loader"]

    def latest_step(self):
        self._join_worker()
        return self.manager.latest_step()

    def restore(self, state_template, step: int | None = None):
        self._join_worker()
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, step

    def wait(self):
        self._join_worker()
        self.manager.wait_until_finished()
